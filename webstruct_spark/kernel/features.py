# -*- coding: utf-8 -*-
"""Python twins of the Column-side feature expressions, for gold
builders and differential tests.

Shape semantics are the reference's exactly
(/root/reference/webstruct/features/token_features.py:107-121),
including the quirk that the number regex's ``$`` anchors only its
second alternative.
"""
from __future__ import annotations

import re

_NUMBER = re.compile(r"[-+]?[0-9]+(\.[0-9]*)?|[0-9]*\.[0-9]+$")
_PUNCT = re.compile(r"\W+$")
_UPCASE = re.compile(r"[A-Z][a-z'`]+$")
_CAPS = re.compile(r"[A-Z][A-Z'`]+$")
_DOWN = re.compile(r"[a-z]+$")
_MIXED = re.compile(r"\w+$")


def shape_py(token: str) -> str:
    if _NUMBER.match(token):
        return "number"
    if _PUNCT.match(token):
        return "punct"
    if _UPCASE.match(token):
        return "upcase"
    if _CAPS.match(token):
        return "caps"
    if _DOWN.match(token):
        return "downcase"
    if _MIXED.match(token):
        return "mixedcase"
    return "other"
