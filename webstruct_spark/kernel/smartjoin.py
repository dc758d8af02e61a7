# -*- coding: utf-8 -*-
"""Token joining without spurious spaces around punctuation.

Parity with ``/root/reference/webstruct/utils.py:59-75`` (strip the
space before ``, : ; . ! ? " )`` and after ``(``); the goldens from
that doctest live in ``tests/test_kernel_smartjoin.py``.
"""
from __future__ import annotations

import re
from typing import Iterable

_SPACE_BEFORE = re.compile(r' ([,:;.!?"\)])')
_SPACE_AFTER = re.compile(r"([\(]) ")


def smart_join(tokens: Iterable[str]) -> str:
    text = " ".join(tokens)
    text = _SPACE_BEFORE.sub(r"\1", text)
    return _SPACE_AFTER.sub(r"\1", text)
