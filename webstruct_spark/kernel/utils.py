# -*- coding: utf-8 -*-
"""Small reference-parity utilities.

* :func:`substrings` — all substrings within a length band, with
  optional boundary padding (reference /root/reference/webstruct/
  utils.py:233-254; used for gazetteer char-level features).
* :func:`alphanum_key` / :func:`human_sorted` — numeric-aware string
  ordering (utils.py:146-152; the reference's corpus file ordering,
  our deterministic id ordering helper).
"""
from __future__ import annotations

import re
from typing import List, Union


def substrings(txt: str, min_length: int, max_length: int, pad: str = "") -> List[str]:
    out: List[str] = []
    n = len(txt)
    for start in range(n):
        remaining = n - start
        for length in range(min_length, min(max_length + 1, remaining + 1)):
            token = txt[start : start + length]
            if start == 0 and pad:
                out.append(pad + token)
            out.append(token)
            if length == remaining and pad:
                out.append(token + pad)
    return out


_NUM_SPLIT = re.compile(r"([0-9]+)")


def alphanum_key(s: str) -> List[Union[int, str]]:
    return [int(c) if c.isdigit() else c for c in _NUM_SPLIT.split(s)]


def human_sorted(seq):
    return sorted(seq, key=alphanum_key)
