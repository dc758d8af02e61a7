# -*- coding: utf-8 -*-
"""Longest-match gazetteer matcher with exact reference parity.

Reproduces ``/root/reference/webstruct/utils.py:155-230``
(``BestMatch`` / ``LongestMatch``):

* at each position try n-grams of length ``min(max_length, remaining)``
  down to 1; the first (longest) hit at that position is the candidate
  and scanning resumes at the NEXT position (overlapping candidates are
  collected),
* overlap removal keeps candidates in span-length-descending order
  (stable sort → ties broken by scan/position order) and greedily
  fills non-overlapping spans,
* the result is sorted by start position.

The tie-breaking is load-bearing (see the North-Las-Vegas golden in
``tests/test_kernel_matching.py``).  Relationally this operator is a
broadcast join (n-gram ⋈ alias dictionary) + longest-wins dedup; the
Spark layer broadcasts the compiled matcher and runs it per turn inside
a pandas UDF — see ``webstruct_spark/operators/linking.py``.
"""
from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Tuple

Range = Tuple[int, int, str]  # (start, end, matched_text)


class LongestMatcher:
    """Find longest non-overlapping token-ngram matches from a known
    alias dictionary (any iterable of strings, or a mapping whose keys
    are used)."""

    def __init__(self, known: Iterable[str]):
        keys = known.keys() if hasattr(known, "keys") else known
        self._known = set(keys)
        if not self._known:
            raise ValueError("empty alias dictionary")
        self.max_length = max(len(k.split()) for k in self._known)
        # first-token prefilter: maps first token -> candidate lengths
        # (desc). Purely an optimization; membership checks are
        # identical to the reference's plain `in known`.
        self._first: Dict[str, List[int]] = {}
        for k in self._known:
            parts = k.split()
            lens = self._first.setdefault(parts[0], [])
            if len(parts) not in lens:
                lens.append(len(parts))
        for lens in self._first.values():
            lens.sort(reverse=True)

    def _candidates(self, tokens: Sequence[str]) -> List[Range]:
        res: List[Range] = []
        n = len(tokens)
        known = self._known
        if any(" " in t for t in tokens):
            # tokens containing whitespace defeat the first-token index
            # (joined lookups no longer start at token boundaries) —
            # use the reference's exact length loop for the whole call
            for i in range(n):
                max_len = min(self.max_length, n - i)
                for length in range(max_len, 0, -1):
                    lookup = " ".join(tokens[i : i + length])
                    if lookup in known:
                        res.append((i, i + length, lookup))
                        break
            return res
        for i in range(n):
            tok = tokens[i]
            lens = self._first.get(tok)
            if not lens:
                continue
            remaining = n - i
            for length in lens:
                if length > remaining or length > self.max_length:
                    continue
                lookup = " ".join(tokens[i : i + length])
                if lookup in known:
                    res.append((i, i + length, lookup))
                    break  # longest-at-position wins; move to next i
        return res

    def find_ranges(self, tokens: Sequence[str]) -> List[Range]:
        ranges = self._candidates(tokens)
        # longest span first; stable sort keeps position order on ties
        ranges.sort(key=lambda r: r[1] - r[0], reverse=True)
        kept: List[Range] = []
        filled: set = set()
        for begin, end, lookup in ranges:
            span = set(range(begin, end))
            if not span & filled:
                kept.append((begin, end, lookup))
                filled |= span
        kept.sort()
        return kept
