# -*- coding: utf-8 -*-
"""CRF-style sequence tagging: numpy Viterbi decode per turn with a
deterministic rule/gazetteer-derived score model.

The reference delegates this to an external CRF
(/root/reference/webstruct/wapiti.py:249-276 ``WapitiCRF.predict`` —
per-sequence Viterbi, embarrassingly parallel).  Here the decode is
re-expressed as pure numpy DP so it vectorizes inside an Arrow pandas
UDF; the score model is deterministic (no training dependency): token
feature heuristics + gazetteer longest-match evidence as emissions,
IOB2-consistency as transitions.  Quality is gated like the reference
CI (BIO F1 threshold, tests/test_tagger.py) rather than by exact
parity — the marker path stays the parity tagger.

``merge_top_n`` reproduces the reference's N-best chain merging
(wapiti.py:77-123): keep the best chain, overlay non-overlapping
entities from lower-ranked chains.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

from .bilou import group_tags
from .matching import LongestMatcher

NEG = -1e9


def build_tagset(entity_types: Sequence[str]) -> List[str]:
    """['O', 'B-T1', 'I-T1', ...] — index 0 is always 'O'."""
    tags = ["O"]
    for t in entity_types:
        tags.append("B-" + t)
        tags.append("I-" + t)
    return tags


def iob2_transitions(tags: Sequence[str]) -> np.ndarray:
    """Transition score matrix enforcing IOB2 validity: I-X only after
    B-X/I-X; mild bonus for continuing an entity."""
    n = len(tags)
    m = np.zeros((n, n), dtype=np.float64)
    for i, a in enumerate(tags):
        for j, b in enumerate(tags):
            if b.startswith("I-"):
                if a[2:] != b[2:] or a == "O":
                    m[i, j] = NEG
                else:
                    m[i, j] = 1.0  # continue entity
            elif b.startswith("B-") and a != "O" and a[2:] == b[2:]:
                m[i, j] = -0.5  # adjacent same-type entities are rare
    return m


def viterbi_decode(
    emissions: np.ndarray, transitions: np.ndarray, init: Optional[np.ndarray] = None
) -> List[int]:
    """Standard max-sum DP. emissions: (n, T); returns best tag index
    per position (ties resolved toward the LOWEST tag index — 'O'
    first — deterministically)."""
    n, T = emissions.shape
    if n == 0:
        return []
    if init is None:
        init = np.zeros(T)
        init[1:] = np.array(
            [NEG if i % 2 == 0 else 0.0 for i in range(1, T)]
        )  # I-* cannot start
    score = init + emissions[0]
    back = np.zeros((n, T), dtype=np.int64)
    for t in range(1, n):
        cand = score[:, None] + transitions  # (prev, cur)
        # argmax over prev; np.argmax takes the first (lowest) index on
        # ties -> deterministic
        back[t] = np.argmax(cand, axis=0)
        score = cand[back[t], np.arange(T)] + emissions[t]
    path = [int(np.argmax(score))]
    for t in range(n - 1, 0, -1):
        path.append(int(back[t, path[-1]]))
    path.reverse()
    return path


# ---------------------------------------------------------------------------
# deterministic score model

_PHONE_PAT = ("XXX-XXX-XXXX", "XXXX-XXX-XXXX")


class RuleModel:
    """Emission scorer from token heuristics + a gazetteer matcher.

    ``gazetteer``: alias -> entity_type mapping (broadcast on
    executors); longest-match ranges emit B-/I- evidence exactly like
    the reference's LongestMatchGlobalFeature
    (features/global_features.py:7-39).
    """

    def __init__(self, gazetteer: Dict[str, str], entity_types: Sequence[str]):
        self.types = list(entity_types)
        self.tags = build_tagset(self.types)
        self.tag_index = {t: i for i, t in enumerate(self.tags)}
        self.transitions = iob2_transitions(self.tags)
        self.matcher = LongestMatcher(gazetteer) if gazetteer else None
        self.gaz_types = dict(gazetteer or {})

    def emissions(self, tokens: Sequence[str], prev_lower: str = "") -> np.ndarray:
        n = len(tokens)
        T = len(self.tags)
        em = np.zeros((n, T), dtype=np.float64)
        em[:, 0] = 1.0  # mild prior for 'O'

        def add(i: int, tag: str, v: float) -> None:
            j = self.tag_index.get(tag)
            if j is not None:
                em[i, j] += v

        lowers = [t.lower() for t in tokens]
        # gazetteer longest-match evidence (ORG/PER/CITY/STATE/COUNTRY…)
        if self.matcher is not None:
            for start, end, text in self.matcher.find_ranges(list(tokens)):
                etype = self.gaz_types.get(text)
                if etype is None:
                    continue
                add(start, "B-" + etype, 8.0)
                for i in range(start + 1, end):
                    add(i, "I-" + etype, 8.0)
        for i, tok in enumerate(tokens):
            digits = sum(ch.isdigit() for ch in tok)
            ratio = digits / len(tok) if tok else 0.0
            mask = "".join("X" if ch.isdigit() else ch for ch in tok)
            prev = lowers[i - 1] if i > 0 else prev_lower
            # TEL/FAX: phone shapes, context word disambiguates
            if mask in _PHONE_PAT:
                if prev in ("fax:", "fax", "f:"):
                    add(i, "B-FAX", 9.0)
                else:
                    add(i, "B-TEL", 7.0)
            # ZIPCODE: exactly 5 digits
            if len(tok) == 5 and digits == 5:
                add(i, "B-ZIPCODE", 6.0)
            # EMAIL
            if "@" in tok and "." in tok.split("@")[-1]:
                add(i, "B-EMAIL", 9.0)
            # STREET: house number then capitalized words then a street
            # type word
            if tok.isdigit() and 3 <= len(tok) <= 4 and i + 1 < n:
                nxt = tokens[i + 1]
                if nxt[:1].isupper():
                    add(i, "B-STREET", 5.0)
            if tok[:1].isupper() and i > 0:
                add(i, "I-STREET", 2.0)
            if lowers[i] in (
                "lane", "road", "street", "avenue", "boulevard",
                "drive", "court", "place", "parkway", "circle",
            ):
                add(i, "I-STREET", 6.0)
            # generic capitalized-unknown mild PER/ORG evidence
            if tok[:1].isupper() and ratio == 0.0:
                add(i, "B-PER", 0.2)
                add(i, "I-ORG", 0.2)
        return em

    def predict(self, tokens: Sequence[str]) -> List[str]:
        em = self.emissions(tokens)
        idx = viterbi_decode(em, self.transitions)
        return [self.tags[i] for i in idx]


def merge_top_n(chains: Sequence[Sequence[str]]) -> List[str]:
    """Merge N-best tag chains: start from chain 1; overlay entities
    from lower-ranked chains when they fit entirely into 'O' slots
    (reference wapiti.py:77-123 semantics)."""
    if not chains:
        return []
    merged = list(chains[0])
    for chain in chains[1:]:
        pos = 0
        for items, tag in group_tags(list(zip(range(len(chain)), chain))):
            idxs = list(items)
            if tag != "O" and all(merged[i] == "O" for i in idxs):
                merged[idxs[0]] = "B-" + tag
                for i in idxs[1:]:
                    merged[i] = "I-" + tag
            pos += len(idxs)
    return merged
