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
        self._feat_cache: Dict[str, tuple] = {}
        self._reset_code_cache()

    def _reset_code_cache(self) -> None:
        """Packed-code memo for the batch path (pure memoization).
        code = (base_row_id << 4) | phone<<3 | upper<<2 | digit34<<1 |
        faxword; row 0 of the bank is the all-zero 'no contribution'
        row."""
        T = len(self.tags)
        self._code_cache: Dict[str, int] = {}
        self._row_mat = np.zeros((256, T), dtype=np.float64)
        self._n_row = 1

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

    def predict_top_n(
        self, tokens: Sequence[str], n: int = 2, merge: bool = True
    ):
        """N-best decode; ``merge=True`` overlays lower-ranked chains
        into 'O' slots of the best one (reference top_n workflow,
        wapiti.py:249-276 + merge_top_n)."""
        return decode_top_n(
            self.emissions(tokens), self.transitions, self.tags,
            n=n, merge=merge,
        )

    # -- batched path (bit-identical; q9 hot path) ----------------------

    _FAX_WORDS = frozenset(("fax:", "fax", "f:"))
    _STREET_WORDS = frozenset(
        (
            "lane", "road", "street", "avenue", "boulevard",
            "drive", "court", "place", "parkway", "circle",
        )
    )

    def _token_feats(self, tok: str) -> tuple:
        """Context-free per-token features, memoized for the worker's
        lifetime (token frequency is Zipfian — the cache hit rate on
        real text is >95%).  Returns (base_row_or_None, is_phone,
        init_upper, digit34, is_faxword).  base_row holds the
        context-free emission contributions (excluding the 'O' prior,
        applied vectorized)."""
        cached = self._feat_cache.get(tok)
        if cached is not None:
            return cached
        T = len(self.tags)
        idx = self.tag_index
        digits = sum(ch.isdigit() for ch in tok)
        ratio = digits / len(tok) if tok else 0.0
        mask = "".join("X" if ch.isdigit() else ch for ch in tok)
        lower = tok.lower()
        init_upper = tok[:1].isupper()
        base: Optional[np.ndarray] = None

        def add(tag: str, v: float) -> None:
            nonlocal base
            j = idx.get(tag)
            if j is None:
                return
            if base is None:
                base = np.zeros(T, dtype=np.float64)
            base[j] += v

        if len(tok) == 5 and digits == 5:
            add("B-ZIPCODE", 6.0)
        if "@" in tok and "." in tok.split("@")[-1]:
            add("B-EMAIL", 9.0)
        if lower in self._STREET_WORDS:
            add("I-STREET", 6.0)
        if init_upper and ratio == 0.0:
            add("B-PER", 0.2)
            add("I-ORG", 0.2)
        feats = (
            base,
            mask in _PHONE_PAT,
            init_upper,
            tok.isdigit() and 3 <= len(tok) <= 4,
            lower in self._FAX_WORDS,
        )
        if len(self._feat_cache) < 1_000_000:  # bound worker memory
            self._feat_cache[tok] = feats
        return feats

    def _intern_code(self, tok: str) -> int:
        """Packed single-int form of :meth:`_token_feats` — lets the
        batch path map a whole flat token list through the cache with
        one C-speed ``map(dict.get, ...)``."""
        base, ph, up, d34, fx = self._token_feats(tok)
        if base is None:
            rid = 0
        else:
            if self._n_row == self._row_mat.shape[0]:
                grown = np.zeros(
                    (2 * self._n_row, self._row_mat.shape[1]),
                    dtype=np.float64,
                )
                grown[: self._n_row] = self._row_mat
                self._row_mat = grown
            rid = self._n_row
            self._row_mat[rid] = base
            self._n_row += 1
        code = (
            (rid << 4)
            | (8 if ph else 0)
            | (4 if up else 0)
            | (2 if d34 else 0)
            | (1 if fx else 0)
        )
        self._code_cache[tok] = code
        return code

    def emissions_batch(
        self, token_lists: Sequence[Sequence[str]]
    ) -> List[np.ndarray]:
        """Vectorized :meth:`emissions` over many turns at once.

        Flattens the batch, applies context-free contributions from the
        per-token cache, then the context rules (phone/fax, street
        number, capitalized-after-first) as boolean-mask adds with
        turn boundaries masked.  Per-cell sums are the same addend
        sets as the scalar path (all dyadic or two-addend), so the
        result is float-exact — asserted by tests/test_viterbi_batch.py.
        """
        T = len(self.tags)
        idx = self.tag_index
        lens = np.array([len(t) for t in token_lists], dtype=np.int64)
        N = int(lens.sum())
        if N == 0:
            empty = np.zeros((0, T), dtype=np.float64)
            return [empty for _ in token_lists]
        if len(self._code_cache) > 1_000_000:  # bound worker memory
            self._reset_code_cache()
        # flatten + one C-speed dict map; Python touches only misses
        flat = [tok for toks in token_lists for tok in toks]
        codes = list(map(self._code_cache.get, flat))
        miss = -1
        try:
            miss = codes.index(None)
        except ValueError:
            pass
        if miss >= 0:
            intern = self._intern_code
            get = self._code_cache.get
            for i in range(miss, N):
                if codes[i] is None:
                    c = get(flat[i])  # an earlier miss may have
                    codes[i] = c if c is not None else intern(flat[i])
        code_arr = np.array(codes, dtype=np.int64)
        em = self._row_mat[code_arr >> 4]  # fancy index -> fresh copy
        em[:, 0] += 1.0  # 'O' prior (2-addend sums commute exactly)
        is_phone = (code_arr & 8) != 0
        upper = (code_arr & 4) != 0
        digit34 = (code_arr & 2) != 0
        faxword = (code_arr & 1) != 0
        nz = lens[lens > 0]
        ends = np.cumsum(nz)
        starts = ends - nz
        first = np.zeros(N, dtype=bool)
        first[starts] = True
        last = np.zeros(N, dtype=bool)
        last[ends - 1] = True
        # I-STREET: capitalized token not at turn start (+2)
        j = idx.get("I-STREET")
        if j is not None:
            em[upper & ~first, j] += 2.0
        # phone shape: B-FAX after a fax word, else B-TEL
        prev_fax = np.zeros(N, dtype=bool)
        prev_fax[1:] = faxword[:-1]
        prev_fax &= ~first  # prev_lower is '' at turn start
        jf, jt = idx.get("B-FAX"), idx.get("B-TEL")
        if jf is not None:
            em[is_phone & prev_fax, jf] += 9.0
        if jt is not None:
            em[is_phone & ~prev_fax, jt] += 7.0
        # B-STREET: 3-4 digit house number before a capitalized token
        next_up = np.zeros(N, dtype=bool)
        next_up[:-1] = upper[1:]
        js = idx.get("B-STREET")
        if js is not None:
            em[digit34 & ~last & next_up, js] += 5.0
        # gazetteer longest-match evidence (per turn; matcher is the
        # parity-pinned reference algorithm)
        out: List[np.ndarray] = []
        p = 0
        matcher = self.matcher
        gaz_types = self.gaz_types
        for toks, L in zip(token_lists, lens):
            sub = em[p : p + L]
            if matcher is not None and L:
                for start, end, text in matcher.find_ranges(list(toks)):
                    etype = gaz_types.get(text)
                    if etype is None:
                        continue
                    jb = idx.get("B-" + etype)
                    if jb is not None:
                        sub[start, jb] += 8.0
                    ji = idx.get("I-" + etype)
                    if ji is not None and end > start + 1:
                        sub[start + 1 : end, ji] += 8.0
            out.append(sub)
            p += L
        return out

    def predict_batch(
        self, token_lists: Sequence[Sequence[str]]
    ) -> List[List[str]]:
        ems = self.emissions_batch(token_lists)
        paths = viterbi_decode_batch(ems, self.transitions)
        tags = self.tags
        return [[tags[i] for i in path] for path in paths]


def _default_init(T: int) -> np.ndarray:
    init = np.zeros(T)
    init[1:] = np.array([NEG if i % 2 == 0 else 0.0 for i in range(1, T)])
    return init


def viterbi_decode_batch(
    ems: Sequence[np.ndarray],
    transitions: np.ndarray,
    init: Optional[np.ndarray] = None,
    chunk: int = 512,
) -> List[List[int]]:
    """Batched Viterbi: decode many sequences in one padded numpy DP.

    Bit-identical to per-sequence :func:`viterbi_decode` (same
    element-wise float ops, same first-index argmax tie-break —
    asserted by tests/test_viterbi_batch.py).  Sequences are sorted by
    length and processed in chunks so a mega-turn does not pad the
    whole batch; the DP runs (chunk, T, T) argmax steps instead of a
    per-turn Python loop — the q9 hot path.
    """
    T = transitions.shape[0]
    if init is None:
        init = _default_init(T)
    lens_all = np.array([e.shape[0] for e in ems], dtype=np.int64)
    order = np.argsort(lens_all, kind="stable")
    results: List[Optional[List[int]]] = [None] * len(ems)
    for c0 in range(0, len(order), chunk):
        idxs = order[c0 : c0 + chunk]
        lens = lens_all[idxs]
        B = len(idxs)
        nmax = int(lens.max()) if B else 0
        if nmax == 0:
            for i in idxs:
                results[i] = []
            continue
        E = np.zeros((nmax, B, T), dtype=np.float64)
        for b, i in enumerate(idxs):
            L = lens[b]
            if L:
                E[:L, b, :] = ems[i]
        score = init[None, :] + E[0]  # (B, T)
        back = np.zeros((nmax, B, T), dtype=np.int16)
        final_tag = np.zeros(B, dtype=np.int64)
        at0 = lens == 1
        if at0.any():
            final_tag[at0] = np.argmax(score[at0], axis=1)
        for t in range(1, nmax):
            cand = score[:, :, None] + transitions[None, :, :]  # (B,prev,cur)
            bt = np.argmax(cand, axis=1)  # first index wins ties, as
            back[t] = bt  # in the per-turn decode
            score = (
                np.take_along_axis(cand, bt[:, None, :], axis=1)[:, 0, :]
                + E[t]
            )
            ended = lens == t + 1
            if ended.any():
                final_tag[ended] = np.argmax(score[ended], axis=1)
        for b, i in enumerate(idxs):
            L = int(lens[b])
            if L == 0:
                results[i] = []
                continue
            path = np.empty(L, dtype=np.int64)
            path[L - 1] = final_tag[b]
            bcol = back[:, b, :]
            for t in range(L - 1, 0, -1):
                path[t - 1] = bcol[t, path[t]]
            results[i] = path.tolist()
    return results  # type: ignore[return-value]


def merge_top_n(chains: Sequence[Sequence[str]]) -> List[str]:
    """Merge N-best tag chains: start from chain 1; overlay entities
    from lower-ranked chains when they fit entirely into 'O' slots
    (reference wapiti.py:77-123 semantics).

    Overlaid positions copy the chain's RAW tags (``ret[item] =
    chain[item]``), exactly like the reference — a chain whose group
    starts with a dangling ``I-X`` overlays that ``I-X`` verbatim (the
    repair, if any, happens downstream in ``group_tags``)."""
    if not chains:
        return []
    merged = list(chains[0])
    for chain in chains[1:]:
        for items, tag in group_tags(list(zip(range(len(chain)), chain))):
            idxs = list(items)
            if tag != "O" and all(merged[i] == "O" for i in idxs):
                for i in idxs:
                    merged[i] = chain[i]
    return merged


def decode_top_n(
    emissions: np.ndarray,
    transitions: np.ndarray,
    tags: Sequence[str],
    n: int = 2,
    merge: bool = True,
    init: Optional[np.ndarray] = None,
):
    """Shared N-best wrapper for BOTH models (RuleModel and the
    trained CRFTagger): k-best decode → tag-string chains → optional
    merge_top_n overlay.  One implementation so the two paths cannot
    silently diverge on tie rules or the empty-sequence case."""
    chains = [
        [tags[i] for i in p]
        for p in viterbi_decode_nbest(emissions, transitions, n=n, init=init)
    ]
    return merge_top_n(chains) if merge else chains


def viterbi_decode_nbest(
    emissions: np.ndarray,
    transitions: np.ndarray,
    n: int = 2,
    init: Optional[np.ndarray] = None,
) -> List[List[int]]:
    """N-best Viterbi (k-best list DP): up to ``n`` highest-scoring
    tag paths, best first — the upstream the reference's ``top_n``
    chains come from (wapiti.py:249-276 requests nbest from the CRF
    and merges with merge_top_n).

    Rank-1 equals :func:`viterbi_decode` exactly (same float ops,
    ties resolved toward lower tag index / lower predecessor rank).
    """
    n_pos, T = emissions.shape
    if n_pos == 0:
        return [[]]
    if init is None:
        init = _default_init(T)
    # beams[tag] = list of (score, backptr) where backptr =
    # (prev_tag, prev_rank) or None at t=0; list index = rank
    beams: List[List[tuple]] = [
        [(float(init[j] + emissions[0, j]), None)] for j in range(T)
    ]
    history: List[List[List[tuple]]] = [beams]
    for t in range(1, n_pos):
        nxt: List[List[tuple]] = []
        for j in range(T):
            cands = []
            em = float(emissions[t, j])
            for i in range(T):
                tr = float(transitions[i, j])
                for r, (s, _bp) in enumerate(beams[i]):
                    # rank on the PRE-emission score (-(s+tr), i, r),
                    # exactly like viterbi_decode's argmax over
                    # score+transitions — adding em before comparing
                    # could collapse two distinct pre-emission scores
                    # into a rounded tie and flip the rank-1 path
                    cands.append((-(s + tr), i, r))
            cands.sort()
            nxt.append(
                [(-ns + em, (i, r)) for ns, i, r in cands[:n]]
            )
        beams = nxt
        history.append(beams)
    finals = []
    for j in range(T):
        for r, (s, _bp) in enumerate(beams[j]):
            finals.append((-s, j, r))
    finals.sort()
    paths: List[List[int]] = []
    for ns, j, r in finals[:n]:
        path = []
        t = n_pos - 1
        tag, rank = j, r
        while True:
            path.append(tag)
            _s, bp = history[t][tag][rank]
            if bp is None:
                break
            tag, rank = bp
            t -= 1
        path.reverse()
        paths.append(path)
    return paths
