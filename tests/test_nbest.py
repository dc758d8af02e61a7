# -*- coding: utf-8 -*-
"""N-best Viterbi + merge_top_n: reference doctest goldens
(wapiti.py:77-123), raw-tag overlay semantics, and rank-1 equality
with the plain decode."""
import numpy as np

from webstruct_spark.kernel.viterbi import (
    RuleModel,
    merge_top_n,
    viterbi_decode,
    viterbi_decode_nbest,
)
from webstruct_spark.operators.tagger import DEFAULT_TYPES


def test_merge_reference_doctests():
    # non-overlap
    assert merge_top_n([["B-PER", "O"], ["O", "B-FUNC"]]) == [
        "B-PER", "B-FUNC",
    ]
    # partial overlap -> ignored
    assert merge_top_n(
        [["B-PER", "I-PER", "O"], ["O", "B-PER", "I-PER"]]
    ) == ["B-PER", "I-PER", "O"]
    # full overlap -> ignored
    assert merge_top_n([["B-PER", "I-PER"], ["B-ORG", "I-ORG"]]) == [
        "B-PER", "I-PER",
    ]


def test_merge_copies_raw_tags():
    """Reference ret[item] = chain[item]: a dangling I-X start in the
    overlaid chain is copied verbatim, NOT normalized to B-X."""
    merged = merge_top_n([["O", "O", "O"], ["O", "I-PER", "I-PER"]])
    assert merged == ["O", "I-PER", "I-PER"]


def test_nbest_rank1_equals_viterbi():
    rng = np.random.RandomState(5)
    m = RuleModel({"austin": "CITY"}, DEFAULT_TYPES)
    T = len(m.tags)
    for _ in range(60):
        n = rng.randint(1, 10)
        em = np.round(rng.randn(n, T) * 2, 1)  # coarse grid -> ties
        want = viterbi_decode(em, m.transitions)
        got = viterbi_decode_nbest(em, m.transitions, n=3)
        assert got[0] == want
        # scores are non-increasing and paths distinct
        assert len({tuple(p) for p in got}) == len(got)


def test_nbest_scores_ordered():
    m = RuleModel({"austin": "CITY"}, DEFAULT_TYPES)
    T = len(m.tags)
    rng = np.random.RandomState(6)
    em = rng.randn(6, T)
    paths = viterbi_decode_nbest(em, m.transitions, n=4)

    def score(p):
        from webstruct_spark.kernel.viterbi import _default_init

        init = _default_init(T)
        s = init[p[0]] + em[0, p[0]]
        for t in range(1, len(p)):
            s += m.transitions[p[t - 1], p[t]] + em[t, p[t]]
        return s

    scores = [score(p) for p in paths]
    assert all(scores[i] >= scores[i + 1] - 1e-9 for i in range(len(scores) - 1))


def test_predict_top_n_end_to_end():
    m = RuleModel({"austin": "CITY", "tx": "STATE"}, DEFAULT_TYPES)
    toks = ["visit", "Austin", "TX", "now"]
    top1 = m.predict(toks)
    merged = m.predict_top_n(toks, n=2)
    chains = m.predict_top_n(toks, n=2, merge=False)
    assert chains[0] == top1
    assert len(merged) == len(toks)
    # merged never un-tags the best chain's entities
    for a, b in zip(top1, merged):
        if a != "O":
            assert b == a
