# -*- coding: utf-8 -*-
"""Batched emissions/Viterbi must be float-exact vs the per-turn
scalar path (same addend sets per cell, same first-index argmax)."""
import random

import numpy as np

from webstruct_spark.kernel.viterbi import (
    RuleModel,
    viterbi_decode,
    viterbi_decode_batch,
)
from webstruct_spark.operators.tagger import DEFAULT_TYPES

GAZ = {
    "austin": "CITY",
    "north las vegas": "CITY",
    "las vegas": "CITY",
    "acme systems": "ORG",
    "tx": "STATE",
    "united states": "COUNTRY",
}

WORDS = [
    "call", "Acme", "Systems", "at", "512-555-1234", "fax:", "Austin",
    "TX", "78701", "now", "a@b.com", "1234", "Main", "Street", "north",
    "las", "vegas", "United", "States", "the", "12", "99999", "f:",
    "Lane", "x",
]


def _model():
    return RuleModel(GAZ, DEFAULT_TYPES)


def test_emissions_batch_exact():
    rng = random.Random(7)
    m = _model()
    turns = [
        [rng.choice(WORDS) for _ in range(rng.randint(0, 25))]
        for _ in range(300)
    ] + [[]]
    got = m.emissions_batch(turns)
    for toks, e in zip(turns, got):
        want = m.emissions(toks)
        assert e.shape == want.shape
        assert np.array_equal(e, want), toks


def test_viterbi_batch_exact():
    rng = random.Random(8)
    m = _model()
    turns = [
        [rng.choice(WORDS) for _ in range(rng.randint(0, 40))]
        for _ in range(400)
    ] + [[], ["Austin"]]
    ems = [m.emissions(t) for t in turns]
    want = [viterbi_decode(e, m.transitions) for e in ems]
    got = viterbi_decode_batch(ems, m.transitions, chunk=64)
    assert got == want


def test_predict_batch_equals_predict():
    rng = random.Random(9)
    m = _model()
    turns = [
        [rng.choice(WORDS) for _ in range(rng.randint(0, 30))]
        for _ in range(300)
    ]
    assert m.predict_batch(turns) == [m.predict(t) for t in turns]


def test_random_emission_matrices():
    """Adversarial: random floats (including exact ties) through both
    decoders."""
    rng = np.random.RandomState(11)
    m = _model()
    T = len(m.tags)
    ems = []
    for _ in range(120):
        n = rng.randint(0, 12)
        e = np.round(rng.randn(n, T) * 2, 1)  # coarse grid -> many ties
        ems.append(e)
    want = [viterbi_decode(e, m.transitions) for e in ems]
    got = viterbi_decode_batch(ems, m.transitions, chunk=16)
    assert got == want
