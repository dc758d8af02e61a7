# -*- coding: utf-8 -*-
"""Differential fuzz: the native C kernel vs the pure-Python oracle.

The Python implementations (tokenize.segment_words_py and the fused
extract_turn_entities_py) are themselves pinned to the reference by
doctest goldens + the reference differential fuzz; this test pins the
C module to them on adversarial and random inputs, including the
ValueError paths.
"""
import random

import pytest

from webstruct_spark.kernel import tokenize
from webstruct_spark.operators import extract

ctok = tokenize.ctok

ADVERSARIAL = [
    "",
    " ",
    "\n",
    ".",
    ".\n",
    "..\n",
    "a.",
    "a.\n",
    "a.\n\n",
    "a.b.",
    "x,1",
    "x,",
    "1,000.50",
    '"',
    '""',
    ' ""',
    '("q")',
    'a"b',
    "don't",
    "O'Hare' ",
    "w.'",
    "z.'\n",
    "'' '",
    "` ``x",
    "--",
    "a--b",
    "...",
    "….",
    "a…b...c",
    "“x”",
    "£5 #tag $1 100%",
    "a;b ; c",
    "[a](b){c}<d>|e!f?g",
    "__START_PER__",
    "__START_PER__ x __END_PER__",
    "__START_PER__ x y __END_PER__ z",
    "__START_A__ p __START_B__ q __END_B__",
    "__START_PER__ x",  # unclosed
    "__START_PER__John",  # marker glued to word
    "call __START_PER__ John , Smith __END_PER__ now.",
    "__START___X__ v __END___X__",
    "__START_A_B__ v __END_A_B__",
    "__start_per__ x",  # lowercase: not a marker
    "__STARTX__ x",
    "__START_PER__x trailing junk",
    "( __START_ORG__ Acme ( Inc __END_ORG__ )",
    "__START_PER__ “quoted” name __END_PER__",
    "él … ñoño 数字123 __START_LOC__ Zürich , CH __END_LOC__",
    " nbsp thin",
    "a…b",
    "'",
    "' ",
    "a' b'' c'd",
]

MISMATCH = [
    "__START_PER__ x __END_ORG__",
    "__END_ORG__",
    "x __END_ORG__ y",
    "__START_A__ __END_B__",
]


@pytest.mark.skipif(ctok is None, reason="C kernel unavailable")
def test_adversarial_corpus():
    for s in ADVERSARIAL:
        assert ctok.segment_words(s) == tokenize.segment_words_py(s), repr(s)
        assert ctok.default_segment_words(
            s
        ) == tokenize.default_segment_words_py(s), repr(s)
        assert extract.extract_turn_entities_c(
            s
        ) == extract.extract_turn_entities_py(s), repr(s)


@pytest.mark.skipif(ctok is None, reason="C kernel unavailable")
def test_value_error_parity():
    for s in MISMATCH:
        with pytest.raises(ValueError) as e_py:
            extract.extract_turn_entities_py(s)
        with pytest.raises(ValueError) as e_c:
            extract.extract_turn_entities_c(s)
        assert str(e_c.value) == str(e_py.value), repr(s)


@pytest.mark.skipif(ctok is None, reason="C kernel unavailable")
def test_random_fuzz():
    rng = random.Random(20260817)
    alphabet = list("abcXYZ019 \t\n.,;:'\"()[]{}<>|!?#$%&-@_/“”…`©£") + [
        "__START_PER__ ", " __END_PER__", "__START_ORG__ ", " __END_ORG__",
        "...", "--", "''", "``", "don't", "O'Hare'", "a.b.", "x,1",
        "w.'", "end.\n", "z.'\n", " ", "é", "ß", " ",
    ]
    n_ok = 0
    for _ in range(8000):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
        assert ctok.segment_words(s) == tokenize.segment_words_py(s), repr(s)
        assert ctok.default_segment_words(
            s
        ) == tokenize.default_segment_words_py(s), repr(s)
        try:
            want = extract.extract_turn_entities_py(s)
        except ValueError as e:
            with pytest.raises(ValueError) as e_c:
                extract.extract_turn_entities_c(s)
            assert str(e_c.value) == str(e), repr(s)
        else:
            got = extract.extract_turn_entities_c(s)
            assert got == want, repr(s)
            n_ok += 1
    assert n_ok > 4000  # most samples exercise the happy path


def _sf001_texts():
    """Synthetic sf0.01 transcript texts, generated-if-missing (the
    corpus is deterministic, so the sample is stable) and read back
    via DuckDB — an independent parquet reader."""
    import duckdb

    from webstruct_spark.sources.transcripts import ensure_corpus_for_sf

    d = ensure_corpus_for_sf(0.01)
    return [
        r[0]
        for r in duckdb.sql(
            "select text from read_parquet('%s/transcripts.parquet')"
            % d
        ).fetchall()
    ]


@pytest.mark.skipif(ctok is None, reason="C kernel unavailable")
def test_corpus_sample():
    """Real synthetic-transcript texts (marker-bearing)."""
    texts = _sf001_texts()
    assert len(texts) > 1000
    for s in texts:
        assert extract.extract_turn_entities_c(
            s
        ) == extract.extract_turn_entities_py(s), repr(s)


@pytest.mark.skipif(ctok is None, reason="C kernel unavailable")
def test_tagset_projection_differential():
    """P3 projection through the C kernel == the Python kernel with
    tagset=, on adversarial and random marker streams (out-of-tagset
    markers dropped pre-encode; mismatched close markers of IN-tagset
    types still raise identically)."""
    tagsets = [
        frozenset(), frozenset({"PER"}), frozenset({"PER", "ORG"}),
        frozenset({"A", "B", "LOC", "X"}),
    ]
    for ts in tagsets:
        for s in ADVERSARIAL + MISMATCH:
            try:
                want = extract.extract_turn_entities_py(s, tagset=ts)
            except ValueError as e:
                with pytest.raises(ValueError) as e_c:
                    extract.extract_turn_entities_c(s, ts)
                assert str(e_c.value) == str(e), (repr(s), ts)
            else:
                assert extract.extract_turn_entities_c(s, ts) == want, (
                    repr(s), ts,
                )
    rng = random.Random(20260816)
    alphabet = list("abX0 .,;'\"-_") + [
        "__START_PER__ ", " __END_PER__", "__START_ORG__ ", " __END_ORG__",
        "__START_LOC__ ", " __END_LOC__", "word ", "O'Hare' ",
    ]
    for _ in range(4000):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 24)))
        ts = rng.choice(tagsets)
        try:
            want = extract.extract_turn_entities_py(s, tagset=ts)
        except ValueError as e:
            with pytest.raises(ValueError) as e_c:
                extract.extract_turn_entities_c(s, ts)
            assert str(e_c.value) == str(e), (repr(s), ts)
        else:
            assert extract.extract_turn_entities_c(s, ts) == want, (
                repr(s), ts,
            )


@pytest.mark.skipif(ctok is None, reason="C kernel unavailable")
def test_plain_tokens_differential():
    """Native plain_tokens == the Python twin on adversarial, random,
    and real-corpus inputs."""
    from webstruct_spark.operators.tagger import plain_tokens_py

    for s in ADVERSARIAL + MISMATCH:
        assert ctok.plain_tokens(s) == plain_tokens_py(s), repr(s)
    rng = random.Random(20260818)
    alphabet = list("abX0 .,;'\"-_") + [
        "__START_PER__ ", " __END_PER__", "__START_ORG__x ",
        "__STARTX__ ", "word ", "O'Hare' ", "...", "``", "''",
    ]
    for _ in range(6000):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 24)))
        assert ctok.plain_tokens(s) == plain_tokens_py(s), repr(s)
    for s in _sf001_texts():
        assert ctok.plain_tokens(s) == plain_tokens_py(s), repr(s)
