# -*- coding: utf-8 -*-
"""Differential fuzz vs the actual reference tokenizer (skipped when
the reference checkout is absent) — the strongest gate on the
fast-path scanner, covering the $-before-final-newline and
sentinel-context cases."""
import importlib.util
import os
import random

import pytest

REF = "/root/reference/webstruct/text_tokenizers.py"


@pytest.mark.skipif(not os.path.exists(REF), reason="reference absent")
def test_differential_fuzz_vs_reference():
    spec = importlib.util.spec_from_file_location("ref_tok", REF)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    from webstruct_spark.kernel.tokenize import (
        default_segment_words,
        segment_words,
    )

    rng = random.Random(20260816)
    alphabet = list("abcXYZ019 \t\n.,;:'\"()[]{}<>|!?#$%&-@_/“”…`©£") + [
        "__START_PER__", "__END_PER__", "...", "--", "''", "``",
        "don't", "O'Hare'", "a.b.", "x,1", "w.'", "end.\n", "z.'\n",
    ]
    wt = ref.WordTokenizer()
    dt = ref.DefaultTokenizer()
    for _ in range(5000):
        s = "".join(
            rng.choice(alphabet) for _ in range(rng.randint(0, 25))
        )
        assert segment_words(s) == [
            (t.chars, t.position, t.length) for t in wt.segment_words(s)
        ], repr(s)
        assert default_segment_words(s) == [
            (t.chars, t.position, t.length) for t in dt.segment_words(s)
        ], repr(s)
