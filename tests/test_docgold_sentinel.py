# -*- coding: utf-8 -*-
"""build_doc_gold sentinel behavior when the corpus dir is absent.

The _DONE sentinel carries the input tables' footer fingerprints so a
REGENERATED corpus at the same path invalidates cached gold — but
computing that fingerprint requires reading the corpus.  When the
corpus dir is absent (mid-regeneration, or a gold lookup triggered by
a query over a DIFFERENT sf_dir), an existing sentinel must win: the
pre-fingerprint contract returned the cached gold without touching
sf_dir, and anything that actually READS the absent corpus fails on
its own.  No SparkSession needed — the builder is single-node.
"""

import os

import pytest

from webstruct_spark.sources.docgold import build_doc_gold


def test_absent_corpus_with_sentinel_returns_cache(tmp_path):
    out = tmp_path / "gold"
    out.mkdir()
    (out / "_DONE").write_text("whatever-tag")
    missing = str(tmp_path / "no_such_corpus")
    assert build_doc_gold(missing, str(out)) == str(out)


def test_absent_corpus_without_sentinel_raises(tmp_path):
    out = tmp_path / "gold_fresh"
    missing = str(tmp_path / "no_such_corpus")
    with pytest.raises(FileNotFoundError):
        build_doc_gold(missing, str(out))
    # and force=True must never trust a sentinel it was told to ignore
    out2 = tmp_path / "gold_forced"
    out2.mkdir()
    (out2 / "_DONE").write_text("stale")
    with pytest.raises(FileNotFoundError):
        build_doc_gold(missing, str(out2), force=True)
    # neither failed build may have left a half-written _DONE behind
    assert not os.path.exists(out / "_DONE")
