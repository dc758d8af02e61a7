# -*- coding: utf-8 -*-
"""build_doc_gold sentinel behavior when the corpus is unreadable.

The _DONE sentinel carries the gold VERSION plus the input tables'
footer fingerprints.  A regenerated corpus at the same path
invalidates cached gold via the fingerprints — but computing those
requires reading the corpus.  When the corpus is unreadable (dir
absent mid-regeneration, or a gold lookup triggered by a query over a
DIFFERENT sf_dir), an existing CURRENT-VERSION sentinel must win —
while a sentinel from older gold math must refuse loudly rather than
be served silently (the version field is json-parseable with no
corpus access).  No SparkSession needed — the builder is single-node.
"""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from webstruct_spark.sources.docgold import DOC_GOLD_VERSION, build_doc_gold


def _current_version_sentinel() -> str:
    return json.dumps({"v": DOC_GOLD_VERSION, "inputs": "unknowable"})


def _tiny_corpus(path) -> str:
    path.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": ["alpha beta gamma", "alpha beta delta"]}),
        str(path / "documents.parquet"),
    )
    rng = np.random.RandomState(7)
    pq.write_table(
        pa.table({
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array(
                [rng.rand(8).tolist(), rng.rand(8).tolist()],
                pa.list_(pa.float32()),
            ),
        }),
        str(path / "embeddings.parquet"),
    )
    return str(path)


def test_absent_corpus_with_current_sentinel_returns_cache(tmp_path):
    out = tmp_path / "gold"
    out.mkdir()
    (out / "_DONE").write_text(_current_version_sentinel())
    missing = str(tmp_path / "no_such_corpus")
    assert build_doc_gold(missing, str(out)) == str(out)


def test_absent_corpus_with_stale_version_sentinel_refuses(tmp_path):
    """Old-math gold must never be served just because the corpus is
    temporarily unreadable: both a pre-JSON sentinel and a JSON one
    with an older version field refuse with the version named."""
    missing = str(tmp_path / "no_such_corpus")
    for i, raw in enumerate(
        ["whatever-tag", json.dumps({"v": "0-ancient", "inputs": {}})]
    ):
        out = tmp_path / ("gold_%d" % i)
        out.mkdir()
        (out / "_DONE").write_text(raw)
        with pytest.raises(RuntimeError, match="stale-version gold"):
            build_doc_gold(missing, str(out))
        # refusal must leave the sentinel for the operator to inspect
        assert (out / "_DONE").read_text() == raw


def test_mid_regeneration_corpus_trusts_current_sentinel(tmp_path):
    """The OTHER unreadable shape: the corpus dir exists but its
    tables hold no .parquet files yet (regeneration writes into an
    empty dir).  table_fingerprint raises ValueError there, and the
    sentinel fallback must cover it exactly like dir-absent."""
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    (corpus / "documents.parquet").mkdir()  # dir with no parquet yet
    out = tmp_path / "gold"
    out.mkdir()
    (out / "_DONE").write_text(_current_version_sentinel())
    assert build_doc_gold(str(corpus), str(out)) == str(out)


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
    # neither failed build may have touched a _DONE: none half-written
    # in the fresh dir, and the forced dir's pre-existing one intact
    # (the tag raised before the rebuild reached its invalidation)
    assert not os.path.exists(out / "_DONE")
    assert (out2 / "_DONE").read_text() == "stale"


def test_force_rebuild_invalidates_sentinel_before_writing(
    tmp_path, monkeypatch
):
    """force=True over an UNCHANGED corpus is the one rebuild whose
    crash would leave a still-matching sentinel over a mixed
    old/new gold dir — so the sentinel must be unlinked before the
    first table write, and a mid-build crash must leave NO sentinel
    (the next non-force call then rebuilds instead of serving the
    torn dir)."""
    corpus = _tiny_corpus(tmp_path / "corpus")
    out = str(tmp_path / "gold")
    build_doc_gold(corpus, out)
    done = os.path.join(out, "_DONE")
    assert os.path.exists(done)
    # idempotent reuse on the unchanged corpus
    assert build_doc_gold(corpus, out) == out

    from webstruct_spark.sources import docgold as DG

    real_write = pq.write_table
    state = {"writes": 0}

    def crash_on_second_write(*a, **kw):
        state["writes"] += 1
        if state["writes"] == 2:
            raise RuntimeError("simulated mid-build crash")
        return real_write(*a, **kw)

    monkeypatch.setattr(DG.pq, "write_table", crash_on_second_write)
    with pytest.raises(RuntimeError, match="simulated mid-build"):
        build_doc_gold(corpus, out, force=True)
    assert not os.path.exists(done)  # sentinel invalidated up front
    monkeypatch.undo()
    # recovery: the next plain call sees no sentinel and rebuilds
    assert build_doc_gold(corpus, out) == out
    assert os.path.exists(done)


def test_fallback_is_marked_unverified_and_not_pinned(tmp_path):
    """The unreadable-corpus fallback serves the gold path but marks
    it UnverifiedGoldDir; _doc_gold_for must serve that answer
    without memoizing it, so once the corpus is regenerated the next
    call re-enters build_doc_gold and the fingerprint check can
    force the rebuild.  Pinning the fallback would compare every
    later distributed output in the driver process against gold from
    the OLD corpus."""
    from webstruct_spark.sources.docgold import UnverifiedGoldDir

    out = tmp_path / "gold"
    out.mkdir()
    (out / "_DONE").write_text(_current_version_sentinel())
    missing = str(tmp_path / "no_such_corpus")
    got = build_doc_gold(missing, str(out))
    assert got == str(out)  # still equal/usable as the plain path
    assert isinstance(got, UnverifiedGoldDir)
    assert got.fingerprint_verified is False
    # a verified build returns a plain (implicitly verified) path
    corpus = _tiny_corpus(tmp_path / "corpus")
    out2 = str(tmp_path / "gold2")
    got2 = build_doc_gold(corpus, out2)
    assert getattr(got2, "fingerprint_verified", True) is True

    # _doc_gold_for: fallback served but NOT cached; verified cached
    import __spark_entry__ as entry

    entry._DOCGOLD_CACHE.clear()
    try:
        # point the keyed cache dir at the fallback gold dir
        import webstruct_spark.sources.docgold as DG

        calls = {"n": 0}
        real = DG.build_doc_gold

        def counting(sf_dir, out_dir, force=False):
            calls["n"] += 1
            return real(missing, str(out), force=force)

        DG.build_doc_gold = counting
        try:
            assert entry._doc_gold_for(missing) == str(out)
            assert entry._DOCGOLD_CACHE == {}  # fallback not pinned
            assert entry._doc_gold_for(missing) == str(out)
            assert calls["n"] == 2  # re-entered, not served from cache
        finally:
            DG.build_doc_gold = real
        # and the verified path IS memoized (one underlying build)
        calls2 = {"n": 0}

        def counting2(sf_dir, out_dir, force=False):
            calls2["n"] += 1
            return real(corpus, out2, force=force)

        DG.build_doc_gold = counting2
        try:
            assert entry._doc_gold_for(corpus) == out2
            assert entry._doc_gold_for(corpus) == out2
            assert calls2["n"] == 1
        finally:
            DG.build_doc_gold = real
    finally:
        entry._DOCGOLD_CACHE.clear()
