# -*- coding: utf-8 -*-
"""refresh_gazetteer: re-link an existing build against a NEW
gazetteer by recomputing only links/nodes/edges — never the corpus."""
import os
import shutil

import pytest
from pyspark.sql import functions as F


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        repr(tuple(r[c] for c in cols))
        for r in df.select(*cols).collect()
    )


def _manifest_state(out):
    d = os.path.join(out, "manifest.d")
    return sorted(os.listdir(d)) if os.path.isdir(d) else []


def _corpus_with_gaz(spark, corpus_dir, tmp_path, name, gaz_df):
    """A corpus dir sharing corpus_dir's transcripts but carrying
    ``gaz_df`` as its gazetteer (for fresh-build twins)."""
    d = str(tmp_path / name)
    os.makedirs(d)
    os.symlink(
        os.path.join(corpus_dir, "transcripts.parquet"),
        os.path.join(d, "transcripts.parquet"),
    )
    gaz_df.write.parquet(os.path.join(d, "gazetteer.parquet"))
    return d


@pytest.fixture()
def new_gaz(spark, corpus_dir):
    """A deterministically SHRUNK gazetteer (drops every alias whose
    canonical id ends in an odd digit) — changes real link/node/edge
    rows without touching the corpus."""
    from webstruct_spark.sources.gazshrink import shrink_gazetteer

    gaz = spark.read.parquet(os.path.join(corpus_dir, "gazetteer.parquet"))
    return shrink_gazetteer(gaz)


def test_refresh_equals_fresh_build_and_skips_corpus(
        spark, corpus_dir, tmp_path, new_gaz):
    """links/nodes/edges after a refresh must equal a fresh build_kg
    over the same corpus with the new gazetteer; the corpus-scale
    stage tables and their manifest records must be byte-untouched;
    re-running the refresh (and refreshing with the now-current
    gazetteer) must be a manifest-level no-op."""
    from webstruct_spark.plans.manifest import table_fingerprint
    from webstruct_spark.plans.pipeline import (
        STAGES, build_kg, refresh_gazetteer,
    )

    out = str(tmp_path / "kg")
    build_kg(spark, corpus_dir, out)
    corpus_stage_files = {
        s: sorted(os.listdir(os.path.join(out, s)))
        for s in ("extracted", "mentions", "group_entities",
                  "groups", "triples")
    }

    gaz2_dir = _corpus_with_gaz(spark, corpus_dir, tmp_path, "c2", new_gaz)
    gaz2_path = os.path.join(gaz2_dir, "gazetteer.parquet")
    gaz2 = spark.read.parquet(gaz2_path)
    gaz2_fp = table_fingerprint(gaz2_path)

    refresh_gazetteer(spark, gaz2, gaz2_fp, out)

    fresh = build_kg(spark, gaz2_dir, str(tmp_path / "fresh"))
    for stage in ("links", "nodes", "edges"):
        got = spark.read.parquet(os.path.join(out, stage))
        want = spark.read.parquet(fresh[stage])
        assert _rows(got) == _rows(want), stage
    for s, files in corpus_stage_files.items():
        assert sorted(os.listdir(os.path.join(out, s))) == files, s

    # idempotent: a second refresh with the same gazetteer is a no-op
    state = _manifest_state(out)
    refresh_gazetteer(spark, gaz2, gaz2_fp, out)
    assert _manifest_state(out) == state


def test_refresh_changes_output(spark, corpus_dir, tmp_path, new_gaz):
    """The shrunk gazetteer must actually change the nodes table —
    guards the twin test against a vacuous fixture."""
    from webstruct_spark.plans.manifest import table_fingerprint
    from webstruct_spark.plans.pipeline import build_kg, refresh_gazetteer

    out = str(tmp_path / "kg")
    build_kg(spark, corpus_dir, out)
    before = _rows(spark.read.parquet(os.path.join(out, "nodes")))

    gaz2_dir = _corpus_with_gaz(spark, corpus_dir, tmp_path, "c2", new_gaz)
    gaz2_path = os.path.join(gaz2_dir, "gazetteer.parquet")
    refresh_gazetteer(
        spark, spark.read.parquet(gaz2_path),
        table_fingerprint(gaz2_path), out,
    )
    after = _rows(spark.read.parquet(os.path.join(out, "nodes")))
    assert before != after


def test_refresh_after_append(spark, corpus_dir, tmp_path, new_gaz):
    """Refresh over an APPENDED base (the case build_kg(resume=True)
    cannot cover: the union fingerprint matches no corpus dir) must
    equal a fresh union build with the new gazetteer."""
    from webstruct_spark.plans.manifest import table_fingerprint
    from webstruct_spark.plans.pipeline import (
        append_kg, build_kg, refresh_gazetteer,
    )

    t = spark.read.parquet(os.path.join(corpus_dir, "transcripts.parquet"))
    convs = sorted(r[0] for r in t.select("conv_id").distinct().collect())
    half = set(convs[: len(convs) // 2])
    dirs = {}
    for name, pred in (("a", F.col("conv_id").isin(half)),
                       ("b", ~F.col("conv_id").isin(half))):
        d = str(tmp_path / name)
        os.makedirs(d)
        t.where(pred).write.parquet(os.path.join(d, "transcripts.parquet"))
        shutil.copy(os.path.join(corpus_dir, "gazetteer.parquet"),
                    os.path.join(d, "gazetteer.parquet"))
        dirs[name] = d

    out = str(tmp_path / "kg")
    build_kg(spark, dirs["a"], out)
    append_kg(spark, dirs["b"], out)

    gaz2_dir = _corpus_with_gaz(spark, corpus_dir, tmp_path, "c2", new_gaz)
    gaz2_path = os.path.join(gaz2_dir, "gazetteer.parquet")
    refresh_gazetteer(
        spark, spark.read.parquet(gaz2_path),
        table_fingerprint(gaz2_path), out,
    )

    fresh = build_kg(spark, gaz2_dir, str(tmp_path / "fresh"))
    for stage in ("links", "nodes", "edges"):
        got = spark.read.parquet(os.path.join(out, stage))
        want = spark.read.parquet(fresh[stage])
        assert _rows(got) == _rows(want), stage

    # ...and the refreshed base still accepts future appends (the
    # union identity it committed is coherent)
    from webstruct_spark.plans.pipeline import kg_status

    st = kg_status(spark, out)
    assert not st["torn"]


def test_refresh_crash_is_resumable(
        spark, corpus_dir, tmp_path, new_gaz, monkeypatch):
    """A refresh killed between the links and nodes commits leaves a
    gazetteer-only tear: kg_status reports it, append refuses the
    base, and re-running the SAME refresh repairs it to the
    never-crashed twin."""
    from webstruct_spark.plans.manifest import Manifest, table_fingerprint
    from webstruct_spark.plans.pipeline import (
        append_kg, build_kg, kg_status, refresh_gazetteer,
    )

    out = str(tmp_path / "kg")
    build_kg(spark, corpus_dir, out)

    gaz2_dir = _corpus_with_gaz(spark, corpus_dir, tmp_path, "c2", new_gaz)
    gaz2_path = os.path.join(gaz2_dir, "gazetteer.parquet")
    gaz2 = spark.read.parquet(gaz2_path)
    gaz2_fp = table_fingerprint(gaz2_path)

    real_commit = Manifest.commit

    def dying_commit(self, stage, *a, **k):
        if stage == "nodes":
            raise RuntimeError("simulated driver death")
        return real_commit(self, stage, *a, **k)

    monkeypatch.setattr(Manifest, "commit", dying_commit)
    with pytest.raises(Exception, match="simulated driver death"):
        refresh_gazetteer(spark, gaz2, gaz2_fp, out)
    monkeypatch.setattr(Manifest, "commit", real_commit)

    st = kg_status(spark, out)
    assert st["torn"] and st["torn_stages"]

    # the refusal must name the ACTUAL cause and recovery — a
    # crashed refresh, repaired by re-running it — not the generic
    # crashed-append message whose "re-run the crashed append"
    # advice dead-ends (no append ever ran; every retry re-raises)
    with pytest.raises(ValueError,
                       match="re-run refresh_gazetteer"):
        append_kg(spark, gaz2_dir, out)

    refresh_gazetteer(spark, gaz2, gaz2_fp, out)  # the repair
    assert not kg_status(spark, out)["torn"]

    fresh = build_kg(spark, gaz2_dir, str(tmp_path / "fresh"))
    for stage in ("links", "nodes", "edges"):
        got = spark.read.parquet(os.path.join(out, stage))
        want = spark.read.parquet(fresh[stage])
        assert _rows(got) == _rows(want), stage


def test_refresh_refuses_torn_append_base(
        spark, corpus_dir, tmp_path, monkeypatch):
    """A base torn by a crashed APPEND (shared-identity tear) must be
    refused: recomputing links over its mixed mentions table would
    spread the tear."""
    from webstruct_spark.plans.manifest import Manifest, table_fingerprint
    from webstruct_spark.plans.pipeline import (
        append_kg_frames, build_kg, refresh_gazetteer,
    )

    t = spark.read.parquet(os.path.join(corpus_dir, "transcripts.parquet"))
    convs = sorted(r[0] for r in t.select("conv_id").distinct().collect())
    half = set(convs[: len(convs) // 2])
    corpus_a = str(tmp_path / "a")
    os.makedirs(corpus_a)
    t.where(F.col("conv_id").isin(half)).write.parquet(
        os.path.join(corpus_a, "transcripts.parquet")
    )
    shutil.copy(os.path.join(corpus_dir, "gazetteer.parquet"),
                os.path.join(corpus_a, "gazetteer.parquet"))
    df_b = t.where(~F.col("conv_id").isin(half))

    out = str(tmp_path / "kg")
    build_kg(spark, corpus_a, out)
    gaz_path = os.path.join(corpus_a, "gazetteer.parquet")
    gaz = spark.read.parquet(gaz_path)
    gaz_fp = table_fingerprint(gaz_path)

    real_commit = Manifest.commit

    def dying_commit(self, stage, *a, **k):
        if stage == "groups":
            raise RuntimeError("simulated driver death")
        return real_commit(self, stage, *a, **k)

    monkeypatch.setattr(Manifest, "commit", dying_commit)
    with pytest.raises(Exception, match="simulated driver death"):
        append_kg_frames(spark, df_b, gaz, gaz_fp, out,
                         batch_id=0, stream_id="s1")
    monkeypatch.setattr(Manifest, "commit", real_commit)

    with pytest.raises(ValueError, match="resume it"):
        refresh_gazetteer(spark, gaz, gaz_fp, out)


def test_refresh_repairs_mid_overwrite_crash(
        spark, corpus_dir, tmp_path, new_gaz):
    """A refresh (or append) killed DURING a global stage's overwrite
    write leaves the stage dir without _SUCCESS (mode('overwrite')
    deletes the old dir first).  Re-running the refresh must treat
    the missing global stage as work to recompute — not raise the
    'needs ... committed' refusal that would dead-end the documented
    re-run recovery."""
    import shutil as sh

    from webstruct_spark.plans.manifest import table_fingerprint
    from webstruct_spark.plans.pipeline import build_kg, refresh_gazetteer

    out = str(tmp_path / "kg")
    build_kg(spark, corpus_dir, out)

    gaz2_dir = _corpus_with_gaz(spark, corpus_dir, tmp_path, "c2", new_gaz)
    gaz2_path = os.path.join(gaz2_dir, "gazetteer.parquet")
    gaz2 = spark.read.parquet(gaz2_path)
    gaz2_fp = table_fingerprint(gaz2_path)

    # emulate the mid-write window: the links dir is gone entirely
    sh.rmtree(os.path.join(out, "links"))

    refresh_gazetteer(spark, gaz2, gaz2_fp, out)  # must not refuse

    fresh = build_kg(spark, gaz2_dir, str(tmp_path / "fresh"))
    for stage in ("links", "nodes", "edges"):
        got = spark.read.parquet(os.path.join(out, stage))
        want = spark.read.parquet(fresh[stage])
        assert _rows(got) == _rows(want), stage


def test_landed_uncommitted_overwrite_not_served_by_resume(
        spark, corpus_dir, tmp_path, new_gaz, monkeypatch):
    """The landed-but-uncommitted OVERWRITE window: a refresh dies
    AFTER the nodes overwrite lands (fresh _SUCCESS on disk) but
    BEFORE its manifest commit.  The stale nodes record (original
    gazetteer identity) is then validated by the new write's marker —
    without the overwrite-kind write-ahead intent, an operator who
    recovers with build_kg(resume=True) instead of re-running the
    refresh would be served gaz2-content nodes under the gaz1
    identity beside gaz1-recomputed links, with kg_status reporting
    healthy.  The intent must make that resume reconcile the unlanded
    write away and rebuild a CONSISTENT original-gazetteer graph."""
    from webstruct_spark.plans.manifest import Manifest, table_fingerprint
    from webstruct_spark.plans.pipeline import (
        build_kg, kg_status, refresh_gazetteer,
    )

    out = str(tmp_path / "kg")
    build_kg(spark, corpus_dir, out)
    original = {
        s: _rows(spark.read.parquet(os.path.join(out, s)))
        for s in ("links", "nodes", "edges")
    }

    gaz2_dir = _corpus_with_gaz(spark, corpus_dir, tmp_path, "c2", new_gaz)
    gaz2_path = os.path.join(gaz2_dir, "gazetteer.parquet")
    gaz2 = spark.read.parquet(gaz2_path)
    gaz2_fp = table_fingerprint(gaz2_path)

    real_commit = Manifest.commit

    def dying_commit(self, stage, *a, **k):
        if stage == "nodes":
            # the overwrite has already landed when commit runs
            raise RuntimeError("simulated driver death")
        return real_commit(self, stage, *a, **k)

    monkeypatch.setattr(Manifest, "commit", dying_commit)
    with pytest.raises(Exception, match="simulated driver death"):
        refresh_gazetteer(spark, gaz2, gaz2_fp, out)
    monkeypatch.setattr(Manifest, "commit", real_commit)

    # the window's signature: nodes dir carries the NEW write's
    # _SUCCESS while the manifest still holds the OLD record
    assert os.path.exists(os.path.join(out, "nodes", "_SUCCESS"))
    gaz2_nodes = _rows(spark.read.parquet(os.path.join(out, "nodes")))
    assert gaz2_nodes != original["nodes"]

    # the WRONG (but plausible) recovery: plain resume over the
    # original corpus — must reconcile the unlanded overwrite and
    # rebuild, never serve the gaz2 bytes under the gaz1 identity
    build_kg(spark, corpus_dir, out, resume=True)

    st = kg_status(spark, out)
    assert not st["torn"] and not st["pending_intents"]
    for stage in ("links", "nodes", "edges"):
        got = _rows(spark.read.parquet(os.path.join(out, stage)))
        assert got == original[stage], stage


def test_shrink_twin_parity_on_malformed_ids(spark):
    """Spark filter vs Python twin on adversarial canonical ids:
    non-digit tails, the EMPTY string, non-ASCII digits ('²' '٤') —
    both sides must DROP them (try_cast NULL / guarded twin), never
    raise.  Pins the ANSI-mode behavior: a plain cast would throw
    under Spark 4's default ANSI instead of NULLing."""
    from webstruct_spark.sources.gazshrink import keep_alias, shrink_gazetteer

    ids = ["c0", "c1", "c2", "cX", "", "c²", "c٤", "6", "x8"]
    df = spark.createDataFrame(
        [(i, "a%d" % n) for n, i in enumerate(ids)],
        "canonical_id string, alias string",
    )
    kept_spark = sorted(
        r["canonical_id"] for r in shrink_gazetteer(df).collect()
    )
    kept_twin = sorted(i for i in ids if keep_alias(i))
    assert kept_spark == kept_twin == ["6", "c0", "c2", "x8"]
