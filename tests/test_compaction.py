# -*- coding: utf-8 -*-
"""Small-file compaction (:mod:`webstruct_spark.plans.compaction`):
row-identity, manifest lineage refresh, resume/append compatibility,
crash-window repair, and the Hadoop-route (file: URI) deployment
shape with the driver-local FS tripwire armed."""
import os
import shutil

import pytest
from pyspark.sql import functions as F

from webstruct_spark.plans import fsio
from webstruct_spark.plans.compaction import (
    APPEND_STAGES, SUF_OLD, SUF_TMP, compact_kg,
)
from webstruct_spark.plans.manifest import Manifest, table_fingerprint
from webstruct_spark.plans.pipeline import (
    CONV_IDS, STAGES, append_kg, build_kg,
)


@pytest.fixture(scope="module")
def kg_built(spark, corpus_dir, tmp_path_factory):
    """One base-build + one append (so every append-mode stage holds
    at least two writes' part files).  Mutating tests copy the dir."""
    base = tmp_path_factory.mktemp("compact")
    t = spark.read.parquet(os.path.join(corpus_dir, "transcripts.parquet"))
    convs = sorted(r[0] for r in t.select("conv_id").distinct().collect())
    half = set(convs[: len(convs) // 2])
    # corpus_c: a DISJOINT post-compaction delta (conv_ids remapped so
    # they overlap neither half)
    df_c = t.where(F.col("conv_id").isin(set(convs[:4]))).withColumn(
        "conv_id", F.concat(F.lit("zz_"), F.col("conv_id"))
    )
    for name, df in (
        ("corpus_a", t.where(F.col("conv_id").isin(half))),
        ("corpus_b", t.where(~F.col("conv_id").isin(half))),
        ("corpus_c", df_c),
    ):
        d = base / name
        os.makedirs(str(d))
        df.write.parquet(str(d / "transcripts.parquet"))
        # byte-identical gazetteer copies: the append guard compares
        # footer fingerprints, so don't re-encode via Spark
        src = os.path.join(corpus_dir, "gazetteer.parquet")
        dst = str(d / "gazetteer.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
    out = str(base / "kg")
    build_kg(spark, str(base / "corpus_a"), out)
    append_kg(spark, str(base / "corpus_b"), out)
    return {"out": out, "base": str(base), "corpus_dir": corpus_dir}


def _stage_rows(spark, out, stage):
    return sorted(map(repr, spark.read.parquet(out + "/" + stage).collect()))


def _copy_kg(kg_built, tmp_path):
    out = os.path.join(str(tmp_path), "kg")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    shutil.copytree(kg_built["out"], out)
    return out


def test_compact_preserves_rows_and_lineage(spark, kg_built, tmp_path):
    out = _copy_kg(kg_built, tmp_path)
    before = {s: _stage_rows(spark, out, s) for s in STAGES}
    fp_before = {
        s: table_fingerprint(out + "/" + s, spark=spark)
        for s in APPEND_STAGES
    }
    # the append guarantees ≥ 2 writes' files per append-mode stage
    assert all(fp_before[s]["n_files"] >= 2 for s in APPEND_STAGES)

    res = compact_kg(spark, out, force=True)
    for s in APPEND_STAGES:
        assert res[s]["compacted"], s
        assert res[s]["rows"] == fp_before[s]["rows"], s
        assert res[s]["n_files_after"] <= res[s]["n_files_before"], s
        assert _stage_rows(spark, out, s) == before[s], s
    # overwrite stages untouched
    for s in ("links", "nodes", "edges"):
        assert _stage_rows(spark, out, s) == before[s], s
    # side table compacted too, distinct convs preserved
    assert res[CONV_IDS]["compacted"]
    n_convs = spark.read.parquet(out + "/" + CONV_IDS).distinct().count()
    assert res[CONV_IDS]["rows"] == n_convs

    # manifest: fresh physical lineage, unchanged source identity;
    # history folded into one snapshot record file
    man = Manifest(out, spark=spark)
    rec_files = [
        n for n in os.listdir(out + "/manifest.d") if n.endswith(".json")
    ]
    assert len(rec_files) == 1 and "snapshot" in rec_files[0]
    assert len(man.records()) == len(man.committed())
    for s in APPEND_STAGES:
        rec = man.committed()[s]
        assert rec["inputs"][0].startswith("compact:"), s
        assert rec["rows_out"] == fp_before[s]["rows"], s
        assert not rec.get("files_delta"), s
        on_disk = sorted(
            n for n in fsio.listdir_names(spark, out + "/" + s)
            if n.endswith(".parquet")
        )
        assert sorted(f["name"] for f in rec["files"]) == on_disk, s

    # idempotent: nothing left to do, no new commits
    n_rec = len(man.records())
    res2 = compact_kg(spark, out)
    assert not any(v["compacted"] for v in res2.values())
    assert len(Manifest(out, spark=spark).records()) == n_rec


def test_resume_and_append_after_compaction(spark, kg_built, tmp_path):
    out = _copy_kg(kg_built, tmp_path)
    compact_kg(spark, out, force=True)

    # resume over the compacted build: every stage skipped
    man = Manifest(out, spark=spark)
    n_rec = len(man.records())
    build_kg(spark, kg_built["base"] + "/corpus_a", out)
    # NOTE resume identity is the BASE corpus only for a never-
    # appended build; this one was appended, so resume must REFUSE to
    # skip (union fingerprint ≠ corpus_a's) — compaction must not have
    # weakened that guard into a false skip.
    assert len(Manifest(out, spark=spark).records()) > n_rec

    # the real post-compaction contract: a further (disjoint) append
    # still works
    out2 = _copy_kg(kg_built, str(tmp_path / "again"))
    compact_kg(spark, out2, force=True)
    append_kg(spark, kg_built["base"] + "/corpus_c", out2)


def test_append_then_compact_round_trip(spark, kg_built, tmp_path):
    """compact → append → compact keeps every stage row-identical to
    the never-compacted twin."""
    out = _copy_kg(kg_built, tmp_path)
    compact_kg(spark, out, force=True)
    append_kg(spark, kg_built["base"] + "/corpus_c", out)
    compact_kg(spark, out, force=True)

    twin = _copy_kg(kg_built, str(tmp_path / "twin"))
    append_kg(spark, kg_built["base"] + "/corpus_c", twin)
    for s in STAGES:
        assert _stage_rows(spark, out, s) == _stage_rows(spark, twin, s), s


def test_repair_windows(spark, kg_built, tmp_path):
    stage = "mentions"

    # (a) pre-swap orphan tmp: dropped, stage untouched
    out = _copy_kg(kg_built, tmp_path)
    rows = _stage_rows(spark, out, stage)
    path = out + "/" + stage
    shutil.copytree(path, path + SUF_TMP)
    res = compact_kg(spark, out, stages=[stage], include_conv_ids=False)
    assert res[stage]["repair"] == "dropped_tmp"
    assert not fsio.exists(spark, path + SUF_TMP)
    assert _stage_rows(spark, out, stage) == rows

    # (b) crash between the two renames, tmp fully written (_SUCCESS):
    # roll forward + re-commit
    out = _copy_kg(kg_built, str(tmp_path / "b"))
    path = out + "/" + stage
    spark.read.parquet(path).coalesce(1).write.parquet(path + SUF_TMP)
    fsio.rename(spark, path, path + SUF_OLD)
    res = compact_kg(spark, out, stages=[stage], include_conv_ids=False)
    assert res[stage]["repair"] == "rolled_forward"
    assert _stage_rows(spark, out, stage) == rows
    assert not fsio.exists(spark, path + SUF_OLD)
    rec = Manifest(out, spark=spark).committed()[stage]
    assert rec["inputs"][0].startswith("compact:")

    # (c) crash between the renames with a PARTIAL tmp (no _SUCCESS):
    # roll back to the old dir
    out = _copy_kg(kg_built, str(tmp_path / "c"))
    path = out + "/" + stage
    shutil.copytree(path, path + SUF_TMP)
    os.remove(path + SUF_TMP + "/_SUCCESS")
    fsio.rename(spark, path, path + SUF_OLD)
    res = compact_kg(spark, out, stages=[stage], include_conv_ids=False)
    assert _stage_rows(spark, out, stage) == rows
    assert not fsio.exists(spark, path + SUF_OLD)
    assert not fsio.exists(spark, path + SUF_TMP)

    # (d) crash after the swap, old dir left behind: cleaned up +
    # re-committed
    out = _copy_kg(kg_built, str(tmp_path / "d"))
    path = out + "/" + stage
    shutil.copytree(path, path + SUF_OLD)
    res = compact_kg(spark, out, stages=[stage], include_conv_ids=False)
    assert res[stage]["repair"] == "finished_swap"
    assert not fsio.exists(spark, path + SUF_OLD)
    assert _stage_rows(spark, out, stage) == rows


def test_non_compact_entries_repair_crashed_swap(spark, kg_built,
                                                 tmp_path):
    """A kill inside compact_kg's swap must be settled by EVERY
    maintenance entry, not only the next --compact.  Mid-swap (stage
    dir ABSENT, row-verified data one rename away in the tmp): the
    read-only paths name the crashed compaction instead of
    misdiagnosing out-of-band deletion, and an append rolls the swap
    forward and proceeds instead of refusing "missing stages".
    Post-swap-pre-recommit (stage present, old-marker left, record
    totals STALE): the append entry re-syncs the record before
    rolling totals forward, so manifest n_files/bytes match disk."""
    import json as _json

    from jobs.kg_build import check_links_rc
    from webstruct_spark.plans.pipeline import check_kg_links, kg_status

    stage = "triples"

    # -- window 1: mid-swap (between the two renames) -----------------
    out = _copy_kg(kg_built, tmp_path)
    path = out + "/" + stage
    rows = _stage_rows(spark, out, stage)
    spark.read.parquet(path).coalesce(1).write.parquet(path + SUF_TMP)
    fsio.rename(spark, path, path + SUF_OLD)

    # read-only diagnosis mutates nothing and names the cause: the
    # audit's own input stage is mid-swap → structured refusal with
    # the compaction diagnosis, NOT "never built / out-of-band
    # deletion" steering toward a destructive rebuild
    st = kg_status(spark, out)
    assert st["crashed_compaction"] == [stage]
    rep = check_kg_links(spark, out)
    assert rep["audited"] is False
    assert rep["crashed_compaction"] == [stage]
    assert rep["probable_cause"].startswith("crashed compaction")
    assert check_links_rc(rep) == 3
    assert not fsio.exists(spark, path), "read-only audit repaired?!"

    # the append entry settles the swap (roll forward + re-commit)
    # and then appends normally — before the repair this refused
    # with "missing stages: mentions"
    append_kg(spark, kg_built["base"] + "/corpus_c", out)
    assert not fsio.exists(spark, path + SUF_OLD)
    assert not fsio.exists(spark, path + SUF_TMP)
    # compacted base + the disjoint delta, nothing lost or doubled
    twin = _copy_kg(kg_built, str(tmp_path / "twin"))
    append_kg(spark, kg_built["base"] + "/corpus_c", twin)
    assert _stage_rows(spark, out, stage) == _stage_rows(
        spark, twin, stage
    )

    # -- window 2: post-swap, pre-recommit (stale record totals) ------
    stage = "mentions"
    out2 = _copy_kg(kg_built, str(tmp_path / "w2"))
    path2 = out2 + "/" + stage
    spark.read.parquet(path2).coalesce(1).write.parquet(path2 + SUF_TMP)
    fsio.rename(spark, path2, path2 + SUF_OLD)
    fsio.rename(spark, path2 + SUF_TMP, path2)
    # a marker on a NON-audit stage leaves triples↔links auditable:
    # covered but mid-maintenance → rc 4, the "alert if it persists"
    # class, distinct from dirty's 3
    rep2 = check_kg_links(spark, out2)
    assert rep2["audited"] is True and rep2["uncovered"] == 0
    assert rep2["crashed_compaction"] == [stage]
    assert check_links_rc(rep2) == 4
    # record still lists pre-compaction n_files/bytes; without the
    # entry repair the append would roll these stale totals forward
    append_kg(spark, kg_built["base"] + "/corpus_c", out2)
    assert not fsio.exists(spark, path2 + SUF_OLD)
    rec = Manifest(out2, spark=spark).committed()[stage]
    listing = fsio.listdir(spark, path2)
    pq = [(n, b) for n, b in listing if n.endswith(".parquet")]
    assert rec["n_files"] == len(pq)
    assert rec["bytes"] == sum(b for _, b in pq)
    # and the status drift check agrees
    st2 = kg_status(spark, out2)
    assert st2["stages"][stage]["disk_matches_manifest"], _json.dumps(
        st2["stages"][stage]
    )


def test_entry_repair_does_not_launder_stale_layout(spark, kg_built,
                                                    tmp_path):
    """A compaction crashed mid-swap under layout N, then the library
    is upgraded (layout N+1): the entry-time repair must settle the
    DIR (roll the swap forward, drop the marker) but must NOT
    re-commit — ``Manifest.commit`` stamps the CURRENT layout, which
    would launder the old-layout record past ``is_committed``'s
    layout-bump refusal and let a resume serve old-schema data.
    ``compact_kg`` refuses this state outright; the entries repair
    the files and leave the stale record to the normal rebuild
    path."""
    from webstruct_spark.plans.compaction import (
        repair_crashed_compactions,
    )

    stage = "mentions"
    out = _copy_kg(kg_built, tmp_path)
    path = out + "/" + stage
    rows = _stage_rows(spark, out, stage)
    spark.read.parquet(path).coalesce(1).write.parquet(path + SUF_TMP)
    fsio.rename(spark, path, path + SUF_OLD)

    # an upgraded library: same out_dir, bumped layout version
    man = Manifest(out, layout_version="~tests-bumped-layout~",
                   spark=spark, create=False)
    states = repair_crashed_compactions(spark, man)
    assert states[stage] == "rolled_forward"
    assert _stage_rows(spark, out, stage) == rows  # data settled
    assert not fsio.exists(spark, path + SUF_OLD)  # marker dropped
    assert not fsio.exists(spark, path + SUF_TMP)
    rec = man.committed()[stage]
    assert rec["layout"] != man.layout_version  # NOT re-stamped
    assert not man.is_committed(stage, rec=rec)  # rebuild path holds

    # control: under the ORIGINAL layout the same crash shape IS
    # re-committed (fresh lineage, marker dropped) — the guard only
    # bites on a layout mismatch
    out2 = _copy_kg(kg_built, str(tmp_path / "same_layout"))
    path2 = out2 + "/" + stage
    spark.read.parquet(path2).coalesce(1).write.parquet(path2 + SUF_TMP)
    fsio.rename(spark, path2, path2 + SUF_OLD)
    man2 = Manifest(out2, layout_version=rec["layout"], spark=spark,
                    create=False)
    states2 = repair_crashed_compactions(spark, man2)
    assert states2[stage] == "rolled_forward"
    rec2 = man2.committed()[stage]
    assert rec2["inputs"][0].startswith("compact:")
    assert man2.is_committed(stage, rec=rec2)


def test_refuses_row_mismatch_and_unknown_stage(spark, kg_built, tmp_path):
    out = _copy_kg(kg_built, tmp_path)
    path = out + "/mentions"
    victim = next(
        n for n in sorted(os.listdir(path)) if n.endswith(".parquet")
    )
    os.remove(os.path.join(path, victim))
    with pytest.raises(ValueError, match="manifest says"):
        compact_kg(spark, out, stages=["mentions"],
                   include_conv_ids=False)
    with pytest.raises(ValueError, match="not append-mode"):
        compact_kg(spark, out, stages=["links"])


def test_compact_via_file_uri_tripwire(spark, kg_built, tmp_path,
                                       monkeypatch):
    """The whole compaction (inspect, rewrite, swap, re-commit) over a
    ``file:`` URI with the driver-local FS tripwire armed — the
    HDFS/S3 deployment shape.  The KG copy is staged under the marked
    path FIRST, then the tripwire is armed, so every access after this
    line must go through fsio's Hadoop route or Spark itself."""
    from conftest import arm_fs_tripwire

    marked = tmp_path / "uri_TRIPWIRE_OUT_DIR"
    shutil.copytree(kg_built["out"], str(marked / "kg"))
    arm_fs_tripwire(monkeypatch)
    out = "file:" + str(marked / "kg")
    before = {s: _stage_rows(spark, out, s) for s in APPEND_STAGES}
    res = compact_kg(spark, out, force=True)
    for s in APPEND_STAGES:
        assert res[s]["compacted"], s
        assert _stage_rows(spark, out, s) == before[s], s
    rec = Manifest(out, spark=spark).committed()["mentions"]
    assert rec["inputs"][0].startswith("compact:")


def test_repair_recommit_survives_second_crash(spark, kg_built, tmp_path):
    """The __compact_old__ marker must outlive the repair's manifest
    re-commit: a run that crashes BETWEEN the repair scan and the
    re-commit leaves the marker, so the next run retries the commit —
    marker-first deletion would strand the record's stale file lineage
    forever (the following run would see "clean" + already-compact and
    never refresh it)."""
    from webstruct_spark.plans.compaction import _repair

    stage = "mentions"
    out = _copy_kg(kg_built, tmp_path)
    path = out + "/" + stage
    rows = _stage_rows(spark, out, stage)

    # a real swap's steps 1-4, then crash before the re-commit: the
    # dir is now ONE coalesced file while the manifest still lists the
    # pre-compaction part files
    spark.read.parquet(path).coalesce(1).write.parquet(path + SUF_TMP)
    fsio.rename(spark, path, path + SUF_OLD)
    fsio.rename(spark, path + SUF_TMP, path)

    # second crash: a repair pass ran and died before the re-commit —
    # the marker must survive the repair itself
    assert _repair(spark, path) == "finished_swap"
    assert fsio.exists(spark, path + SUF_OLD)

    # third run repairs AND refreshes the lineage
    res = compact_kg(spark, out, stages=[stage], include_conv_ids=False)
    assert res[stage]["repair"] == "finished_swap"
    assert not fsio.exists(spark, path + SUF_OLD)
    assert _stage_rows(spark, out, stage) == rows
    rec = Manifest(out, spark=spark).committed()[stage]
    on_disk = sorted(
        n for n in fsio.listdir_names(spark, path)
        if n.endswith(".parquet")
    )
    assert sorted(f["name"] for f in rec["files"]) == on_disk
    assert not rec.get("files_delta")
    assert rec["rows_out"] == spark.read.parquet(path).count()


def test_compact_preserves_delta_provenance(spark, kg_built, tmp_path):
    """A scheduled compact between a plain append and its
    at-least-once retry must not strip the extracted record's
    delta_fp — the fully-applied retry skip reads it off the LATEST
    record, and losing it turns the documented no-op retry into the
    'de-duplicate first' refusal."""
    from webstruct_spark.plans.pipeline import append_kg_frames

    out = _copy_kg(kg_built, tmp_path)
    corpus_c = os.path.join(kg_built["base"], "corpus_c")
    delta = spark.read.parquet(
        os.path.join(corpus_c, "transcripts.parquet")
    )
    gaz_path = os.path.join(corpus_c, "gazetteer.parquet")
    gaz = spark.read.parquet(gaz_path)
    gaz_fp = table_fingerprint(gaz_path)
    delta_fp = table_fingerprint(
        os.path.join(corpus_c, "transcripts.parquet")
    )

    append_kg_frames(
        spark, delta, gaz, gaz_fp, out, delta_transcripts_fp=delta_fp
    )
    compact_kg(spark, out)
    man = Manifest(out, spark=spark)
    assert man.committed()["extracted"].get("delta_fp") == delta_fp

    # the at-least-once retry after the compact: a provable no-op
    n_before = spark.read.parquet(os.path.join(out, "extracted")).count()
    append_kg_frames(
        spark, delta, gaz, gaz_fp, out, delta_transcripts_fp=delta_fp
    )
    assert spark.read.parquet(
        os.path.join(out, "extracted")
    ).count() == n_before


def test_refused_compact_leaves_no_manifest_dir(spark, tmp_path):
    """compact_kg against a typo'd / never-built out_dir must refuse
    WITHOUT creating manifest.d there (same entry-point hygiene as
    append/refresh)."""
    typo = str(tmp_path / "kg_nope")
    with pytest.raises(ValueError, match="nothing is committed"):
        compact_kg(spark, typo)
    assert not os.path.exists(typo)


def test_noop_compact_reads_no_footers(spark, kg_built, tmp_path,
                                       monkeypatch):
    """A scheduled compact over an already-compact build must decide
    "nothing to do" from ONE dir listing per stage — at the design
    point (40-80k x 128 MiB files) per-file footer reads on the no-op
    path are the exact pathology the module exists to remove.  The
    guarantee is per-STAGE (every stage has a manifest record whose
    row total the listing check makes trustworthy); the slim
    _conv_ids side table has no record, so its no-op keeps the real
    row report by footer-counting its handful of files."""
    from webstruct_spark.plans import compaction as C

    out = _copy_kg(kg_built, tmp_path)
    first = compact_kg(spark, out)
    assert any(r["compacted"] for r in first.values())
    n_convs = spark.read.parquet(out + "/" + CONV_IDS).count()

    def forbidden(*a, **k):
        raise AssertionError("footer read on the no-op compact path")

    monkeypatch.setattr(C, "table_fingerprint", forbidden)
    second = compact_kg(spark, out, include_conv_ids=False)
    assert not any(r["compacted"] for r in second.values())
    # every stage's no-op still reports the manifest-trustworthy rows
    assert all(r["rows"] is not None for r in second.values())
    monkeypatch.undo()
    # side-table no-op: not compacted, and rows is the REAL count
    # (not None — a silent CLI report regression otherwise)
    third = compact_kg(spark, out)
    assert not third[CONV_IDS]["compacted"]
    assert third[CONV_IDS]["rows"] == n_convs
    # the listing-vs-record corruption check still guards the no-op
    # path: delete a part file and the same run refuses
    victim_dir = os.path.join(out, "extracted")
    victim = next(
        n for n in sorted(os.listdir(victim_dir))
        if n.endswith(".parquet")
    )
    os.remove(os.path.join(victim_dir, victim))
    with pytest.raises(ValueError, match="manifest says"):
        compact_kg(spark, out, stages=["extracted"],
                   include_conv_ids=False)
