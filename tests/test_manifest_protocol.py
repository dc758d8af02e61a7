# -*- coding: utf-8 -*-
"""Crash/race windows of the manifest protocol itself
(:mod:`webstruct_spark.plans.manifest`): the records()-vs-
compact_records() vanish race, the intent-stamped landed proof for
overwrite reconciliation (clock-skew independence), and the
zero-part-file committed stage surviving a pre-write overwrite crash.
All local-filesystem — no Spark session needed."""
import json
import os
import time

from webstruct_spark.plans import fsio
from webstruct_spark.plans.manifest import Manifest


def _write_record(man: Manifest, stage: str, seq: int, **fields) -> str:
    """Fabricate a commit record file the way commit() names them."""
    rec = dict(
        stage=stage,
        layout=man.layout_version,
        inputs=[],
        rows_out=0,
        n_files=0,
        bytes=0,
        files=[],
        wall_sec=0.0,
        committed_utc_ns=time.time_ns(),
    )
    rec.update(fields)
    name = "rec-%020d-%06d-%07d-%s.json" % (
        rec["committed_utc_ns"], seq, os.getpid(), stage
    )
    fsio.write_text_atomic(
        None, fsio.join(man.records_dir, name), json.dumps(rec)
    )
    return name


def test_records_tolerates_compact_records_race(tmp_path, monkeypatch):
    """A record file listed by records() can vanish before its read —
    compact_records() deletes superseded files after writing its
    snapshot.  The read must RETRY from a fresh listing (which
    includes the snapshot), not skip the file (losing a stage) and
    not crash (turning a healthy scheduled audit into rc 1)."""
    man = Manifest(str(tmp_path / "kg"), spark=None)
    _write_record(man, "extracted", 0, rows_out=10)
    _write_record(man, "mentions", 1, rows_out=7)
    before = man.records()
    assert {r["stage"] for r in before} == {"extracted", "mentions"}

    real_read = fsio.read_text
    state = {"fired": False}

    def racing_read(spark, path):
        # first record-file read: simulate a concurrent
        # compact_records() — fold both records into one snapshot,
        # delete the originals, then fail the in-flight read the way
        # the deleted file would
        if path.endswith(".json") and not state["fired"]:
            state["fired"] = True
            snap = dict(
                type="snapshot",
                records=before,
                committed_utc_ns=time.time_ns(),
            )
            for n in os.listdir(man.records_dir):
                if n.endswith(".json"):
                    os.remove(os.path.join(man.records_dir, n))
            fsio.write_text_atomic(
                None,
                fsio.join(
                    man.records_dir,
                    "rec-%020d-%06d-%07d-snapshot.json"
                    % (snap["committed_utc_ns"], 99, os.getpid()),
                ),
                json.dumps(snap),
            )
            raise FileNotFoundError(path)
        return real_read(spark, path)

    import webstruct_spark.plans.manifest as manifest_mod

    monkeypatch.setattr(manifest_mod.fsio, "read_text", racing_read)
    after = man.records()
    assert sorted(r["stage"] for r in after) == ["extracted", "mentions"]
    assert {r["stage"]: r["rows_out"] for r in after} == {
        "extracted": 10, "mentions": 7,
    }

    # a read failure on a file that STILL EXISTS is not the benign
    # race — it must raise immediately, not be skipped or retried
    # into silence
    def broken_read(spark, path):
        if path.endswith(".json"):
            raise IOError("disk says no: %s" % path)
        return real_read(spark, path)

    monkeypatch.setattr(manifest_mod.fsio, "read_text", broken_read)
    try:
        man.records()
    except IOError:
        pass
    else:  # pragma: no cover
        raise AssertionError("expected a persistent read error to raise")


def test_records_survives_whole_compaction_delete_loop(
    tmp_path, monkeypatch
):
    """ONE compact_records() deletes O(history) superseded files one
    by one (an object-store RPC each), so a concurrent reader can hit
    a vanished file on EVERY file it touches — many more vanishes
    than the retry bound.  After the first restart the fresh listing
    contains the snapshot, so every further vanish from the same
    delete loop must be skipped IN-PASS (the snapshot proves the
    fold), not spent as another retry: a bound-exhaustion crash here
    turns a healthy scheduled audit into the rc-1 'audit code broke'
    class.  This simulates the delete loop staying one file ahead of
    the reader for the whole pass."""
    man = Manifest(str(tmp_path / "kg"), spark=None)
    stages = ["s%02d" % i for i in range(6)]
    for i, s in enumerate(stages):
        _write_record(man, s, i, rows_out=i)
    before = man.records()
    assert [r["stage"] for r in before] == stages

    real_read = fsio.read_text
    state = {"snap_written": False, "listing_passes": 0}
    snap_prefix = "rec-99999999999999999999"  # sorts after everything

    def delete_loop_read(spark, path):
        name = os.path.basename(path)
        # snapshot reads succeed; original record files each vanish
        # just before their read, exactly as a delete loop running
        # ahead of the reader produces
        if name.endswith("-snapshot.json"):
            return real_read(spark, path)
        if path.endswith(".json"):
            if not state["snap_written"]:
                state["snap_written"] = True
                snap = dict(
                    type="snapshot", records=before,
                    committed_utc_ns=time.time_ns(),
                )
                fsio.write_text_atomic(
                    None,
                    fsio.join(
                        man.records_dir,
                        snap_prefix + "-000099-0000001-snapshot.json",
                    ),
                    json.dumps(snap),
                )
            os.remove(path)
            raise FileNotFoundError(path)
        return real_read(spark, path)

    import webstruct_spark.plans.manifest as manifest_mod

    real_list = fsio.listdir_names

    def counting_list(spark, path):
        state["listing_passes"] += 1
        return real_list(spark, path)

    monkeypatch.setattr(manifest_mod.fsio, "read_text", delete_loop_read)
    monkeypatch.setattr(
        manifest_mod.fsio, "listdir_names", counting_list
    )
    after = man.records()
    assert {r["stage"]: r["rows_out"] for r in after} == {
        s: i for i, s in enumerate(stages)
    }
    # one restart absorbs the whole delete loop: pass 1 hits the
    # first vanish (no snapshot listed yet) and restarts; pass 2
    # lists the snapshot, skips every further vanish in-pass, and —
    # because it skipped — pays ONE verification re-list at the end
    # proving no newer snapshot appeared mid-pass (the clock-skew
    # second-compaction race)
    assert state["listing_passes"] == 3, state["listing_passes"]


def test_records_tolerates_legacy_manifest_vanish(tmp_path, monkeypatch):
    """The legacy ``manifest.jsonl`` read races compact_records() too
    — it deletes that file LAST, strictly after its snapshot (which
    folds every legacy line) is on disk.  A vanish between the
    exists() probe and the read must fall through to the manifest.d
    pass (whose listing, starting after the vanish, necessarily
    includes the snapshot = the post-compaction view), not crash a
    scheduled read-only audit into rc 1.  A read failure with the
    file still present stays a hard error."""
    man = Manifest(str(tmp_path / "kg"), spark=None)
    legacy = dict(
        stage="extracted", layout=man.layout_version, inputs=[],
        rows_out=10, n_files=1, bytes=1, files=[], wall_sec=0.0,
        committed_utc_ns=time.time_ns(),
    )
    with open(man.path, "w") as f:
        f.write(json.dumps(legacy) + "\n")
    assert [r["stage"] for r in man.records()] == ["extracted"]

    real_read = fsio.read_text

    def racing_read(spark, path):
        if path == man.path:
            # concurrent compact_records(): snapshot written FIRST,
            # then the legacy file deleted, then our in-flight read
            # fails the way the deleted file would
            snap = dict(
                type="snapshot", records=[legacy],
                committed_utc_ns=time.time_ns(),
            )
            fsio.write_text_atomic(
                None,
                fsio.join(
                    man.records_dir,
                    "rec-%020d-%06d-%07d-snapshot.json"
                    % (snap["committed_utc_ns"], 99, os.getpid()),
                ),
                json.dumps(snap),
            )
            os.remove(man.path)
            raise FileNotFoundError(path)
        return real_read(spark, path)

    import webstruct_spark.plans.manifest as manifest_mod

    monkeypatch.setattr(manifest_mod.fsio, "read_text", racing_read)
    after = man.records()
    assert {r["stage"]: r["rows_out"] for r in after} == {"extracted": 10}

    # persistent failure with the legacy file still present is NOT
    # the benign race — it must raise, never be read as "no legacy"
    with open(man.path, "w") as f:
        f.write(json.dumps(legacy) + "\n")

    def broken_read(spark, path):
        if path == man.path:
            raise IOError("disk says no: %s" % path)
        return real_read(spark, path)

    monkeypatch.setattr(manifest_mod.fsio, "read_text", broken_read)
    try:
        man.records()
    except IOError:
        pass
    else:  # pragma: no cover
        raise AssertionError("expected a persistent read error to raise")


def test_overwrite_landed_proof_is_intent_stamp_not_clock(tmp_path):
    """reconcile_intents' landed proof for an overwrite intent: the
    commit record stamps the intent name it was written under, and
    that exact match decides — NOT cross-process wall-clock ordering.
    A record stamped with a DIFFERENT (older) intent must read as
    unlanded even when a skewed clock makes it look newer than the
    pending intent."""
    man = Manifest(str(tmp_path / "kg"), spark=None)
    stage_dir = man.stage_path("links")
    os.makedirs(stage_dir)
    # the crashed overwrite landed new UUID-named files + _SUCCESS
    open(os.path.join(stage_dir, "part-new.parquet"), "w").close()
    open(os.path.join(stage_dir, "_SUCCESS"), "w").close()

    fp = {"gazetteer": {"rows": 5}}
    # prior record: same identity (a same-identity re-run), stamped
    # with an OLD intent, committed_utc_ns in the FUTURE (clock skew
    # that would defeat a recency comparison)
    _write_record(
        man, "links", 0,
        source_fp=fp,
        intent_file="intent-0-old.intent",
        committed_utc_ns=time.time_ns() + 10**12,
    )
    name = man.write_intent("links", ["part-old.parquet"], fp,
                            kind="overwrite")
    res = man.reconcile_intents()
    # unlanded + pre-state not intact (the write started) → cleared
    assert res["links"] == "cleared"
    assert not os.path.exists(stage_dir)
    assert man.intents() == []

    # positive: a record stamping THIS intent is the landed proof,
    # even with committed_utc_ns BEHIND the intent's (reverse skew —
    # the recency fallback would misread this landed write as
    # unlanded and destroy it).  Start from a clean record history:
    # record NAMES sort by committed_utc_ns, so the skewed record
    # must be the only one for last-wins folding to surface it.
    for n in os.listdir(man.records_dir):
        if n.endswith(".json"):
            os.remove(os.path.join(man.records_dir, n))
    os.makedirs(stage_dir)
    open(os.path.join(stage_dir, "part-new2.parquet"), "w").close()
    open(os.path.join(stage_dir, "_SUCCESS"), "w").close()
    name2 = man.write_intent("links", [], fp, kind="overwrite")
    _write_record(
        man, "links", 1,
        source_fp=fp,
        intent_file=name2,
        committed_utc_ns=1,  # "older" than the intent by clock
    )
    res = man.reconcile_intents()
    assert res["links"] == "committed"
    assert os.path.exists(os.path.join(stage_dir, "part-new2.parquet"))


def test_empty_committed_stage_survives_prewrite_crash(tmp_path):
    """A legitimately committed ZERO-part-file stage (an empty
    0-partition result writes only _SUCCESS) whose overwrite crashed
    BEFORE the write began must reconcile as intact — pre == cur ==
    [] with the marker and record present proves the old state is
    byte-for-byte untouched; deleting it would force a recompute for
    a crash that touched nothing."""
    man = Manifest(str(tmp_path / "kg"), spark=None)
    stage_dir = man.stage_path("links")
    os.makedirs(stage_dir)
    open(os.path.join(stage_dir, "_SUCCESS"), "w").close()
    _write_record(man, "links", 0, source_fp={"gazetteer": {"rows": 1}})
    # refresh intent written, then killed before the write started
    man.write_intent("links", [], {"gazetteer": {"rows": 2}},
                     kind="overwrite")
    res = man.reconcile_intents()
    assert res["links"] == "intact"
    assert os.path.exists(os.path.join(stage_dir, "_SUCCESS"))
    assert man.intents() == []


def test_user_snapshot_like_stage_is_no_fold_proof(tmp_path, monkeypatch):
    """The vanish-skip proof must match the COMPACTOR's exact record
    name shape (``rec-<20d>-<6d>-<7d>-snapshot.json``), not any name
    that merely ends ``-snapshot.json``: a user stage named
    'db-snapshot' produces such a name, and treating it as fold-proof
    would silently DROP a vanished record (stage reported
    uncommitted → spurious recompute) instead of retrying.  The stage
    name 'snapshot' itself — the one name the regex cannot tell apart
    — is rejected at commit() time."""
    import pytest

    from webstruct_spark.plans.manifest import _VanishedRecordError

    man = Manifest(str(tmp_path / "kg"), spark=None)
    victim = _write_record(man, "aa_victim", 0)
    time.sleep(0.001)
    _write_record(man, "db-snapshot", 1)  # sorts after the victim

    real_read = fsio.read_text
    real_exists = fsio.exists

    # the victim stays LISTED (the compactor's delete loop runs one
    # step ahead of the reader every pass) but reads as vanished
    def vanishing_read(spark, path):
        if os.path.basename(path) == victim:
            raise FileNotFoundError(path)
        return real_read(spark, path)

    def vanished_exists(spark, path):
        if os.path.basename(path) == victim:
            return False
        return real_exists(spark, path)

    import webstruct_spark.plans.manifest as manifest_mod

    monkeypatch.setattr(manifest_mod.fsio, "read_text", vanishing_read)
    monkeypatch.setattr(manifest_mod.fsio, "exists", vanished_exists)
    # the user record is NOT proof the victim was folded — records()
    # must exhaust its retries and surface the vanish, not skip it
    with pytest.raises(_VanishedRecordError):
        man.records()

    # a compactor snapshot whose seq field OVERFLOWED its %06d pad
    # (long-lived driver) must still count as fold-proof — the regex
    # widths are minimums, or the compactor's own snapshot would stop
    # absorbing its delete loop
    snap = dict(
        type="snapshot",
        records=[dict(stage="aa_victim", rows_out=0)],
        committed_utc_ns=time.time_ns(),
    )
    fsio.write_text_atomic(
        None,
        fsio.join(
            man.records_dir,
            "rec-99999999999999999999-8888888-0000001-snapshot.json",
        ),
        json.dumps(snap),
    )
    got = {r["stage"] for r in man.records()}
    assert "aa_victim" in got and "db-snapshot" in got

    # and the truly ambiguous stage name is refused outright — at
    # BOTH file-naming entries, before any work runs on its behalf
    monkeypatch.setattr(manifest_mod.fsio, "read_text", real_read)
    monkeypatch.setattr(manifest_mod.fsio, "exists", real_exists)
    with pytest.raises(ValueError, match="reserved"):
        man.commit("snapshot", wall_sec=0.0)
    with pytest.raises(ValueError, match="reserved"):
        man.write_intent("snapshot", [], None)
