# -*- coding: utf-8 -*-
"""ANN index small-file compaction: every append_to_ann_index adds
part files to the touched bucket partition dirs, so a week of drops
fragments the hot buckets; compact_ann_index rewrites them
row-verified and swap-protocol crash-safe, and probes are identical
before/during-crash-repair/after."""
import shutil

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import arm_fs_tripwire
from webstruct_spark.operators.similarity import (
    ann_index_topk,
    append_to_ann_index,
    compact_ann_index,
    write_ann_index,
)


def _embeddings(spark, n=400, dim=16):
    rng = np.random.RandomState(3)
    rows = [
        (int(i), [float(x) for x in rng.randn(dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _queries(emb, every=37):
    rows = emb.where(F.col("vec_id") % every == 0).collect()
    return [(int(r["vec_id"]), list(r["embedding"])) for r in rows]


def _as_set(df):
    return {
        (r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
        for r in df.collect()
    }


def _fragmented_index(spark, tmp_path, kind="lsh", name="idx"):
    """Build over a third of the corpus, then two appended batches —
    the bucket dirs end up holding several part-file generations."""
    emb = _embeddings(spark)
    path = str(tmp_path / name)
    kw = {"n_planes": 6} if kind == "lsh" else {"n_centroids": 8}
    write_ann_index(emb.where(F.col("vec_id") < 150), path, kind=kind, **kw)
    append_to_ann_index(
        emb.where((F.col("vec_id") >= 150) & (F.col("vec_id") < 300)), path
    )
    append_to_ann_index(emb.where(F.col("vec_id") >= 300), path)
    return emb, path


def test_compact_reduces_files_probe_identical(spark, tmp_path):
    emb, path = _fragmented_index(spark, tmp_path)
    qs = _queries(emb)
    before = _as_set(ann_index_topk(spark, path, qs, k=5, multiprobe=1))
    out = compact_ann_index(spark, path)
    assert out["buckets_compacted"] > 0
    assert out["n_files_after"] < out["n_files_before"]
    assert out["repaired"] == []
    # every rewritten bucket was footer-verified row-exact
    assert out["rows_verified"] > 0
    after = _as_set(ann_index_topk(spark, path, qs, k=5, multiprobe=1))
    assert after == before
    # idempotent: a second scheduled compact is a pure-listing no-op
    again = compact_ann_index(spark, path)
    assert again["buckets_compacted"] == 0
    assert again["n_files_after"] == out["n_files_after"]


def test_compact_ivf_sidecars_untouched(spark, tmp_path):
    emb, path = _fragmented_index(spark, tmp_path, kind="ivf", name="ivf")
    qs = _queries(emb)
    before = _as_set(ann_index_topk(spark, path, qs, k=5, n_probe=3))
    sidecars = {
        d: sorted((tmp_path / "ivf" / d).rglob("*"))
        for d in ("_ann_meta.parquet", "_ann_centroids.parquet")
    }
    out = compact_ann_index(spark, path)
    assert out["buckets_compacted"] > 0
    for d, listing in sidecars.items():
        assert sorted((tmp_path / "ivf" / d).rglob("*")) == listing
    after = _as_set(ann_index_topk(spark, path, qs, k=5, n_probe=3))
    assert after == before


def test_compact_repairs_crash_windows(spark, tmp_path):
    """All three swap-protocol crash shapes are repaired on the next
    compact entry, and the repaired index probes identically to the
    never-crashed one."""
    emb, path = _fragmented_index(spark, tmp_path, name="crash")
    qs = _queries(emb)
    want = _as_set(ann_index_topk(spark, path, qs, k=5, multiprobe=1))
    root = tmp_path / "crash"
    buckets = sorted(
        d.name for d in root.iterdir() if d.name.startswith("bucket=")
    )
    assert len(buckets) >= 3
    b0, b1, b2 = (b[len("bucket="):] for b in buckets[:3])

    # window 1 — crash BEFORE the swap began: tmp + intact live
    shutil.copytree(root / ("bucket=" + b0), root / ("_compact_tmp_b" + b0))
    # window 2 — crash BETWEEN the two renames: old + verified tmp,
    # live absent (tmp here = the verified rewrite = same rows)
    shutil.copytree(root / ("bucket=" + b1), root / ("_compact_tmp_b" + b1))
    (root / ("bucket=" + b1)).rename(root / ("_compact_old_b" + b1))
    # window 3 — crash AFTER the swap, before the old delete
    shutil.copytree(root / ("bucket=" + b2), root / ("_compact_old_b" + b2))

    out = compact_ann_index(spark, path)
    fixed = set(out["repaired"])
    assert {"bucket=" + b0, "bucket=" + b1, "bucket=" + b2} <= fixed
    leftovers = [
        d.name for d in root.iterdir() if d.name.startswith("_compact_")
    ]
    assert leftovers == []
    got = _as_set(ann_index_topk(spark, path, qs, k=5, multiprobe=1))
    assert got == want


def test_crashed_tmp_invisible_to_probes(spark, tmp_path):
    """The underscore-prefixed tmp/old names are ignored by Spark's
    partition discovery, so an index with a crashed compact lying
    around STILL probes correctly before any repair runs."""
    emb, path = _fragmented_index(spark, tmp_path, name="dirty")
    qs = _queries(emb)
    want = _as_set(ann_index_topk(spark, path, qs, k=5, multiprobe=1))
    root = tmp_path / "dirty"
    b = sorted(
        d.name for d in root.iterdir() if d.name.startswith("bucket=")
    )[0][len("bucket="):]
    shutil.copytree(root / ("bucket=" + b), root / ("_compact_tmp_b" + b))
    got = _as_set(ann_index_topk(spark, path, qs, k=5, multiprobe=1))
    assert got == want


def test_threeway_crash_shape_refused_nothing_deleted(spark, tmp_path):
    """tmp + live + old all present is NOT a protocol crash shape (it
    means something recreated the live dir after a between-renames
    crash, so the live dir may hold rows the tmp/old copies lack):
    repair must refuse with all three dirs intact — the pre-fix code
    silently deleted the verified tmp AND the pre-crash old copy,
    permanently losing every pre-crash vector of the bucket."""
    import pytest

    emb, path = _fragmented_index(spark, tmp_path, name="threeway")
    root = tmp_path / "threeway"
    b = sorted(
        d.name for d in root.iterdir() if d.name.startswith("bucket=")
    )[0][len("bucket="):]
    shutil.copytree(root / ("bucket=" + b), root / ("_compact_tmp_b" + b))
    shutil.copytree(root / ("bucket=" + b), root / ("_compact_old_b" + b))
    with pytest.raises(RuntimeError, match="tmp, live AND old"):
        compact_ann_index(spark, path)
    for prefix in ("bucket=", "_compact_tmp_b", "_compact_old_b"):
        assert (root / (prefix + b)).exists()
    # append refuses the same way instead of writing into the mess
    with pytest.raises(RuntimeError, match="tmp, live AND old"):
        append_to_ann_index(emb.where(F.col("vec_id") < 3), path)


def test_append_repairs_crashed_compact_first(spark, tmp_path):
    """A scheduled append landing after a between-renames compact
    crash rolls the verified swap FORWARD before writing (otherwise
    it would recreate the live dir with only its own batch — the
    exact sequence that manufactures the unrepairable three-way
    shape).  The repaired-and-appended index probes identically to a
    never-crashed twin with the same build+append history."""
    emb = _embeddings(spark, n=450)
    base = emb.where(F.col("vec_id") < 400)
    extra = emb.where(F.col("vec_id") >= 400)
    paths = {}
    for name in ("crashed", "twin"):
        p = str(tmp_path / name)
        write_ann_index(base.where(F.col("vec_id") < 150), p,
                        kind="lsh", n_planes=6)
        append_to_ann_index(
            base.where((F.col("vec_id") >= 150) & (F.col("vec_id") < 300)),
            p,
        )
        append_to_ann_index(base.where(F.col("vec_id") >= 300), p)
        paths[name] = p
    root = tmp_path / "crashed"
    b = sorted(
        d.name for d in root.iterdir() if d.name.startswith("bucket=")
    )[0][len("bucket="):]
    # between-renames shape: verified tmp (same rows) + old, live gone
    shutil.copytree(root / ("bucket=" + b), root / ("_compact_tmp_b" + b))
    (root / ("bucket=" + b)).rename(root / ("_compact_old_b" + b))

    append_to_ann_index(extra, paths["crashed"])
    append_to_ann_index(extra, paths["twin"])

    leftovers = [
        d.name for d in root.iterdir() if d.name.startswith("_compact_")
    ]
    assert leftovers == []
    qs = _queries(emb)
    got = _as_set(ann_index_topk(spark, paths["crashed"], qs, k=5,
                                 multiprobe=1))
    want = _as_set(ann_index_topk(spark, paths["twin"], qs, k=5,
                                  multiprobe=1))
    assert got == want


def test_append_intent_reverts_crashed_half_batch(spark, tmp_path,
                                                  monkeypatch):
    """A driver kill during an append's job commit can leave a
    VISIBLE SUBSET of the batch (some buckets gained part files,
    others did not) with the write-ahead intent still pending.  The
    next maintenance entry must revert exactly the strays, so the
    upstream retry lands the whole batch once — probe-identical to a
    never-crashed twin."""
    import pytest

    from webstruct_spark.plans import fsio

    emb = _embeddings(spark)
    base = emb.where(F.col("vec_id") < 300)
    batch = emb.where(F.col("vec_id") >= 300)
    path = str(tmp_path / "idx")
    twin = str(tmp_path / "twin")
    write_ann_index(base, path, kind="lsh", n_planes=6)
    write_ann_index(base, twin, kind="lsh", n_planes=6)

    # crash between the batch landing and the intent clear
    real_delete = fsio.delete

    def crashing_delete(s, p, recursive=True):
        if p.endswith("_ann_append_intent.json"):
            raise RuntimeError("simulated crash before intent clear")
        return real_delete(s, p, recursive)

    with monkeypatch.context() as m:
        m.setattr(fsio, "delete", crashing_delete)
        with pytest.raises(RuntimeError, match="simulated crash"):
            append_to_ann_index(batch, path)
    root = tmp_path / "idx"
    assert (root / "_ann_append_intent.json").exists()

    # make the landed batch PARTIAL: drop the strays from one touched
    # bucket (as a mid-commit kill would), keep them in the rest
    import json as _json

    intent = _json.loads((root / "_ann_append_intent.json").read_text())
    touched = sorted(d for d, pre in intent["pre"].items())
    assert touched, "batch touched no buckets?"
    d0 = touched[0]
    pre0 = set(intent["pre"][d0])
    victim_dir = root / d0
    strays0 = [
        f.name
        for f in victim_dir.iterdir()
        if f.name.endswith(".parquet") and f.name not in pre0
    ]
    for n in strays0:
        (victim_dir / n).unlink()

    # the retry (the caller never saw success) reconciles the intent
    # — deleting the remaining strays — then appends the full batch
    append_to_ann_index(batch, path)
    assert not (root / "_ann_append_intent.json").exists()
    append_to_ann_index(batch, twin)

    qs = _queries(emb)
    got = _as_set(ann_index_topk(spark, path, qs, k=5, multiprobe=1))
    want = _as_set(ann_index_topk(spark, twin, qs, k=5, multiprobe=1))
    assert got == want
    # the revert was surgical: no duplicate vec_ids anywhere
    ids = spark.read.parquet(path).groupBy("vec_id").count()
    assert ids.where(F.col("count") > 1).count() == 0


def test_rebuild_over_live_index_is_swap_protected(spark, tmp_path,
                                                   monkeypatch):
    """write_ann_index over a LIVE index must not overwrite in place:
    a crash before the swap leaves the old index serving identical
    answers; a crash between the two swap renames is diagnosed loudly
    by probes and rolled forward by the next maintenance entry."""
    import pytest

    from webstruct_spark.operators.similarity import read_ann_meta
    from webstruct_spark.plans import fsio

    emb = _embeddings(spark)
    base = emb.where(F.col("vec_id") < 200)
    path = str(tmp_path / "idx")
    write_ann_index(base, path, kind="lsh", n_planes=6)
    qs = _queries(emb)
    before = _as_set(ann_index_topk(spark, path, qs, k=5, multiprobe=1))

    # window 1: killed at the FIRST swap rename — the fully built tmp
    # is an orphan, the live index never stopped serving
    real_rename = fsio.rename

    def crash_at_first_rename(s, a, b):
        raise RuntimeError("simulated crash at swap start")

    with monkeypatch.context() as m:
        m.setattr(fsio, "rename", crash_at_first_rename)
        with pytest.raises(RuntimeError, match="swap start"):
            write_ann_index(emb, path, kind="lsh", n_planes=6)
    assert _as_set(
        ann_index_topk(spark, path, qs, k=5, multiprobe=1)
    ) == before

    # window 2: killed BETWEEN the two renames — live absent, old +
    # complete tmp present.  Probes refuse with the rebuild diagnosis
    # instead of a bare missing-path error...
    calls = {"n": 0}

    def crash_between_renames(s, a, b):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash between renames")
        return real_rename(s, a, b)

    with monkeypatch.context() as m:
        m.setattr(fsio, "rename", crash_between_renames)
        with pytest.raises(RuntimeError, match="between renames"):
            write_ann_index(emb, path, kind="lsh", n_planes=6)
    with pytest.raises(RuntimeError, match="rebuild swap crashed"):
        read_ann_meta(spark, path)
    # the skew monitor — the very reader that drives rebuilds — gets
    # the same loud diagnosis, not a bare missing-path error that
    # reads like the index was never built
    from webstruct_spark.operators.similarity import ann_index_cell_skew

    with pytest.raises(RuntimeError, match="rebuild swap crashed"):
        ann_index_cell_skew(spark, path)

    # ...and ANY maintenance entry settles it (an empty append is the
    # cheapest): the complete tmp rolls forward
    append_to_ann_index(emb.where(F.col("vec_id") < 0), path)
    twin = str(tmp_path / "twin")
    write_ann_index(emb, twin, kind="lsh", n_planes=6)
    got = _as_set(ann_index_topk(spark, path, qs, k=5, multiprobe=1))
    want = _as_set(ann_index_topk(spark, twin, qs, k=5, multiprobe=1))
    assert got == want
    root = tmp_path
    leftovers = [
        d.name for d in root.iterdir()
        if "__ann_rebuild" in d.name
    ]
    assert leftovers == []


def test_compact_uri_route(spark, tmp_path, monkeypatch):
    """Build + append + compact + probe over a file: URI with the
    driver-local-FS tripwire armed: the whole maintenance cycle works
    against an index the driver cannot open() (the HDFS/S3 shape)."""
    emb = _embeddings(spark)
    qs = _queries(emb)
    marker = "TRIPWIRE_OUT_DIR"
    path = "file:" + str(tmp_path / ("uri_" + marker) / "idx")
    arm_fs_tripwire(monkeypatch, marker)
    write_ann_index(emb.where(F.col("vec_id") < 300), path, kind="lsh",
                    n_planes=6)
    append_to_ann_index(emb.where(F.col("vec_id") >= 300), path)
    before = _as_set(ann_index_topk(spark, path, qs, k=5, multiprobe=1))
    out = compact_ann_index(spark, path)
    assert out["buckets_compacted"] > 0
    after = _as_set(ann_index_topk(spark, path, qs, k=5, multiprobe=1))
    assert after == before


def test_compact_rejects_nonpositive_target_bytes(tmp_path):
    """0 would divide by zero mid-maintenance and a negative value
    would silently coalesce every bucket to one file; both must be
    refused BEFORE repair touches anything (no SparkSession needed:
    the guard fires first, so spark=None proves the ordering too)."""
    import pytest

    for bad in (0, -1):
        with pytest.raises(ValueError, match="target_bytes"):
            compact_ann_index(None, str(tmp_path / "idx"),
                              target_bytes=bad)


def test_probe_refuses_torn_swap_instead_of_dropping_bucket(
    spark, tmp_path
):
    """A between-renames crash leaves the live bucket dir absent —
    partition discovery would then silently serve results MISSING
    that whole bucket.  The probe's torn-swap guard must fail loudly
    instead, and the next maintenance entry's repair restores the
    exact pre-crash answers."""
    import pytest

    emb, path = _fragmented_index(spark, tmp_path, name="torn")
    qs = _queries(emb)
    want = _as_set(ann_index_topk(spark, path, qs, k=5, multiprobe=1))
    root = tmp_path / "torn"
    b = sorted(
        d.name for d in root.iterdir() if d.name.startswith("bucket=")
    )[0][len("bucket="):]
    # between-renames shape: verified tmp (same rows) + old, live gone
    shutil.copytree(root / ("bucket=" + b), root / ("_compact_tmp_b" + b))
    (root / ("bucket=" + b)).rename(root / ("_compact_old_b" + b))
    with pytest.raises(RuntimeError, match="torn compaction swap"):
        ann_index_topk(spark, path, qs, k=5, multiprobe=1)
    # the skew monitor is a reader too: over the torn index it would
    # compute max/mean with the missing bucket silently absent —
    # if that was the hot bucket the rebuild trigger is suppressed —
    # so it must refuse the same shape
    from webstruct_spark.operators.similarity import ann_index_cell_skew

    with pytest.raises(RuntimeError, match="torn compaction swap"):
        ann_index_cell_skew(spark, path)
    # nothing was deleted by the read-only guard
    assert (root / ("_compact_tmp_b" + b)).exists()
    assert (root / ("_compact_old_b" + b)).exists()
    out = compact_ann_index(spark, path)
    assert ("bucket=" + b) in out["repaired"]
    got = _as_set(ann_index_topk(spark, path, qs, k=5, multiprobe=1))
    assert got == want


def test_rebuild_settles_crashed_append_then_crashed_compact(
    spark, tmp_path, monkeypatch
):
    """A skew-triggered rebuild whose input derives from READING the
    live index (the natural shape: re-bucket the stored vectors with
    a bigger quantizer) must settle pending maintenance state at
    entry, like the other two maintenance entries — otherwise a
    crashed append's uncommitted half-batch is laundered into the
    rebuilt index (the caller's retry then duplicates those ids
    forever), and a bucket mid-compact-swap is silently DROPPED from
    the rebuild (its live dir is absent, so partition discovery never
    sees its rows).  The two crash states cannot COEXIST (every
    serialized maintenance entry settles both before doing work), so
    each window is exercised in sequence against the same index."""
    import pytest

    from webstruct_spark.operators.similarity import rebuild_ann_index
    from webstruct_spark.plans import fsio

    emb = _embeddings(spark)
    base = emb.where(F.col("vec_id") < 300)
    batch = emb.where(F.col("vec_id") >= 300)
    path = str(tmp_path / "idx")
    write_ann_index(base, path, kind="lsh", n_planes=6)
    root = tmp_path / "idx"
    base_ids = {r["vec_id"] for r in base.select("vec_id").collect()}

    # window 1 — crashed APPEND: the batch landed but the intent was
    # never cleared; the caller saw a failure and will retry, so the
    # landed part files are uncommitted strays
    real_delete = fsio.delete

    def crashing_delete(s, p, recursive=True):
        if p.endswith("_ann_append_intent.json"):
            raise RuntimeError("simulated crash before intent clear")
        return real_delete(s, p, recursive)

    with monkeypatch.context() as m:
        m.setattr(fsio, "delete", crashing_delete)
        with pytest.raises(RuntimeError, match="simulated crash"):
            append_to_ann_index(batch, path)
    assert (root / "_ann_append_intent.json").exists()

    rebuild_ann_index(spark, path, n_planes=8)
    rebuilt_ids = {
        r["vec_id"] for r in
        spark.read.parquet(path).select("vec_id").collect()
    }
    # no laundering: the crashed append's uncommitted batch is gone
    # from the rebuilt index, and the intent was reconciled away
    assert rebuilt_ids == base_ids
    assert not (root / "_ann_append_intent.json").exists()

    # window 2 — crashed per-bucket COMPACT on the rebuilt index: one
    # bucket mid-swap (verified tmp + old, live absent)
    b = sorted(
        d.name for d in root.iterdir() if d.name.startswith("bucket=")
    )[0][len("bucket="):]
    shutil.copytree(root / ("bucket=" + b), root / ("_compact_tmp_b" + b))
    (root / ("bucket=" + b)).rename(root / ("_compact_old_b" + b))

    rebuild_ann_index(spark, path)  # same-shape rebalance (meta dims)
    rebuilt_ids = {
        r["vec_id"] for r in
        spark.read.parquet(path).select("vec_id").collect()
    }
    # no dropped bucket: the mid-swap live dir was rolled forward
    # BEFORE the rebuild read its input, so every vector survived
    assert rebuilt_ids == base_ids
    leftovers = [
        d.name for d in root.iterdir() if d.name.startswith("_compact_")
    ]
    assert leftovers == []
    # the twice-rebuilt index answers exactly like a fresh build with
    # the same (deterministic) quantizer
    qs = _queries(base)
    got = _as_set(ann_index_topk(spark, path, qs, k=5, multiprobe=1))
    twin = str(tmp_path / "twin")
    write_ann_index(base, twin, kind="lsh", n_planes=8)
    want = _as_set(ann_index_topk(spark, twin, qs, k=5, multiprobe=1))
    assert got == want


def test_external_rebuild_recovers_refused_compact_shape(
    spark, tmp_path
):
    """The tmp+live+old shape refuses every READING maintenance entry
    (see test_threeway_crash_shape_refused_nothing_deleted) — but the
    operator's documented LAST-RESORT recovery is a full retrain from
    the external source table, and write_ann_index's swap replaces
    the whole live root, refused dirs included.  Blocking THAT entry
    on the same refusal would force manual filesystem surgery on a
    caller whose input never reads the live buckets at all — but
    write_ann_index cannot VERIFY the input is external (the
    hand-rolled index-derived misuse the docstrings warn against
    would lose the refused bucket's only copies), so the bypass is
    the caller's explicit recover=True assertion, and the default
    refusal tells them about it."""
    import pytest

    emb, path = _fragmented_index(spark, tmp_path, name="wholesale")
    root = tmp_path / "wholesale"
    b = sorted(
        d.name for d in root.iterdir() if d.name.startswith("bucket=")
    )[0][len("bucket="):]
    shutil.copytree(root / ("bucket=" + b), root / ("_compact_tmp_b" + b))
    shutil.copytree(root / ("bucket=" + b), root / ("_compact_old_b" + b))

    # the default still refuses (guards hand-rolled index-derived
    # input) and the message points at the recover flag
    with pytest.raises(RuntimeError, match="recover=True"):
        write_ann_index(emb, path, kind="lsh", n_planes=6)
    for prefix in ("bucket=", "_compact_tmp_b", "_compact_old_b"):
        assert (root / (prefix + b)).exists()

    # the asserted-external rebuild proceeds ...
    write_ann_index(emb, path, kind="lsh", n_planes=6, recover=True)
    # ... and the swap removed the refused shape with the old root
    leftovers = [
        d.name for d in root.iterdir() if d.name.startswith("_compact_")
    ]
    assert leftovers == []
    # the recovered index answers exactly like a fresh twin build
    qs = _queries(emb)
    got = _as_set(ann_index_topk(spark, path, qs, k=5, multiprobe=1))
    twin = str(tmp_path / "wholesale_twin")
    write_ann_index(emb, twin, kind="lsh", n_planes=6)
    want = _as_set(ann_index_topk(spark, twin, qs, k=5, multiprobe=1))
    assert got == want


def test_rebuild_refuses_kind_param_mismatch(spark, tmp_path):
    """A quantizer parameter that does not match the RESOLVED kind
    must raise, not be silently dropped: rebuild(..., n_centroids=32)
    on an LSH index is a caller who meant to migrate to IVF but
    forgot kind='ivf' — handing back a same-shape LSH rebuild leaves
    their skew problem in place with no warning."""
    import pytest

    from webstruct_spark.operators.similarity import rebuild_ann_index

    emb = _embeddings(spark, n=120)
    lsh = str(tmp_path / "mm_lsh")
    write_ann_index(emb, lsh, kind="lsh", n_planes=6)
    with pytest.raises(ValueError, match="kind='lsh'.*n_centroids"):
        rebuild_ann_index(spark, lsh, n_centroids=32)
    with pytest.raises(ValueError, match="kind='lsh'.*centroids"):
        rebuild_ann_index(
            spark, lsh, centroids=np.zeros((4, 16), dtype=np.float32)
        )
    ivf = str(tmp_path / "mm_ivf")
    write_ann_index(emb, ivf, kind="ivf", n_centroids=8)
    with pytest.raises(ValueError, match="kind='ivf'.*n_planes"):
        rebuild_ann_index(spark, ivf, n_planes=8)
    # the explicit-migration spellings still work
    meta = rebuild_ann_index(spark, lsh, kind="ivf", n_centroids=4)
    assert meta["kind"] == "ivf" and meta["n_centroids"] == 4


def test_rebuild_runs_each_entry_repair_once(
    spark, tmp_path, monkeypatch
):
    """rebuild_ann_index's preamble already settles every crash
    window; write_ann_index must not repeat the pass (two extra root
    LISTs plus existence RPCs per scheduled rebuild on an object
    store — the same duplicate cost the append path's cached listing
    eliminates)."""
    import webstruct_spark.operators.similarity as sim

    emb = _embeddings(spark, n=120)
    path = str(tmp_path / "once")
    write_ann_index(emb, path, kind="lsh", n_planes=6)

    calls = {"rebuild": 0, "intent": 0, "compact": 0}
    real = (
        sim._repair_ann_rebuild,
        sim._reconcile_ann_append_intent,
        sim._repair_ann_compaction,
    )

    def wrap(key, fn):
        def inner(*a, **kw):
            calls[key] += 1
            return fn(*a, **kw)
        return inner

    monkeypatch.setattr(
        sim, "_repair_ann_rebuild", wrap("rebuild", real[0])
    )
    monkeypatch.setattr(
        sim, "_reconcile_ann_append_intent", wrap("intent", real[1])
    )
    monkeypatch.setattr(
        sim, "_repair_ann_compaction", wrap("compact", real[2])
    )
    sim.rebuild_ann_index(spark, path)
    assert calls == {"rebuild": 1, "intent": 1, "compact": 1}, calls


def test_metaless_root_with_compact_dirs_requires_recover(
    spark, tmp_path
):
    """_compact_* dirs only exist on crashed maintenance of a
    once-live index; if the meta sidecar is then lost, the root reads
    as not-live and the first-build path would mode('overwrite')
    straight over them — deleting an old-without-live dir that may
    hold a bucket's only copies with no refusal at all.  The metaless
    path must demand the same recover=True assertion as the live
    gate."""
    import pytest

    emb = _embeddings(spark, n=80)
    path = str(tmp_path / "metaless")
    root = tmp_path / "metaless"
    write_ann_index(emb, path, kind="lsh", n_planes=4)
    b = sorted(
        d.name for d in root.iterdir() if d.name.startswith("bucket=")
    )[0][len("bucket="):]
    # crashed compact leftover, then the meta sidecar is lost
    (root / ("bucket=" + b)).rename(root / ("_compact_old_b" + b))
    shutil.rmtree(root / "_ann_meta.parquet")

    with pytest.raises(RuntimeError, match="recover=True"):
        write_ann_index(emb, path, kind="lsh", n_planes=4)
    assert (root / ("_compact_old_b" + b)).exists()

    write_ann_index(emb, path, kind="lsh", n_planes=4, recover=True)
    got = {
        r["vec_id"]
        for r in spark.read.parquet(path).select("vec_id").collect()
    }
    assert got == {int(r["vec_id"]) for r in emb.collect()}
    assert not any(
        d.name.startswith("_compact_") for d in root.iterdir()
    )


def test_rebuild_repair_refuses_metaless_live_beside_old(
    spark, tmp_path
):
    """old + live both present with the LIVE dir metaless is not the
    post-swap crash shape (the swap only installs complete,
    meta-bearing builds — meta loss is external damage): finishing
    the swap would delete the old copy, which may be the only
    meta-bearing complete index left, and auto-restoring old would
    silently serve the pre-rebuild index.  Refuse with both copies
    intact and restoration guidance instead."""
    import pytest

    from webstruct_spark.operators.similarity import _repair_ann_rebuild

    emb = _embeddings(spark, n=60, dim=8)
    path = str(tmp_path / "damaged")
    root = tmp_path / "damaged"
    write_ann_index(emb, path, kind="lsh", n_planes=4)
    # fabricate: post-swap crash leftover (old copy), then the live
    # meta sidecar is lost
    shutil.copytree(root, tmp_path / "damaged.__ann_rebuild_old__")
    shutil.rmtree(root / "_ann_meta.parquet")

    with pytest.raises(RuntimeError, match="lost its _ann_meta"):
        _repair_ann_rebuild(spark, path)
    # both copies intact, old's meta untouched
    assert (tmp_path / "damaged.__ann_rebuild_old__"
            / "_ann_meta.parquet").exists()
    assert root.exists()
    # the message guides the meta-bearing restoration
    with pytest.raises(RuntimeError, match="still carries its meta"):
        _repair_ann_rebuild(spark, path)

    # the TRUE post-swap crash shape (live meta intact) still
    # finishes the swap
    emb2 = _embeddings(spark, n=60, dim=8)
    p2 = str(tmp_path / "healthy")
    write_ann_index(emb2, p2, kind="lsh", n_planes=4)
    shutil.copytree(tmp_path / "healthy",
                    tmp_path / "healthy.__ann_rebuild_old__")
    assert _repair_ann_rebuild(spark, p2) == "finished_swap"
    assert not (tmp_path / "healthy.__ann_rebuild_old__").exists()
