# -*- coding: utf-8 -*-
"""Similarity search over an embedding column (array<float>).

Two paths:

* :func:`brute_force_topk` — exact cosine top-k.  Distributed as
  two-stage top-k: the (small) query matrix is broadcast, each
  partition computes its LOCAL top-k per query with one numpy matmul
  inside ``mapInPandas`` (Arrow batches), then a single shuffle of
  k·|queries| candidate rows merges to the global top-k with a window.
  The full corpus is never shuffled.
* :func:`lsh_topk` — random-hyperplane LSH bucketing (deterministic
  planes derived from blake2b, no RNG state), probing each query's
  bucket ± multiprobe flips, exact rerank inside candidate buckets.
  Approximate: recall < 1 by design; gauged against brute force in
  tests.

Similarities are computed in float32 numpy (then rounded) in BOTH the
distributed and the single-node gold path, so comparisons are exact.
"""
from __future__ import annotations

import hashlib
import json
import math
import time
from typing import Iterator, List, Set, Tuple

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOPK_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("sim", T.DoubleType()),
    ]
)


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    m = m.astype(np.float32, copy=False)
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def topk_merge(cands: DataFrame, k: int) -> DataFrame:
    """Global top-k per query from candidate rows; deterministic
    tie-break (sim desc, neighbor_id asc)."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"),
                "neighbor_id", F.round("sim", 4).alias("sim"))
    )


def brute_force_topk(
    embeddings: DataFrame,
    queries: List[Tuple[int, List[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k of each query vector against the corpus.

    ``queries``: [(query_id, vector)] — small, broadcast to executors.
    Output: (query_id, rank, neighbor_id, sim[rounded 4dp]).
    """
    spark = embeddings.sparkSession
    q_ids = np.array([q[0] for q in queries], dtype=np.int64)
    q_mat = _normalize_rows(np.array([q[1] for q in queries], dtype=np.float32))
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    src = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
    )

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            corpus = _normalize_rows(np.vstack(pdf["vec"].to_numpy()))
            nids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            # float64 matmul over float32-normalized rows: products are
            # exact, so results are stable across batch shapes
            sims = mat.astype(np.float64) @ corpus.T.astype(np.float64)
            # +1 slot when excluding self: the query's own vector may
            # occupy one local top-k slot
            kk = min(k + (1 if exclude_self else 0), sims.shape[1])
            out_q, out_n, out_s = [], [], []
            for qi in range(sims.shape[0]):
                # deterministic local cut: (sim desc, neighbor_id asc)
                # tie-break — a bare argpartition drops arbitrary
                # members of a tie straddling the kk boundary, which
                # would make results depend on batch shape
                order = np.lexsort((nids, -sims[qi]))[:kk]
                for j in order:
                    if exclude_self and nids[j] == ids[qi]:
                        continue
                    out_q.append(ids[qi])
                    out_n.append(nids[j])
                    out_s.append(float(sims[qi, j]))
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "sim": out_s}
            )

    cands = src.mapInPandas(local_topk, TOPK_SCHEMA)
    return topk_merge(cands, k)


# --------------------------------------------------------------------------
# IVF variant: deterministic k-means coarse quantizer + cell probing


def lloyd_centroids(
    mat: np.ndarray, n_centroids: int, iters: int = 10
) -> np.ndarray:
    """Deterministic Lloyd k-means over an already-normalized f32
    matrix — the single shared kernel of :func:`train_centroids` AND
    the single-node gold twin (sources/docgold.py), so both paths run
    bit-identical math.  Centroid init = evenly spaced rows; empty
    cells re-seed from the farthest point (deterministic argmax)."""
    n = mat.shape[0]
    k = min(n_centroids, n)
    idx = np.linspace(0, n - 1, k).astype(int)
    cent = mat[idx].copy()
    for _ in range(iters):
        sims = mat.astype(np.float64) @ cent.T.astype(np.float64)
        assign = np.argmax(sims, axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                m = members.mean(axis=0)
                norm = np.linalg.norm(m)
                cent[c] = (m / norm if norm else cent[c]).astype(np.float32)
            else:
                # deterministic re-seed: farthest point from its centroid
                d = 1.0 - sims[np.arange(n), assign]
                cent[c] = mat[int(np.argmax(d))]
    return cent


def train_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    sample: int = 2048,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic Lloyd k-means on a fixed sample (the ``sample``
    smallest ids — order-free), driver-side numpy via
    :func:`lloyd_centroids`."""
    rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample)
        .collect()
    )
    mat = _normalize_rows(
        np.array([list(r[vec_col]) for r in rows], dtype=np.float32)
    )
    return lloyd_centroids(mat, n_centroids, iters)


def ivf_topk(
    embeddings: DataFrame,
    queries: List[Tuple[int, List[float]]],
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Approximate cosine top-k via an IVF coarse quantizer: corpus
    vectors are bucketed by nearest centroid; each query probes its
    ``n_probe`` nearest cells and reranks exactly inside them.

    recall/latency dial = (n_centroids, n_probe); recall gauged vs
    brute force in tests."""
    spark = embeddings.sparkSession
    if centroids is None:
        centroids = train_centroids(
            embeddings, n_centroids, id_col=id_col, vec_col=vec_col
        )
    q_ids = np.array([q[0] for q in queries], dtype=np.int64)
    q_mat = _normalize_rows(np.array([q[1] for q in queries], dtype=np.float32))
    q_sims = q_mat.astype(np.float64) @ centroids.T.astype(np.float64)
    n_probe = min(n_probe, centroids.shape[0])
    probe: dict = {}
    for qi in range(len(queries)):
        cells = np.argsort(-q_sims[qi])[:n_probe]
        for c in cells:
            probe.setdefault(int(c), []).append(qi)
    bc = spark.sparkContext.broadcast((q_ids, q_mat, centroids, probe))

    src = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
    )

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat, cent, pr = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            corpus = _normalize_rows(np.vstack(pdf["vec"].to_numpy()))
            nids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            cells = np.argmax(
                corpus.astype(np.float64) @ cent.T.astype(np.float64), axis=1
            )
            out_q, out_n, out_s = [], [], []
            for j in range(corpus.shape[0]):
                qis = pr.get(int(cells[j]))
                if not qis:
                    continue
                sims = mat[qis].astype(np.float64) @ corpus[j].astype(np.float64)
                for t, qi in enumerate(qis):
                    if exclude_self and nids[j] == ids[qi]:
                        continue
                    out_q.append(ids[qi])
                    out_n.append(nids[j])
                    out_s.append(float(sims[t]))
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "sim": out_s}
            )

    cands = src.mapInPandas(local, TOPK_SCHEMA)
    return topk_merge(cands, k)


# --------------------------------------------------------------------------
# Persistent bucket-partitioned index: the 100-TB path.  The in-flight
# lsh_topk/ivf_topk variants above filter executor-side but still SCAN
# the whole corpus; at scale the scan dominates.  write_ann_index
# materializes the embeddings parquet PARTITIONED BY bucket (LSH
# bucket or IVF cell), and ann_index_topk probes with a partition
# filter, so only the probed buckets' files are ever read
# (PartitionFilters in the plan — see PLANS.md).
#
# ALL sidecar I/O (metadata, centroids) goes through Spark readers/
# writers, never a driver-local ``open()`` — the index directory may
# live on HDFS/S3 where the driver has no POSIX view of the path.


def _sidecar(path: str, name: str) -> str:
    """Join a sidecar name onto the index path — delegates to the one
    URI-safe join rule (fsio.join) so the two can never drift."""
    from ..plans import fsio

    return fsio.join(path, name)


def _write_ann_meta(spark: SparkSession, path: str, meta: dict) -> None:
    row = (
        meta["kind"],
        int(meta["n_planes"]) if "n_planes" in meta else None,
        int(meta["n_centroids"]) if "n_centroids" in meta else None,
        int(meta["dim"]),
    )
    (
        # one explicit slice: createDataFrame of a local list would
        # parallelize into defaultParallelism mostly-empty slices —
        # coalesce(1) evaluates them SERIALLY through one task (≈ 5 s
        # of Python-worker round-trips) and repartition(1) pays a
        # shuffle job (~0.5 s); parallelize(row, 1) is one task, no
        # shuffle, no extra job.
        spark.createDataFrame(
            spark.sparkContext.parallelize([row], 1),
            "kind string, n_planes int, n_centroids int, dim int",
        )
        .write.mode("overwrite")
        .parquet(_sidecar(path, "_ann_meta.parquet"))
    )


def read_ann_meta(spark: SparkSession, path: str) -> dict:
    """Read the one-row ``_ann_meta.parquet`` sidecar (via Spark, so
    any Hadoop-visible filesystem works).  A missing sidecar with a
    ``.__ann_rebuild_old__`` sibling present is the one shape a
    READER can see of a rebuild crashed between its two swap renames
    — diagnosed loudly (run any maintenance entry to settle) instead
    of surfacing as a bare missing-path error that reads like the
    index was never built."""
    from ..plans import fsio

    meta_path = _sidecar(path, "_ann_meta.parquet")
    if not fsio.exists(spark, meta_path) and fsio.exists(
        spark, path + _ANN_REBUILD_OLD
    ):
        raise RuntimeError(
            "ann index at %r: rebuild swap crashed between its two "
            "renames (the old index is intact at %r) — run "
            "write_ann_index / append_to_ann_index / "
            "compact_ann_index (their entry repair settles it) "
            "before probing" % (path, path + _ANN_REBUILD_OLD)
        )
    r = spark.read.parquet(meta_path).first()
    meta = {"kind": r["kind"], "dim": int(r["dim"])}
    if r["n_planes"] is not None:
        meta["n_planes"] = int(r["n_planes"])
    if r["n_centroids"] is not None:
        meta["n_centroids"] = int(r["n_centroids"])
    return meta


def _read_centroids(spark: SparkSession, path: str) -> np.ndarray:
    cent_rows = (
        spark.read.parquet(_sidecar(path, "_ann_centroids.parquet"))
        .orderBy("cell")
        .collect()
    )
    return np.array(
        [list(r["centroid"]) for r in cent_rows], dtype=np.float32
    )


def _bucketized(
    embeddings: DataFrame,
    kind: str,
    state: np.ndarray,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(vec_id, vec, bucket) rows: each vector tagged with its LSH
    bucket / IVF cell under the given frozen state — the single
    bucketing kernel shared by build and append."""
    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast((kind, state))

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        knd, st = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = _normalize_rows(np.vstack(pdf["vec"].to_numpy()))
            if mat.shape[1] != st.shape[1]:
                raise ValueError(
                    "embedding dimension %d != index dimension %d"
                    % (mat.shape[1], st.shape[1])
                )
            if knd == "lsh":
                buckets = _bucket_of(mat, st)
            else:
                buckets = np.argmax(
                    mat.astype(np.float64) @ st.T.astype(np.float64), axis=1
                ).astype(np.int64)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "vec": pdf["vec"],
                    "bucket": buckets,
                }
            )

    src = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    )
    out_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("vec", src.schema["vec"].dataType),
            T.StructField("bucket", T.LongType()),
        ]
    )
    return src.mapInPandas(bucketize, out_schema)


# whole-index rebuild swap markers (sibling DIRS of the index path —
# the per-bucket _ANN_TMP/_ANN_OLD markers live INSIDE it)
_ANN_REBUILD_TMP = ".__ann_rebuild_tmp__"
_ANN_REBUILD_OLD = ".__ann_rebuild_old__"


def _build_index_at(
    spark: SparkSession,
    embeddings: DataFrame,
    target: str,
    kind: str,
    state: np.ndarray,
    meta: dict,
    id_col: str,
    vec_col: str,
) -> None:
    """Write the full index layout (bucket-partitioned data +
    centroid sidecar + meta sidecar) at ``target``.  The meta sidecar
    is written LAST on purpose: its presence is the completeness
    marker the rebuild-swap repair trusts (a crash anywhere earlier
    leaves a metaless dir that reads as incomplete)."""
    sc = spark.sparkContext
    n_buckets = int(state.shape[0]) if kind == "ivf" else (
        1 << int(meta["n_planes"])
    )
    # Cluster rows by bucket BEFORE the partitioned write, into an
    # EXPLICIT task count.  Without this, each write task opens one
    # file per distinct bucket it holds — measured at sf0.1: the scan
    # is one partition, so ONE task serially creates all 256 bucket
    # files (~5.6 s of executorRunTime, the whole build cost); an
    # AQE-coalescible keyed repartition collapses right back to that
    # single task (the post-shuffle partitions are tiny), which is why
    # the explicit numPartitions matters — AQE does not coalesce a
    # user-specified count.  The key is (bucket, salt): with
    # n_tasks <= n_buckets the salt is constant (pure bucket hash, one
    # file per bucket); on a big cluster (n_tasks >> n_buckets) the
    # deterministic vec_id salt splits each bucket over ~n_tasks/
    # n_buckets writers so a 100 TB bucket never lands whole in one
    # task (guide §2.5: derive synthetic keys deterministically, never
    # from rand()).
    n_tasks = max(1, sc.defaultParallelism)
    salt_slots = max(1, -(-n_tasks // n_buckets))
    (
        _bucketized(embeddings, kind, state, id_col, vec_col)
        .repartition(
            n_tasks,
            F.col("bucket"),
            F.pmod(F.xxhash64("vec_id"), F.lit(salt_slots)),
        )
        .write.mode("overwrite")
        # static overwrite pinned: under a cluster-wide
        # partitionOverwriteMode=dynamic, overwrite would keep stale
        # bucket=N dirs (and crashed-compact leftovers) that are
        # absent from the new data — the recover path's deletion
        # guarantee depends on static semantics
        .option("partitionOverwriteMode", "static")
        .partitionBy("bucket")
        .parquet(target)
    )
    if kind == "ivf":
        cent_rows = [
            (int(i), [float(x) for x in row])
            for i, row in enumerate(state)
        ]
        # one explicit slice, no shuffle — see _write_ann_meta
        spark.createDataFrame(
            spark.sparkContext.parallelize(cent_rows, 1),
            "cell int, centroid array<float>",
        ).write.mode("overwrite").parquet(
            _sidecar(target, "_ann_centroids.parquet")
        )
    _write_ann_meta(spark, target, meta)


def _repair_ann_rebuild(spark: SparkSession, path: str) -> str:
    """Settle a crashed whole-index rebuild swap (see
    :func:`write_ann_index`'s live-rebuild path).  Windows, in
    protocol order: rebuild-tmp alone → pre-swap orphan, drop it;
    old present + live ABSENT → between the two renames — roll
    FORWARD when the tmp is complete (meta sidecar present — written
    last), else roll BACK to the old index; old + live both present →
    post-swap crash, finish the old delete.  Called at every
    maintenance entry (append / compact / rebuild); read-only probes
    instead get a loud diagnosis from :func:`read_ann_meta`.  Returns
    the repair state ("clean" when nothing was pending)."""
    from ..plans import fsio

    tmp = path + _ANN_REBUILD_TMP
    old = path + _ANN_REBUILD_OLD
    if fsio.exists(spark, old):
        if fsio.exists(spark, path):
            if not fsio.exists(spark, _sidecar(path, "_ann_meta.parquet")):
                # NOT the post-swap crash shape: the swap only ever
                # renames a complete (meta-bearing, meta written
                # last) tmp to the live name, so a metaless live dir
                # beside an old copy means the live meta was LOST
                # after the swap — external damage, not a protocol
                # window.  Finishing the swap here would delete what
                # may be the only meta-bearing complete copy, and
                # auto-restoring the old copy would silently serve
                # the PRE-rebuild index (the metaless live dir is
                # the newer build); refuse with both intact, like
                # every other non-protocol shape
                old_has_meta = fsio.exists(
                    spark, _sidecar(old, "_ann_meta.parquet")
                )
                raise RuntimeError(
                    "ann rebuild repair: live index %r lost its "
                    "_ann_meta.parquet sidecar while a %s copy "
                    "exists — not a crash shape the swap protocol "
                    "can produce (the swap only installs complete, "
                    "meta-bearing builds), so refusing to delete "
                    "either copy.  %s  Or retrain from the external "
                    "source: write_ann_index(..., recover=True) "
                    "after removing the old copy by hand"
                    % (
                        path, _ANN_REBUILD_OLD,
                        (
                            "The old copy still carries its meta: "
                            "restore the PRE-rebuild index by "
                            "deleting the metaless live dir and "
                            "renaming the old copy to the live name "
                            "(accepting that the crashed rebuild's "
                            "newer input is discarded)."
                            if old_has_meta else
                            "The old copy lacks its meta too — "
                            "neither is complete; salvage by hand."
                        ),
                    )
                )
            fsio.delete(spark, tmp)
            fsio.delete(spark, old)
            return "finished_swap"
        if fsio.exists(spark, _sidecar(tmp, "_ann_meta.parquet")):
            fsio.rename(spark, tmp, path)
            fsio.delete(spark, old)
            return "rolled_forward"
        fsio.delete(spark, tmp)
        fsio.rename(spark, old, path)
        return "rolled_back"
    if fsio.exists(spark, tmp):
        fsio.delete(spark, tmp)
        return "dropped_tmp"
    return "clean"


def write_ann_index(
    embeddings: DataFrame,
    path: str,
    kind: str = "lsh",
    n_planes: int = 8,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    recover: bool = False,
    _prerepaired: bool = False,
) -> dict:
    """Materialize a bucket-partitioned ANN index at ``path``.

    ``kind='lsh'``: deterministic hyperplane buckets (reproducible
    from n_planes+dim, no stored state).  ``kind='ivf'``: k-means
    cells; centroids are stored beside the data as
    ``_ann_centroids.parquet`` (underscore-prefixed → invisible to
    parquet discovery); pass ``centroids=`` to build with a FROZEN
    pre-trained quantizer instead of training one (the rebuild path
    of the append policy — see :func:`append_to_ann_index`).  Returns
    the metadata dict (also written as a one-row
    ``_ann_meta.parquet`` sidecar through Spark, so the index works
    on any Hadoop-visible filesystem — the driver never needs a POSIX
    view of ``path``).

    Rebuilding OVER a live index (the append policy's skew-triggered
    retrain) does NOT overwrite in place — ``mode('overwrite')``
    deletes the live index at write start, so a crash anywhere in a
    100 TB-scale rebuild would leave probes with nothing to serve and
    nothing to roll back to, for as long as the redo takes.  Instead
    the new index is built at a ``.__ann_rebuild_tmp__`` sibling
    (meta sidecar written last = completeness marker) and swapped in
    with the same two-rename protocol as compaction; the old index
    keeps serving probes for the whole build, and every crash window
    is settled by :func:`_repair_ann_rebuild` at the next
    maintenance entry (probes mid-swap get a loud diagnosis from
    :func:`read_ann_meta` instead of a bare missing-path error).

    ``recover=True`` asserts that ``embeddings`` is an external
    source (reads nothing from the live index) and lets the rebuild
    proceed over a crashed-compact shape the entry repair refuses to
    untangle — the swap replaces the whole index root, refused dirs
    included, so a full retrain from source is the wholesale recovery
    from those shapes.  Never pass it with index-derived input: its
    file listing is missing the refused bucket's rows (parquet
    discovery skips the ``_``-prefixed dirs holding their only copy)
    and the swap would delete them permanently.  On a METALESS root
    still holding ``_compact_*`` dirs (a once-live index whose meta
    sidecar was lost) the same assertion is required, but the
    recovery there is a direct ``mode('overwrite')`` build, NOT the
    two-rename swap — there is no complete old index to keep serving,
    so a crash mid-recovery leaves only the partial new build."""
    from ..plans import fsio

    spark = embeddings.sparkSession
    if not _prerepaired:
        _repair_ann_rebuild(spark, path)
    live = fsio.exists(spark, _sidecar(path, "_ann_meta.parquet"))
    if live and not _prerepaired:
        # settle a crashed APPEND and a crashed per-bucket COMPACT so
        # the old index serves clean probes for the whole tmp build
        # (an index-derived rebuild must go through
        # :func:`rebuild_ann_index`, whose preamble repairs BEFORE the
        # caller's DataFrame captures its file listing and which then
        # passes ``_prerepaired=True`` to skip this duplicate pass).
        # One root LIST each when there is nothing to repair.  A
        # compact shape the repair refuses to untangle raises by
        # default — write_ann_index cannot verify that `embeddings`
        # is external, and for the hand-rolled index-derived misuse
        # the docstrings warn against (its parquet discovery skips
        # the _-prefixed dirs holding the bucket's only copy) the
        # swap below would make the loss permanent.  ``recover=True``
        # is the caller's assertion that the input IS external, and
        # downgrades the refusal to leave-in-place: the swap replaces
        # the whole live root, refused dirs included, so the full
        # retrain stays the documented wholesale recovery.
        _reconcile_ann_append_intent(spark, path)
        if recover:
            _repair_ann_compaction(spark, path, on_unrepairable="keep")
        else:
            try:
                _repair_ann_compaction(spark, path)
            except RuntimeError as exc:
                raise RuntimeError(
                    "live index at %r holds a crashed-compact shape "
                    "the entry repair refuses to untangle (chained "
                    "below).  If `embeddings` is an EXTERNAL source "
                    "— it does not read the live index — re-run with "
                    "recover=True: the rebuild swap replaces the "
                    "whole index root, refused shapes included.  If "
                    "it derives from reading the index, do NOT: its "
                    "file listing is missing the refused bucket's "
                    "rows, and the swap would delete their only "
                    "copies — see the chained refusal's diagnosis "
                    "(the three-way shape includes its manual "
                    "recovery order; the not-a-protocol-shape "
                    "refusals need the stray dirs inspected and "
                    "salvaged by hand)" % path
                ) from exc
    elif not live and not recover:
        # metaless root: nothing servable to protect UNLESS it still
        # holds _compact_* dirs — those only exist on crashed
        # maintenance of a once-live index (the meta sidecar was
        # lost, not never written), an old-without-live dir may hold
        # a bucket's only copies, and the direct mode('overwrite')
        # build below deletes them without the swap the live gate
        # protects.  Same recover=True assertion required, checked
        # HERE — one dir LIST, before any Spark job (first()/k-means)
        # runs on a doomed build's behalf
        leftovers = sorted(
            n for n, _sz in (fsio.listdir_if_exists(spark, path) or [])
            if n.startswith(_ANN_TMP) or n.startswith(_ANN_OLD)
        )
        if leftovers:
            raise RuntimeError(
                "metaless index root %r still holds crashed-"
                "compact dirs %s — the meta sidecar of a live "
                "index was lost, and an old-without-live dir may "
                "hold a bucket's only copies, which this build's "
                "overwrite would delete.  Re-run with "
                "recover=True if `embeddings` is a complete "
                "external source; otherwise salvage the _compact_"
                "* dirs first" % (path, leftovers)
            )
    first = embeddings.select(vec_col).first()
    if first is None:
        raise ValueError("cannot build an ANN index over an empty table")
    dim = len(first[vec_col])
    if kind == "lsh":
        state = _planes(n_planes, dim)
        meta = {"kind": "lsh", "n_planes": n_planes, "dim": dim}
    elif kind == "ivf":
        if centroids is None:
            centroids = train_centroids(
                embeddings, n_centroids, id_col=id_col, vec_col=vec_col
            )
        state = np.asarray(centroids, dtype=np.float32)
        meta = {"kind": "ivf", "n_centroids": int(state.shape[0]),
                "dim": dim}
    else:
        raise ValueError("kind must be 'lsh' or 'ivf'")
    if not live:
        # first build (or a metaless root already vetted by the
        # entry gate above): write directly — NOTE this path is a
        # plain mode('overwrite'), not the two-rename swap, so with
        # recover=True on a damaged metaless root a crash mid-build
        # leaves only the partial new build (there was no complete
        # old index to keep serving anyway)
        _build_index_at(spark, embeddings, path, kind, state, meta,
                        id_col, vec_col)
        return meta
    tmp = path + _ANN_REBUILD_TMP
    old = path + _ANN_REBUILD_OLD
    _build_index_at(spark, embeddings, tmp, kind, state, meta,
                    id_col, vec_col)
    fsio.rename(spark, path, old)
    fsio.rename(spark, tmp, path)
    fsio.delete(spark, old)
    return meta


def rebuild_ann_index(
    spark: SparkSession,
    path: str,
    kind: str | None = None,
    n_planes: int | None = None,
    n_centroids: int | None = None,
    centroids: np.ndarray | None = None,
) -> dict:
    """Retrain a live index FROM ITS OWN stored vectors — the
    skew-trigger's natural shape (:func:`ann_index_cell_skew` crossed
    the threshold; re-bucket with a fresh or bigger quantizer).

    Hand-rolling ``write_ann_index(spark.read.parquet(path), path)``
    is unsafe for one subtle reason: Spark captures the file listing
    when the CALLER constructs the DataFrame, BEFORE
    :func:`write_ann_index`'s entry repairs settle pending
    maintenance state — a crashed append's strays then fail the
    build scan loudly mid-swap (FILE_NOT_EXIST after the repair
    deletes them), and a bucket mid-compact-swap is silently MISSING
    from the stale listing (its restored live dir was never listed),
    so the rebuilt index drops the whole bucket.  This helper settles
    every window FIRST and only then reads, so the rebuild input is
    exactly the committed index.

    Defaults (``kind``/``n_planes``/``n_centroids`` = None) re-use
    the live meta's values — a same-shape rebalance; override to grow
    the quantizer.  ``centroids`` passes a frozen pre-trained IVF
    quantizer through (else one is retrained on the current vectors —
    the drift policy's retrain step)."""
    _repair_ann_rebuild(spark, path)
    meta = read_ann_meta(spark, path)
    _reconcile_ann_append_intent(spark, path)
    _repair_ann_compaction(spark, path)
    kind_src = (
        "explicit kind= argument" if kind else "stored meta"
    )
    kind = kind or meta["kind"]
    # cross-check quantizer params against the RESOLVED kind before
    # anything runs: silently dropping a mismatched one (n_centroids=
    # on what resolves to an LSH rebuild — the caller who meant to
    # migrate to IVF but forgot kind='ivf') would hand back a
    # same-shape rebuild with no warning and leave their skew problem
    # in place
    if kind == "lsh" and (
        n_centroids is not None or centroids is not None
    ):
        raise ValueError(
            "rebuild of %r resolves to kind='lsh' (from %s) but "
            "got IVF parameter(s) %s — pass kind='ivf' to migrate the "
            "index, or drop them" % (
                path, kind_src,
                ", ".join(
                    p for p, v in (
                        ("n_centroids", n_centroids),
                        ("centroids", centroids),
                    ) if v is not None
                ),
            )
        )
    if kind == "ivf" and n_planes is not None:
        raise ValueError(
            "rebuild of %r resolves to kind='ivf' (from %s) but "
            "got LSH parameter n_planes — pass kind='lsh' to migrate "
            "the index, or drop it" % (path, kind_src)
        )
    kw: dict = {"kind": kind, "id_col": "vec_id", "vec_col": "vec"}
    if kind == "lsh":
        kw["n_planes"] = (
            n_planes if n_planes is not None
            else meta.get("n_planes", 8)
        )
    else:
        kw["n_centroids"] = (
            n_centroids if n_centroids is not None
            else meta.get("n_centroids", 16)
        )
        kw["centroids"] = centroids
    # listing captured HERE — strictly after the repairs above; the
    # scan itself executes inside write_ann_index's tmp build, before
    # the two swap renames touch the live dir.  _prerepaired: this
    # preamble already ran the full repair set, so write_ann_index
    # skips its duplicate pass (two root LISTs + existence RPCs per
    # scheduled rebuild on an object store) — safe under the
    # serialized-maintenance contract: nothing between here and the
    # swap mutates the index root
    stored = spark.read.parquet(path).select("vec_id", "vec")
    return write_ann_index(stored, path, _prerepaired=True, **kw)


def append_to_ann_index(
    new_embeddings: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    skip_existing_ids: bool = False,
) -> dict:
    """Append new vectors to an existing :func:`write_ann_index`
    index WITHOUT rebuilding: bucketize only the new rows under the
    index's FROZEN state (LSH planes re-derived from stored
    n_planes+dim; IVF centroids read from the stored sidecar —
    appends never move centroids) and ``mode('append')`` them into
    the existing bucket partition directories (pure file adds — no
    overwrite, so ``partitionOverwriteMode`` is irrelevant and
    concurrent probes keep reading a consistent index).

    IVF centroid-drift policy: the quantizer stays frozen across
    appends, so cells only ever gain members; if the appended
    distribution drifts, some cells grow hot and probe cost rises —
    recall is unaffected (probes and data use the same frozen
    centroids).  Rebuild trigger: monitor
    :func:`ann_index_cell_skew`; when max/mean cell size exceeds the
    deployment threshold (≈8 is a reasonable default), retrain with
    :func:`rebuild_ann_index` (optionally seeding ``centroids=`` from
    the old quantizer's cells) — NOT with a hand-rolled
    ``write_ann_index(spark.read.parquet(path), path)``, whose file
    listing is captured before the entry repairs run (see
    :func:`rebuild_ann_index`).  Returns the (unchanged) meta dict.

    Crash safety: the multi-bucket append is NOT atomic — a driver
    kill during the job commit can leave a visible SUBSET of the
    batch's part files (some buckets gained files, others did not),
    and "the write either committed or it didn't" would be false.
    Every append therefore writes a tiny write-ahead intent sidecar
    first (``_ann_append_intent.json``: the touched buckets' pre-
    write part-file listings), cleared only after the write lands;
    the next maintenance entry (append / compact / rebuild)
    reconciles a pending intent by deleting exactly the stray files,
    restoring the pre-append state so the caller's retry is clean —
    neither duplicated nor silently half-applied.  A retry after a
    FULLY landed write still duplicates (the intent was cleared);
    pass ``skip_existing_ids=True`` to anti-join the new batch
    against the index's current ids first — exact, but costs a full
    id-column scan of the index, so it is opt-in rather than the
    default at 100 TB.  Probes never refuse on a pending intent (a
    partial batch adds uncommitted extras, it never loses committed
    vectors), matching the KG side's read-vs-repair split."""
    from ..plans import fsio

    spark = new_embeddings.sparkSession
    # settle a crashed whole-index rebuild first (live dir may be one
    # rename away), then read the meta the repair may have restored
    _repair_ann_rebuild(spark, path)
    meta = read_ann_meta(spark, path)
    # settle a prior crashed APPEND (delete its stray part files so
    # this run starts from disk == committed), then any crashed-
    # compact leftovers: appending into a bucket whose live dir is
    # mid-swap (tmp+old present, live absent) would recreate the live
    # dir with only the new batch — the one shape
    # _repair_ann_compaction refuses to untangle.  One dir listing
    # each when there is nothing to repair.
    _reconcile_ann_append_intent(spark, path)
    # keep the repair's post-repair root name set: it stays current
    # until our own intent write (maintenance entries are serialized
    # by contract and nothing below mutates the root), so the
    # pre-write bucket listings reuse it instead of paying a second
    # root LIST per scheduled append
    _, root_names = _repair_ann_compaction(spark, path)
    # fail-fast dim check on the first non-null vector; ragged or
    # null vectors deeper in the batch are caught executor-side by
    # _bucketized's per-batch dimension guard with the same message
    first = (
        new_embeddings.where(F.col(vec_col).isNotNull())
        .select(vec_col)
        .first()
    )
    if first is None:
        return meta  # empty append: nothing to write
    dim = len(first[vec_col])
    if dim != meta["dim"]:
        raise ValueError(
            "append dimension %d != index dimension %d at %s"
            % (dim, meta["dim"], path)
        )
    if skip_existing_ids:
        existing = spark.read.parquet(path).select(
            F.col("vec_id").alias(id_col)
        )
        new_embeddings = new_embeddings.join(
            existing, id_col, "left_anti"
        )
    if meta["kind"] == "lsh":
        state = _planes(meta["n_planes"], meta["dim"])
    else:
        state = _read_centroids(spark, path)
    bucketized = _bucketized(
        new_embeddings, meta["kind"], state, id_col, vec_col
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        # the intent needs the TOUCHED buckets' pre-write listings;
        # persisting the bucketized delta means the bucket-set agg
        # and the write share one bucketize pass over the batch
        touched = sorted(
            r["bucket"]
            for r in bucketized.select("bucket").distinct().collect()
        )
        if not touched:
            return meta  # all rows filtered (skip_existing_ids)
        root = root_names  # post-repair listing, see entry preamble
        pre: dict = {}
        for b in touched:
            dname = "bucket=%d" % b
            if dname in root:
                pre[dname] = sorted(
                    n
                    for n in fsio.listdir_names(
                        spark, _sidecar(path, dname)
                    )
                    if n.endswith(".parquet")
                )
            else:
                pre[dname] = []
        # no-clobber atomic write: a concurrent append (maintenance
        # contract violation) fails HERE, loudly, before any data
        # write — not after interleaving part files
        fsio.write_text_atomic(
            spark, _sidecar(path, _ANN_INTENT),
            json.dumps({"utc_ns": time.time_ns(), "pre": pre}),
        )
        bucketized.write.mode("append").partitionBy("bucket").parquet(
            path
        )
        fsio.delete(spark, _sidecar(path, _ANN_INTENT), recursive=False)
    finally:
        bucketized.unpersist()
    return meta


_ANN_INTENT = "_ann_append_intent.json"


def _reconcile_ann_append_intent(spark: SparkSession, path: str) -> dict:
    """Settle a crashed :func:`append_to_ann_index`: a pending intent
    sidecar means a prior append died between its intent write and
    its clear — the batch may be HALF-visible (some buckets gained
    part files, others did not; Spark's job commit is not atomic
    across partition dirs).  Reverting to the intent's pre-write
    listings restores exactly the committed state, so the upstream
    retry that is coming anyway (the caller never saw success)
    re-appends the whole batch once — exactly-once from the caller's
    perspective, with no index-wide id scan.  Returns
    ``{bucket_dir: n_strays_deleted}``."""
    from ..plans import fsio

    ipath = _sidecar(path, _ANN_INTENT)
    if not fsio.exists(spark, ipath):
        return {}
    it = json.loads(fsio.read_text(spark, ipath))
    reverted: dict = {}
    for dname in sorted(it.get("pre", {})):
        pre_set = set(it["pre"][dname])
        bdir = _sidecar(path, dname)
        listing = fsio.listdir_if_exists(spark, bdir)
        if listing is None:
            continue
        n_strays = 0
        remaining = 0
        for n, _ in listing:
            if not n.endswith(".parquet"):
                continue
            if n in pre_set:
                remaining += 1
            else:
                fsio.delete(spark, fsio.join(bdir, n), recursive=False)
                n_strays += 1
        if not pre_set and not remaining:
            # the crashed append CREATED this bucket dir — drop it so
            # partition discovery never sees an empty phantom bucket
            fsio.delete(spark, bdir)
        if n_strays:
            reverted[dname] = n_strays
    # job-temp leftovers of the crashed write
    fsio.delete(spark, _sidecar(path, "_temporary"))
    fsio.delete(spark, ipath, recursive=False)
    return reverted


def ann_index_cell_skew(spark: SparkSession, path: str) -> float:
    """max/mean bucket size of a persistent index — the rebuild
    trigger of the append policy (one Spark agg over the partition
    column; with partition-column-only scans this reads footers, not
    vectors).  Read-only like the probes, so it shares their
    torn-swap guard: partition discovery over a mid-swap index would
    silently skip the absent live bucket — if that was the hot
    bucket, the reported skew DROPS and the rebuild trigger is
    suppressed, the same silent-miss shape the probe guard exists
    for.  And like the probes it goes through :func:`read_ann_meta`
    first, so a rebuild crashed between its two swap renames is
    diagnosed loudly ("run maintenance to settle") instead of
    surfacing as a bare missing-path error — the skew monitor is
    exactly the reader that runs right after rebuilds."""
    read_ann_meta(spark, path)
    _check_no_torn_swap(spark, path)
    row = (
        spark.read.parquet(path)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.max("n").alias("mx"),
            F.avg("n").alias("avg"),
        )
        .first()
    )
    return float(row["mx"]) / float(row["avg"])


# -- ANN index small-file compaction ---------------------------------------
# Every append_to_ann_index adds part files to the touched bucket
# partition dirs (mode('append') never rewrites), so a week of
# appended batches turns each hot bucket into dozens of tiny files —
# per-file open/footer cost on every probe and listing pressure on
# the object store, the same pathology plans/compaction.py fixes for
# the KG stages.  The swap protocol and repair below are the SIBLING
# of plans/compaction.py's (see its module docstring): per-bucket
# markers and fingerprint verification here vs per-stage suffix dirs
# and manifest rows_out there — a fix to either state machine almost
# certainly applies to the other; mirror it.  compact_ann_index rewrites fragmented BUCKET dirs
# (never the whole index): each is coalesced shuffle-free into
# ceil(bytes/target) files, footer-verified row-exact, then swapped
# by two renames.  The tmp/old dirs live as underscore-prefixed
# SIBLINGS inside the index root ("_compact_tmp_b<N>") — Spark's
# partition discovery ignores _-prefixed names, so a crashed compact
# never corrupts probes: whenever the live "bucket=N" dir exists it
# is either the old file set or the complete verified new one, and
# the one crash window where it does NOT exist (between the two
# renames) is detected by the probe's torn-swap guard
# (_check_no_torn_swap), which fails loudly instead of silently
# serving results missing that bucket.  The same brief absence also
# exists for a concurrent probe while a compact is RUNNING; run
# compaction in the same maintenance window as appends, as with
# compact_kg.

_ANN_TMP = "_compact_tmp_b"
_ANN_OLD = "_compact_old_b"


def _repair_ann_compaction(
    spark: SparkSession, path: str, on_unrepairable: str = "raise"
) -> Tuple[List[str], Set[str]]:
    """Finish or roll back a crashed compact (called on every
    compact entry).  Windows, per bucket, in protocol order:

    * tmp present, live present, old ABSENT → crashed before the swap
      began: the live dir is untouched; drop the tmp.
    * tmp present, live ABSENT, old present → crashed between the two
      renames: the tmp was row-verified before rename #1, so roll
      FORWARD (rename tmp→live, drop old).
    * tmp absent, live present, old present → crashed before the old
      delete: finish it (drop old).

    tmp, live, AND old all present is NOT a crash shape the protocol
    can produce — it means something recreated the live dir after a
    between-renames crash (an append run outside the maintenance
    window; :func:`append_to_ann_index` itself repairs on entry
    precisely so its own scheduled runs can never manufacture this),
    and that live dir may hold rows the tmp/old copies lack — so it
    raises with all three dirs intact rather than deleting any of
    them.  Likewise live and old both absent (the bucket never
    existed mid-protocol) raises rather than guessing.  Returns
    ``(repaired bucket names, post-repair root name set)``.

    Costs exactly ONE directory listing: live/old existence is
    answered from the listing itself and the set is maintained
    through the repairs (valid because maintenance entries — compact
    and append — are serialized by contract; nothing else creates or
    removes these dirs mid-repair), so on an object store a clean
    entry pays one LIST, not one LIST plus per-dir existence RPCs.
    The returned name set is current under the same serialized-
    maintenance contract, so callers (compact_ann_index) reuse it
    instead of paying a second root LIST per maintenance entry.

    ``on_unrepairable='keep'`` turns both refusals into leave-in-place
    skips (the unrepairable bucket's dirs are not touched and not
    listed as repaired) — ONLY for callers about to replace the whole
    index tree from an EXTERNAL source (:func:`write_ann_index`'s
    live-rebuild swap deletes the old root, refused shapes included),
    where raising would block the wholesale recovery that makes the
    refusal moot.  Every entry whose input or probes READ the live
    buckets must keep the default ``'raise'``."""
    from ..plans import fsio

    names = set(fsio.listdir_names(spark, path))
    repaired: List[str] = []
    kept: Set[str] = set()  # buckets left in place under 'keep'
    for n in sorted(names):
        if n.startswith(_ANN_TMP):
            b = n[len(_ANN_TMP):]
            live_name = "bucket=" + b
            old_name = _ANN_OLD + b
            live = _sidecar(path, live_name)
            old = _sidecar(path, old_name)
            live_exists = live_name in names
            old_exists = old_name in names
            if live_exists and old_exists:
                if on_unrepairable == "keep":
                    # the old dir below must survive too — deleting
                    # it would manufacture the pre-swap tmp+live
                    # shape and a later entry would drop the tmp
                    kept.add(b)
                    continue
                raise RuntimeError(
                    "ann compact repair: %r has tmp, live AND old "
                    "dirs for bucket %s — a between-renames crash "
                    "followed by something recreating the live dir "
                    "(an append outside the maintenance window?); "
                    "the live dir may hold rows the tmp/old copies "
                    "lack, so refusing to delete any of the three — "
                    "recover IN THIS ORDER: merge 'bucket=%s' into "
                    "'%s%s', remove the now-merged 'bucket=%s', "
                    "rename the tmp to the live name, THEN remove "
                    "'%s%s' last.  Every intermediate state of that "
                    "order is one this repair refuses (all three "
                    "present) or completes forward (tmp+old -> roll "
                    "forward; live+old -> drop old); removing the "
                    "old dir any earlier creates the tmp+live-only "
                    "shape this repair reads as a pre-swap crash and "
                    "would delete the merged tmp"
                    % (path, b, b, _ANN_TMP, b, b, _ANN_OLD, b)
                )
            if live_exists:
                fsio.delete(spark, _sidecar(path, n))
                names.discard(n)
            elif old_exists:
                fsio.rename(spark, _sidecar(path, n), live)
                fsio.delete(spark, old)
                names.discard(n)
                names.add(live_name)
                names.discard(old_name)
            else:
                if on_unrepairable == "keep":
                    continue
                raise RuntimeError(
                    "ann compact repair: %r has a tmp dir but neither "
                    "a live nor an old 'bucket=%s' — not a crash shape "
                    "the swap protocol can produce; refusing to guess"
                    % (path, b)
                )
            repaired.append("bucket=" + b)
    # old-only leftovers (post-swap crash): the live dir is already
    # the new file set; just drop the old copy.  `names` was kept
    # current through the loop above, so no re-listing is needed.
    for n in sorted(names):
        if n.startswith(_ANN_OLD):
            b = n[len(_ANN_OLD):]
            if b in kept:
                continue  # part of a shape left intact above
            if ("bucket=" + b) not in names:
                if on_unrepairable == "keep":
                    continue
                raise RuntimeError(
                    "ann compact repair: %r has an old dir for bucket "
                    "%s but no live dir — not a crash shape the swap "
                    "protocol can produce; refusing to guess" % (path, b)
                )
            fsio.delete(spark, _sidecar(path, n))
            names.discard(n)
            if "bucket=" + b not in repaired:
                repaired.append("bucket=" + b)
    return repaired, names


def _check_no_torn_swap(spark: SparkSession, path: str) -> None:
    """Probe-side guard for the one crash window a READER can see:
    between compact's two renames the live ``bucket=N`` dir is absent
    while its tmp/old copy exists — partition discovery then silently
    serves results MISSING that entire bucket (no error) until the
    next maintenance entry repairs it.  Probes are read-only by
    design — a probe that repaired could race a live in-flight
    compact and delete the tmp it had just verified — so they detect
    the torn shape and fail LOUDLY instead, and any maintenance entry
    (:func:`compact_ann_index` / :func:`append_to_ann_index`) rolls
    the swap forward.  tmp or old dirs WITH the live dir present are
    fine: the live file set is intact (pre-swap or post-old-delete
    crash leftovers), so the probe's answer is correct.  Costs one
    directory listing per probe call — a batch top-k over a whole
    query set, not a per-row path."""
    from ..plans import fsio

    names = set(fsio.listdir_names(spark, path))
    for prefix in (_ANN_TMP, _ANN_OLD):
        for n in names:
            if n.startswith(prefix) and (
                "bucket=" + n[len(prefix):]
            ) not in names:
                raise RuntimeError(
                    "ann index at %r: torn compaction swap — %r exists "
                    "but 'bucket=%s' is absent, so a probe would "
                    "silently return results missing that whole "
                    "bucket; run compact_ann_index or "
                    "append_to_ann_index (their entry repair rolls "
                    "the swap forward) before probing"
                    % (path, n, n[len(prefix):])
                )


def compact_ann_index(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    force: bool = False,
) -> dict:
    """Rewrite fragmented bucket partitions of a
    :func:`write_ann_index` index into ~``target_bytes`` files.

    Idempotent and cheap when nothing is fragmented: the no-op
    decision per bucket is ONE dir listing (file count + bytes vs
    ``ceil(bytes/target)``), never footer reads — a scheduled compact
    over an already-compact index costs one listing per bucket.  A
    bucket that IS rewritten is footer-verified row-exact against its
    pre-rewrite footer total before the swap; a mismatched rewrite is
    discarded with the live dir untouched.  Sidecars
    (``_ann_meta.parquet``, ``_ann_centroids.parquet``) are one-row /
    tiny, never appended to, and never touched here.

    Do not run concurrently with :func:`append_to_ann_index` over the
    same path (same maintenance-window contract as
    ``plans.compaction.compact_kg``).  All I/O routes through
    :mod:`..plans.fsio`, so the index may live on any Hadoop-visible
    filesystem.  Returns ``{buckets_total, buckets_compacted,
    n_files_before, n_files_after, rows_verified, repaired}``."""
    from ..plans import fsio
    from ..plans.manifest import table_fingerprint

    # fail fast BEFORE repair mutates anything: 0 would divide by zero
    # mid-maintenance, a negative value would silently coalesce every
    # bucket to one file (same guard jobs/kg_build.py applies in front
    # of compact_kg — this API has no CLI, so it guards itself)
    if target_bytes <= 0:
        raise ValueError(
            "compact_ann_index: target_bytes must be positive, got %r"
            % (target_bytes,)
        )
    # settle crashed sibling maintenance first: a crashed whole-index
    # rebuild (live dir one rename away), then a crashed append's
    # stray part files — compacting strays would launder an
    # uncommitted half-batch into the compacted file set
    _repair_ann_rebuild(spark, path)
    _reconcile_ann_append_intent(spark, path)
    # the repair's post-repair name set is current under the
    # serialized-maintenance contract — reusing it saves the second
    # root LIST every scheduled compact would otherwise pay
    repaired, root_names = _repair_ann_compaction(spark, path)
    buckets = sorted(n for n in root_names if n.startswith("bucket="))
    if not buckets:
        raise ValueError(
            "compact_ann_index: no bucket partitions at %r — not a "
            "write_ann_index directory" % path
        )
    out = {
        "buckets_total": len(buckets),
        "buckets_compacted": 0,
        "n_files_before": 0,
        "n_files_after": 0,
        "rows_verified": 0,
        "repaired": repaired,
    }
    for b in buckets:
        live = _sidecar(path, b)
        pq_files = [
            (n, sz)
            for n, sz in fsio.listdir(spark, live)
            if n.endswith(".parquet")
        ]
        n_files = len(pq_files)
        nbytes = sum(sz for _, sz in pq_files)
        n_target = max(1, math.ceil(nbytes / float(target_bytes)))
        out["n_files_before"] += n_files
        if n_files <= n_target and not force:
            out["n_files_after"] += n_files
            continue
        fp = table_fingerprint(live, spark=spark)
        bucket_id = b[len("bucket="):]
        tmp = _sidecar(path, _ANN_TMP + bucket_id)
        old = _sidecar(path, _ANN_OLD + bucket_id)
        # reading the bucket dir directly yields the file columns only
        # (vec_id, vec — the partition value lives in the dir name),
        # which is exactly what the original part files hold, so the
        # rewrite is layout-identical; coalesce is shuffle-free
        spark.read.parquet(live).coalesce(n_target).write.mode(
            "overwrite"
        ).parquet(tmp)
        tmp_fp = table_fingerprint(tmp, spark=spark)
        if tmp_fp["rows"] != fp["rows"]:
            fsio.delete(spark, tmp)
            raise RuntimeError(
                "compact_ann_index: rewrite of %r produced %d rows, "
                "expected %d — tmp discarded, bucket untouched"
                % (live, tmp_fp["rows"], fp["rows"])
            )
        fsio.rename(spark, live, old)
        fsio.rename(spark, tmp, live)
        fsio.delete(spark, old)
        out["buckets_compacted"] += 1
        out["n_files_after"] += tmp_fp["n_files"]
        out["rows_verified"] += tmp_fp["rows"]
    return out


def ann_index_topk(
    spark: SparkSession,
    path: str,
    queries: List[Tuple[int, List[float]]],
    k: int = 5,
    multiprobe: int = 1,
    n_probe: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """Top-k probe over a :func:`write_ann_index` index.  Reads ONLY
    the probed bucket partitions (partition pruning at the source) and
    reranks exactly inside them — same results as lsh_topk/ivf_topk
    with the same probe settings, without the full-corpus scan.

    All sidecar reads go through Spark (:func:`read_ann_meta`), so
    the probe works against an index on any Hadoop-visible filesystem
    — no driver-local ``open()`` of ``path``.

    Raises RuntimeError if the index has a torn compaction swap (a
    live bucket dir absent with its tmp/old copy present) — the one
    crash shape that would otherwise SILENTLY drop a whole bucket
    from the results; see :func:`_check_no_torn_swap`."""
    meta = read_ann_meta(spark, path)
    _check_no_torn_swap(spark, path)
    q_ids = np.array([q[0] for q in queries], dtype=np.int64)
    q_mat = _normalize_rows(
        np.array([q[1] for q in queries], dtype=np.float32)
    )
    probe: dict = {}
    if meta["kind"] == "lsh":
        planes = _planes(meta["n_planes"], meta["dim"])
        q_buckets = _bucket_of(q_mat, planes)
        from itertools import combinations

        flip_masks = [0]
        for r in range(1, max(0, multiprobe) + 1):
            for bits in combinations(range(meta["n_planes"]), r):
                m = 0
                for b in bits:
                    m |= 1 << b
                flip_masks.append(m)
        for qi, b in enumerate(q_buckets):
            for m in flip_masks:
                probe.setdefault(int(b) ^ m, []).append(qi)
    else:
        centroids = _read_centroids(spark, path)
        q_sims = q_mat.astype(np.float64) @ centroids.T.astype(np.float64)
        npb = min(n_probe, centroids.shape[0])
        for qi in range(len(queries)):
            for c in np.argsort(-q_sims[qi])[:npb]:
                probe.setdefault(int(c), []).append(qi)
    bc = spark.sparkContext.broadcast((q_ids, q_mat, probe))

    buckets = sorted(probe.keys())
    # partition filter -> only probed bucket directories are scanned
    src = spark.read.parquet(path).where(F.col("bucket").isin(buckets))

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat, pr = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            corpus = _normalize_rows(np.vstack(pdf["vec"].to_numpy()))
            nids = pdf["vec_id"].to_numpy(dtype=np.int64)
            bks = pdf["bucket"].to_numpy(dtype=np.int64)
            out_q, out_n, out_s = [], [], []
            for j in range(corpus.shape[0]):
                qis = pr.get(int(bks[j]))
                if not qis:
                    continue
                sims = mat[qis].astype(np.float64) @ corpus[j].astype(
                    np.float64
                )
                for t, qi in enumerate(qis):
                    if exclude_self and nids[j] == ids[qi]:
                        continue
                    out_q.append(ids[qi])
                    out_n.append(nids[j])
                    out_s.append(float(sims[t]))
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "sim": out_s}
            )

    cands = src.select("vec_id", "vec", "bucket").mapInPandas(
        local, TOPK_SCHEMA
    )
    return topk_merge(cands, k)


# --------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs (the dense-vector analog of
# minhash_lsh_pairs): banded hyperplane-LSH candidates + exact float64
# verification of candidates only — never an n² cartesian.


def _emb_band_keys(
    normed: np.ndarray, planes: np.ndarray, n_bands: int, n_planes: int
) -> List[List[str]]:
    """Per-row list of band-key strings ('band:hexcode')."""
    bits = (normed @ planes.T) >= 0  # (n, n_bands*n_planes)
    keys: List[List[str]] = []
    for r in range(normed.shape[0]):
        row = []
        for b in range(n_bands):
            code = 0
            for p in range(n_planes):
                if bits[r, b * n_planes + p]:
                    code |= 1 << p
            row.append("%d:%x" % (b, code))
        keys.append(row)
    return keys


def _pair_cosine(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise cosine of two already-f32 matrices: normalize f32,
    multiply-sum in float64 — the single shared definition used by the
    distributed verify UDF AND the single-node gold builder, so both
    paths run bit-identical math."""
    an = _normalize_rows(a).astype(np.float64)
    bn = _normalize_rows(b).astype(np.float64)
    return np.einsum("ij,ij->i", an, bn)


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.35,
    n_bands: int = 8,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_a, vec_b, sim) pairs with cosine >= threshold.

    Scale shape mirrors minhash_lsh_pairs: one narrow pass emits
    deterministic hyperplane band keys, candidates come from the
    banded self-join (AQE skew-join splits hot buckets), and the exact
    cosine runs only on candidate pairs.  Approximate: recall < 1 by
    design (gauged vs brute force in tests); the driver query checks
    distributed == single-node of the same banding."""
    import pandas as pd_  # local alias; module already imports pandas

    spark = embeddings.sparkSession
    first = embeddings.select(vec_col).first()
    if first is None:  # empty corpus -> no pairs, correct schema
        return spark.createDataFrame(
            [], "vec_a long, vec_b long, sim double"
        )
    dim = len(first[vec_col])
    planes = _planes(n_bands * n_planes, dim)
    bc = spark.sparkContext.broadcast((planes, n_bands, n_planes))

    src = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    )

    def bandize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pl, nb, npl = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            normed = _normalize_rows(np.vstack(pdf["vec"].to_numpy()))
            yield pd_.DataFrame(
                {
                    "doc_id": pdf["vec_id"],
                    "bucket_list": _emb_band_keys(normed, pl, nb, npl),
                }
            )

    band_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("bucket_list", T.ArrayType(T.StringType())),
        ]
    )
    banded = src.mapInPandas(bandize, band_schema).select(
        "doc_id", F.explode("bucket_list").alias("bucket")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, F.col("a.bucket") == F.col("b.bucket"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("vec_a"),
            F.col("b.doc_id").alias("vec_b"),
        )
        .distinct()
    )
    vecs = src
    joined = (
        pairs.join(
            vecs.withColumnRenamed("vec_id", "vec_a")
            .withColumnRenamed("vec", "va"),
            "vec_a",
        ).join(
            vecs.withColumnRenamed("vec_id", "vec_b")
            .withColumnRenamed("vec", "vb"),
            "vec_b",
        )
    )

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.DoubleType())
    def _cosine_udf(va: pd.Series, vb: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd_.Series([], dtype="float64")
        ma = np.vstack(va.to_numpy()).astype(np.float32)
        mb = np.vstack(vb.to_numpy()).astype(np.float32)
        return pd_.Series(_pair_cosine(ma, mb))

    return (
        joined.withColumn("sim", F.round(_cosine_udf("va", "vb"), 4))
        .where(F.col("sim") >= threshold)
        .select("vec_a", "vec_b", "sim")
    )


# --------------------------------------------------------------------------
# LSH variant


def _planes(n_planes: int, dim: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from blake2b bytes."""
    need = n_planes * dim * 4
    buf = bytearray()
    i = 0
    while len(buf) < need:
        buf += hashlib.blake2b(b"ann-plane-%d" % i, digest_size=64).digest()
        i += 1
    raw = np.frombuffer(bytes(buf[:need]), dtype="<u4").astype(np.float64)
    m = (raw / 2**32) * 2.0 - 1.0  # uniform [-1, 1)
    return m.reshape(n_planes, dim).astype(np.float32)


def _bucket_of(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (mat @ planes.T) >= 0
    out = np.zeros(mat.shape[0], dtype=np.int64)
    for b in range(planes.shape[0]):
        out |= bits[:, b].astype(np.int64) << b
    return out


def lsh_topk(
    embeddings: DataFrame,
    queries: List[Tuple[int, List[float]]],
    k: int = 5,
    n_planes: int = 8,
    multiprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate cosine top-k: hyperplane-LSH bucket filter + exact
    rerank.  ``multiprobe`` additionally probes buckets reachable by
    flipping that many sign bits (recall/latency dial)."""
    spark = embeddings.sparkSession
    dim = len(queries[0][1])
    planes = _planes(n_planes, dim)
    q_ids = np.array([q[0] for q in queries], dtype=np.int64)
    q_mat = _normalize_rows(np.array([q[1] for q in queries], dtype=np.float32))
    q_buckets = _bucket_of(q_mat, planes)
    # probe set per query: own bucket + all buckets within `multiprobe`
    # bit flips
    from itertools import combinations

    flip_masks = [0]
    for r in range(1, max(0, multiprobe) + 1):
        for bits in combinations(range(n_planes), r):
            m = 0
            for b in bits:
                m |= 1 << b
            flip_masks.append(m)
    probe: dict = {}
    for qi, b in enumerate(q_buckets):
        for m in flip_masks:
            probe.setdefault(int(b) ^ m, []).append(qi)
    bc = spark.sparkContext.broadcast((q_ids, q_mat, planes, probe))

    src = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
    )

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat, pl, pr = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            corpus = _normalize_rows(np.vstack(pdf["vec"].to_numpy()))
            nids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            cbuckets = _bucket_of(corpus, pl)
            out_q, out_n, out_s = [], [], []
            for j in range(corpus.shape[0]):
                qis = pr.get(int(cbuckets[j]))
                if not qis:
                    continue
                sims = mat[qis].astype(np.float64) @ corpus[j].astype(np.float64)
                for t, qi in enumerate(qis):
                    if exclude_self and nids[j] == ids[qi]:
                        continue
                    out_q.append(ids[qi])
                    out_n.append(nids[j])
                    out_s.append(float(sims[t]))
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "sim": out_s}
            )

    cands = src.mapInPandas(local, TOPK_SCHEMA)
    return topk_merge(cands, k)
