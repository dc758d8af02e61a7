#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Small-file fragmentation cost + compaction payoff measurement.

Builds a KG on half of a synthetic corpus, appends the other half in
``--deltas`` slices (each append = one set of part files per
append-mode stage — the shape weeks of streaming micro-batches
leave), then measures a representative full scan of each fragmented
stage, compacts (:func:`webstruct_spark.plans.compaction.compact_kg`),
and re-measures the identical scan.

Prints ONE JSON line:
  {"corpus": ..., "deltas": K,
   "stages": {stage: {"files_before": n, "files_after": n,
                      "scan_frag_s": s, "scan_compact_s": s}},
   "compact_wall_s": s, "scan_frag_total_s": s,
   "scan_compact_total_s": s}

The scan forces real data reads (sum of value-column lengths /
hashes), not footer-only counts, and is repeated ``--reps`` times
warm with the median reported, so the per-file open/footer overhead
is what's being compared.  Local NVMe hides most of the latency a
NameNode/object store adds per file at cluster scale, so treat the
local delta as a LOWER bound on the 100 TB payoff.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _scan(spark, path: str) -> float:
    """Median warm wall of a forced full scan of every column-bearing
    row (xxhash64 over all columns defeats footer-only counts and
    column pruning)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    t0 = time.time()
    df.select(F.xxhash64(*df.columns).alias("h")).agg(
        F.expr("bit_xor(h)")  # overflow-free fold under ANSI mode
    ).collect()
    return time.time() - t0


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--conversations", type=int, default=2000)
    p.add_argument("--deltas", type=int, default=16)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--cores", type=int,
                   default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    p.add_argument("--workdir", default="/tmp/ws_compact_bench")
    args = p.parse_args()

    from pyspark.sql import functions as F

    from webstruct_spark.plans.compaction import APPEND_STAGES, compact_kg
    from webstruct_spark.plans.manifest import table_fingerprint
    from webstruct_spark.plans.pipeline import append_kg_frames, build_kg
    from webstruct_spark.session import get_spark
    from webstruct_spark.sources.transcripts import (
        default_corpus_dir, materialize_corpus,
    )

    corpus = materialize_corpus(
        default_corpus_dir("bench_compact%d" % args.conversations),
        args.conversations,
    )
    if os.path.exists(args.workdir):
        shutil.rmtree(args.workdir)
    os.makedirs(args.workdir)

    spark = get_spark("compaction_bench", cores=args.cores,
                      shuffle_partitions=max(8, args.cores))
    try:
        t = spark.read.parquet(os.path.join(corpus, "transcripts.parquet"))
        convs = sorted(
            r[0] for r in t.select("conv_id").distinct().collect()
        )
        half = len(convs) // 2
        base_dir = os.path.join(args.workdir, "corpus_base")
        os.makedirs(base_dir)
        t.where(F.col("conv_id").isin(set(convs[:half]))).write.parquet(
            os.path.join(base_dir, "transcripts.parquet")
        )
        shutil.copy(os.path.join(corpus, "gazetteer.parquet"),
                    os.path.join(base_dir, "gazetteer.parquet"))

        out = os.path.join(args.workdir, "kg")
        build_kg(spark, base_dir, out)

        gaz = spark.read.parquet(os.path.join(corpus, "gazetteer.parquet"))
        gaz_fp = table_fingerprint(
            os.path.join(base_dir, "gazetteer.parquet"), spark=spark
        )
        rest = convs[half:]
        step = max(1, len(rest) // args.deltas)
        for i in range(0, len(rest), step):
            chunk = set(rest[i:i + step])
            append_kg_frames(
                spark, t.where(F.col("conv_id").isin(chunk)), gaz,
                gazetteer_fp=gaz_fp, out_dir=out,
            )

        stages = {}
        frag_total = 0.0
        for s in APPEND_STAGES:
            path = os.path.join(out, s)
            fp = table_fingerprint(path, spark=spark)
            walls = [_scan(spark, path) for _ in range(args.reps)]
            stages[s] = {
                "files_before": fp["n_files"],
                "scan_frag_s": round(statistics.median(walls), 3),
            }
            frag_total += stages[s]["scan_frag_s"]

        t0 = time.time()
        res = compact_kg(spark, out)
        compact_wall = time.time() - t0

        compact_total = 0.0
        for s in APPEND_STAGES:
            path = os.path.join(out, s)
            walls = [_scan(spark, path) for _ in range(args.reps)]
            stages[s]["files_after"] = res[s]["n_files_after"]
            stages[s]["scan_compact_s"] = round(
                statistics.median(walls), 3
            )
            compact_total += stages[s]["scan_compact_s"]

        print(json.dumps({
            "corpus": corpus,
            "conversations": args.conversations,
            "deltas": args.deltas,
            "cores": args.cores,
            "stages": stages,
            "compact_wall_s": round(compact_wall, 3),
            "scan_frag_total_s": round(frag_total, 3),
            "scan_compact_total_s": round(compact_total, 3),
        }))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
