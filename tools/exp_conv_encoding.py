#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""8->32 memory-bandwidth audit experiment (VERDICT r2 item #7):
does replacing the conv_id STRING with an int64 hash through the
grouping exchange (re-attaching the string once at the end via a
broadcast dimension) move the needle on the Arrow/shuffle-bound
stages?

Variant A — production chain: extract_rows -> group_entities (shuffle
carries conv_id strings) -> count.
Variant B — dictionary-encoded chain: extract_rows -> replace conv_id
with xxhash64(conv_id) -> same bucket grouping over the long key ->
broadcast-join the (hash, conv_id) dimension back -> rebuild group_id
-> count.  Same row counts, same grouping math.

Each variant runs in THIS process sequentially (one JVM), cold then
warm, interleaved A,B so load drift hits both.  Run it twice to see
order effects.  Record the outcome in BENCH.md either way.

Usage: python tools/exp_conv_encoding.py [--cores 32] [--corpus DIR]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def variant_a(turns):
    from webstruct_spark.operators.extract import extract_rows
    from webstruct_spark.operators.grouping_op import group_entities

    return group_entities(extract_rows(turns)).count()


def variant_b(turns, n_buckets: int = 256):
    from pyspark.sql import functions as F

    from webstruct_spark.operators.extract import extract_rows
    from webstruct_spark.operators.grouping_op import (
        DEFAULT_DONT_PENALIZE,
        _make_bucket_grouper,
    )

    rows = extract_rows(turns)
    dim = turns.select("conv_id").distinct().select(
        F.xxhash64("conv_id").alias("conv_key"),
        F.col("conv_id").alias("conv_str"),
    )
    slim = rows.select(
        F.xxhash64("conv_id").alias("conv_id"),  # int64 through shuffle
        "turn_idx", "mention_idx", "text", "entity_type",
        "tok_start", "tok_end", "n_tokens",
    ).withColumn("_bucket", F.pmod(F.col("conv_id"), F.lit(n_buckets)))
    schema = (
        "conv_id long, group_idx int, entity_idx int, text string, "
        "entity_type string, turn_idx int, threshold int, score int, "
        "n_entities int"
    )
    grouped = slim.groupBy("_bucket").applyInPandas(
        _make_bucket_grouper(set(DEFAULT_DONT_PENALIZE)), schema
    )
    out = (
        grouped.join(
            F.broadcast(dim), grouped["conv_id"] == dim["conv_key"]
        )
        .select(
            dim["conv_str"].alias("conv_id"),
            F.format_string(
                "%s:g%04d", dim["conv_str"], grouped["group_idx"]
            ).alias("group_id"),
            "group_idx", "entity_idx", "text", "entity_type",
            "turn_idx", "threshold", "score", "n_entities",
        )
    )
    return out.count()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument(
        "--corpus", default="data/transcripts/bench80000"
    )
    a = ap.parse_args()

    from webstruct_spark.session import get_spark

    spark = get_spark(
        "exp_conv_encoding", cores=a.cores,
        shuffle_partitions=max(8, a.cores),
    )
    turns = spark.read.parquet(os.path.join(a.corpus, "transcripts.parquet"))
    turns = turns.repartition(a.cores * 2).cache()
    n_turns = turns.count()

    results = []
    for rep in range(2):
        for name, fn in (("A_string", variant_a), ("B_int64", variant_b)):
            t0 = time.time()
            n = fn(turns)
            wall = time.time() - t0
            results.append((rep, name, wall, n))
            print(
                json.dumps(
                    dict(
                        rep=rep, variant=name, wall_sec=round(wall, 2),
                        rows=n, turns=n_turns, cores=a.cores,
                        turns_per_sec=round(n_turns / wall, 1),
                    )
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
