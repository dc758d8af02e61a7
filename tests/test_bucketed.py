# -*- coding: utf-8 -*-
"""Bucketed co-located joins: same-bucketed tables join with ZERO
Exchange nodes (the write-time shuffle is amortized over every later
join), and results equal the plain join."""
import os

from pyspark.sql import functions as F

from webstruct_spark.operators.bucketed import (
    colocated_join,
    write_bucketed,
)
from webstruct_spark.operators.extract import mentions


def test_bucketed_join_is_exchange_free(spark, corpus_dir):
    turns = spark.read.parquet(
        os.path.join(corpus_dir, "transcripts.parquet")
    )
    m = mentions(turns)
    per_conv = m.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_mentions")
    )
    write_bucketed(
        turns.select("conv_id", "turn_idx", "role"),
        "b_turns", ["conv_id"], n_buckets=8, sort_cols=["conv_id"],
    )
    write_bucketed(
        per_conv, "b_mentions", ["conv_id"], n_buckets=8,
        sort_cols=["conv_id"],
    )
    # the test tables are tiny, so Catalyst would broadcast (its own
    # exchange) and skip the bucketed scan; at the scale this operator
    # targets both sides are far beyond any broadcast threshold
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(
            spark, "b_turns", "b_mentions", on=["conv_id"]
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan

        # and values match the unbucketed join
        want = (
            turns.select("conv_id", "turn_idx", "role")
            .join(per_conv, ["conv_id"])
            .count()
        )
        assert joined.count() == want and want > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS b_turns")
        spark.sql("DROP TABLE IF EXISTS b_mentions")
