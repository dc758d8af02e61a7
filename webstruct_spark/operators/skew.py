# -*- coding: utf-8 -*-
"""Explicit skew-handling primitives (north rule: mega-conversations
and head entities).

``salted_count``: two-stage aggregation — stage 1 aggregates on
(key, salt) so a hot key's rows spread over ``n_salts`` reducers,
stage 2 merges the partials.  Catalyst's partial/final hash aggregate
already does map-side combine for plain counts; the explicit salt
matters for aggregates whose partial state is large (collect-style,
exact distinct) or when a single reducer key would exceed executor
memory — and it is the documented pattern the 100 TB deployment uses
for head-entity frequency tables.

``with_conv_salt``: bucket key for pre-partitioning turn work within
mega-conversations (stage-1 per (conv_id, bucket), ordered merge in
stage 2).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16,
              salt_col: str = "_salt") -> DataFrame:
    """Row-position salt: spreads even byte-identical duplicate rows
    of a hot key across reducers (a content hash would give every
    duplicate the same salt and re-create the skew).  The salt value
    never reaches results — only row distribution — so the
    partition-dependence of monotonically_increasing_id is harmless."""
    return df.withColumn(
        salt_col,
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)),
    )


def salted_count(df: DataFrame, key_cols: list, n_salts: int = 16) -> DataFrame:
    """Two-stage exact count per key: partial count per (key, salt) →
    final sum per key."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.count(F.lit(1)).alias("_partial")
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_partial").alias("n")
    )


def salted_distinct_count(
    df: DataFrame, key_cols: list, value_col: str, n_salts: int = 16
) -> DataFrame:
    """Two-stage exact distinct count: dedup on (key, salt-of-value,
    value) spreads a hot key's distinct set across reducers, then
    counts per (key, salt), then sums."""
    stage1 = (
        df.select(*key_cols, value_col)
        .withColumn("_salt", F.pmod(F.xxhash64(value_col), F.lit(n_salts)))
        .dropDuplicates([*key_cols, value_col])
    )
    partial = stage1.groupBy(*key_cols, "_salt").agg(
        F.count(F.lit(1)).alias("_partial")
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_partial").alias("n_distinct")
    )


def with_conv_salt(turns: DataFrame, turns_per_bucket: int = 1024) -> DataFrame:
    """Bucket id for splitting a mega-conversation's narrow work:
    (conv_id, turn_bucket) — stage-1 partials are computed per bucket
    and merged in turn order at the conversation level."""
    return turns.withColumn(
        "turn_bucket", (F.col("turn_idx") / F.lit(turns_per_bucket)).cast("int")
    )
