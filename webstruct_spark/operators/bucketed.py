# -*- coding: utf-8 -*-
"""Bucketed (co-located) tables: the exchange-free join path for
repeated same-key joins at 100 TB.

Every wide KG stage keys on ``conv_id`` (grouping, sessionization,
per-conversation metrics) or on the canonical node id (graph
assembly).  Writing both sides of a recurring join bucketed by the
key with the same bucket count lets Spark plan a SortMergeJoin with
NO Exchange on either side — the shuffle happens once at write time
and is amortized over every subsequent join/aggregation
(tests/test_bucketed.py asserts the plan is Exchange-free).

In local mode the table data lands under ``spark-warehouse/``
(bucket metadata lives in the session catalog); on a real cluster the
same ``bucketBy`` write against a persistent metastore or an Iceberg
catalog's bucket-partition transform gives durable co-location.
"""
from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 64,
    sort_cols: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Save ``df`` as a bucketed (and optionally sorted) table."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.  With both
    sides bucketed identically this plans with zero Exchange nodes."""
    return spark.table(left_table).join(
        spark.table(right_table), list(on), how
    )
