# -*- coding: utf-8 -*-
"""Salted two-stage aggregation correctness under a heavy hot key."""
from pyspark.sql import functions as F


def test_salted_count_equals_plain(spark):
    from webstruct_spark.operators.skew import salted_count

    rows = [("hot", i % 7) for i in range(5000)] + [
        ("k%d" % i, i) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "key string, v int")
    got = {r["key"]: r["n"] for r in salted_count(df, ["key"]).collect()}
    want = {
        r["key"]: r["n"]
        for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want
    assert got["hot"] == 5000


def test_salted_distinct_count(spark):
    from webstruct_spark.operators.skew import salted_distinct_count

    rows = [("hot", "v%d" % (i % 37)) for i in range(4000)] + [
        ("cold", "x"), ("cold", "y"), ("cold", "x")
    ]
    df = spark.createDataFrame(rows, "key string, val string")
    got = {
        r["key"]: r["n_distinct"]
        for r in salted_distinct_count(df, ["key"], "val").collect()
    }
    assert got == {"hot": 37, "cold": 2}


def test_conv_salt_buckets(spark):
    from webstruct_spark.operators.skew import with_conv_salt

    df = spark.createDataFrame(
        [("c", i) for i in range(3000)], "conv_id string, turn_idx int"
    )
    b = with_conv_salt(df, turns_per_bucket=1024)
    counts = {
        r["turn_bucket"]: r["n"]
        for r in b.groupBy("turn_bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {0: 1024, 1: 1024, 2: 952}
