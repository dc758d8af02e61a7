# -*- coding: utf-8 -*-
"""Stateful streaming: per-conversation running state across
micro-batches must converge to the batch aggregation."""
import os
import shutil

from pyspark.sql import functions as F


def test_conversation_state_stream(spark, corpus_dir, tmp_path):
    from webstruct_spark.operators.extract import mentions
    from webstruct_spark.streaming.extract_stream import (
        TRANSCRIPT_SCHEMA,
        run_available_now,
    )
    from webstruct_spark.streaming.stateful import conversation_state_stream

    # split the corpus into two arrival files so state crosses batches
    src = str(tmp_path / "arrivals")
    os.makedirs(src)
    full = spark.read.parquet(os.path.join(corpus_dir, "transcripts.parquet"))
    a = full.where(F.col("turn_idx") % 2 == 0)
    b = full.where(F.col("turn_idx") % 2 == 1)
    a.coalesce(1).write.parquet(os.path.join(src, "f1"))
    b.coalesce(1).write.parquet(os.path.join(src, "f2"))

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*/")
    )
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # parquet sink has no update mode; foreachBatch-append the updates
    q = (
        conversation_state_stream(stream)
        .writeStream.foreachBatch(
            lambda batch, _id: batch.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    res = spark.read.parquet(out)
    # last update per conversation = final state
    final = {
        r["conv_id"]: r
        for r in res.orderBy("n_mentions").collect()  # later updates have >= counts
    }
    want = (
        mentions(full)
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_mentions"),
            F.countDistinct("entity_type").alias("n_types"),
            F.max("turn_idx").alias("last_turn"),
        )
    )
    for w in want.collect():
        got = final[w["conv_id"]]
        assert got["n_mentions"] == w["n_mentions"], w["conv_id"]
        assert got["n_types"] == w["n_types"]
        assert got["last_turn"] == w["last_turn"]
