# -*- coding: utf-8 -*-
"""Deduplication operators over a document table — the
training-data-pipeline layer: exact, MinHash+LSH, SimHash, and n-gram
Jaccard near-dup detection.

Scale design per operator:

* exact: md5 of normalized text, min-id per group — one hash
  aggregate, no Python.
* minhash_lsh: signature per doc in ONE Arrow UDF pass (narrow),
  explode band keys, bucket self-join for candidates (AQE skew-join
  handles hot buckets), then exact-Jaccard verification only on the
  candidate pairs — verification work is proportional to candidates,
  not corpus².
* simhash: 64-bit fingerprints, pigeonhole banding on 16-bit chunks →
  candidates, hamming verify (JVM-side bit ops).
* ngram_jaccard: fully relational shingle-explode + self-join —
  exact, and the SQL-oracle-checkable baseline for the sketch-based
  variants.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..kernel.dedup import (
    _h64,
    lsh_band_keys,
    minhash_signature,
    simhash64,
    word_shingles,
)


from .linking import norm_text_col  # single shared definition


def exact_duplicate_groups(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, dup_key, canonical_doc_id): md5-exact duplicate groups,
    canonical = min id per group."""
    keyed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(norm_text_col(F.col(text_col))).alias("dup_key"),
    )
    w = Window.partitionBy("dup_key")
    return keyed.withColumn("canonical_doc_id", F.min("doc_id").over(w))


_SKETCH_TYPE = T.StructType(
    [
        T.StructField("bands", T.ArrayType(T.StringType())),
        T.StructField("sh", T.ArrayType(T.LongType())),
    ]
)


def _to_signed64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


@pandas_udf(_SKETCH_TYPE)
def _minhash_sketch_udf(texts: pd.Series) -> pd.DataFrame:
    """ONE pass over the text: LSH band keys + the 64-bit-hashed
    distinct shingle set.  Raw text never leaves this UDF — candidate
    verification joins ship only the (much smaller) hash arrays, and
    shingling never runs twice."""
    bands, hashes = [], []
    for t in texts:
        sh = word_shingles(t)
        bands.append(lsh_band_keys(minhash_signature(sh)))
        hashes.append([_to_signed64(_h64(s)) for s in sh])
    return pd.DataFrame({"bands": bands, "sh": hashes})


def _candidate_pairs(banded: DataFrame) -> DataFrame:
    """banded: (doc_id, bucket) exploded band keys -> distinct
    (doc_a, doc_b) with doc_a < doc_b."""
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, F.col("a.bucket") == F.col("b.bucket"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) near-duplicate pairs: MinHash/LSH
    candidates verified by exact word-3-gram Jaccard >= threshold.

    Scale shape: the sketch UDF runs ONCE per doc (persisted), band
    keys explode into the bucket self-join, and verification joins
    carry only 64-bit hashed shingle arrays — no raw text past the
    scan, no re-shingling.  The exact Jaccard is JVM-side
    (array_intersect), identical to the string-set value barring
    64-bit hash collisions."""
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    sketch = base.select(
        "doc_id", _minhash_sketch_udf("text").alias("s")
    ).select(
        "doc_id", F.col("s.bands").alias("bands"), F.col("s.sh").alias("sh")
    ).persist()
    banded = sketch.select("doc_id", F.explode("bands").alias("bucket"))
    pairs = _candidate_pairs(banded)
    sh = sketch.select("doc_id", "sh")
    joined = (
        pairs.join(sh.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("sh", "sh_b"), "doc_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = F.when(union == 0, F.lit(1.0)).otherwise(
        inter.cast("double") / union
    )
    return (
        joined.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def _to_i64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


@pandas_udf(T.LongType())
def _simhash_udf(texts: pd.Series) -> pd.Series:
    # signed int64 (two's complement) for JVM compatibility
    return texts.map(lambda t: _to_i64(simhash64(t)))


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with simhash hamming distance <=
    max_hamming, found via 16-bit-chunk pigeonhole banding."""
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    sims = base.withColumn("simhash", _simhash_udf("text"))
    banded = sims.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit("%d:" % bi),
                        F.conv(
                            F.shiftrightunsigned("simhash", bi * 16)
                            .bitwiseAND(F.lit(0xFFFF)).cast("string"),
                            10, 16,
                        ),
                    )
                    for bi in range(4)
                ]
            )
        ).alias("bucket"),
    )
    pairs = _candidate_pairs(banded)
    s = sims.select("doc_id", "simhash")
    joined = (
        pairs.join(s.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("simhash", "sim_a"), "doc_a")
        .join(s.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("simhash", "sim_b"), "doc_b")
    )
    # popcount of xor, JVM-side
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        joined.withColumn("hamming", ham.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-k-gram Jaccard pairs >= threshold, fully relational
    (shingle explode + self-join) — no sketches, no Python."""
    words = F.split(norm_text_col(F.col(text_col)), " ")
    base = docs.select(F.col(id_col).alias("doc_id"), words.alias("w"))
    n = F.size("w")
    # k-gram shingles via transform over indices (JVM-side)
    shingled = base.select(
        "doc_id",
        F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(0), n - k),
                lambda i: F.concat_ws(" ", F.slice("w", i + 1, k)),
            ),
        )
        .otherwise(F.array(F.concat_ws(" ", "w")))
        .alias("shingles"),
    )
    exploded = shingled.select(
        "doc_id", F.explode(F.array_distinct("shingles")).alias("shingle")
    )
    sizes = exploded.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    common = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a")
    sb = sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b")
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(jac >= threshold)  # threshold the exact value, round for output
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )
