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
        T.StructField("sig", T.ArrayType(T.LongType())),
        T.StructField("sh", T.ArrayType(T.LongType())),
    ]
)


def _to_signed64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


@pandas_udf(_SKETCH_TYPE)
def _minhash_sketch_udf(texts: pd.Series) -> pd.DataFrame:
    """ONE pass over the text: LSH band keys, the full 64-slot MinHash
    signature, and the 64-bit-hashed distinct shingle set.  Raw text
    never leaves this UDF; the signature (fixed 64x8 bytes) is what
    candidate scoring ships per pair — the O(doc-length) ``sh`` array
    joins only for the pairs inside the exact-confirm band."""
    bands, sigs, hashes = [], [], []
    for t in texts:
        sh = word_shingles(t)
        sig = minhash_signature(sh)
        bands.append(lsh_band_keys(sig))
        sigs.append([_to_signed64(v) for v in sig])
        hashes.append([_to_signed64(_h64(s)) for s in sh])
    return pd.DataFrame({"bands": bands, "sig": sigs, "sh": hashes})


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
    confirm_band: float = 0.2,
    persist: bool = True,
) -> DataFrame:
    """(doc_a, doc_b, jaccard, verified) near-duplicate pairs from
    MinHash/LSH candidates, scored in two tiers:

    1. SIGNATURE tier (every candidate pair): estimate Jaccard as the
       fraction of equal slots in the two 64-slot MinHash signatures —
       a fixed 64x8-byte payload per doc regardless of doc length.
       ``est >= threshold + confirm_band`` accepts outright
       (``verified=false``, ``jaccard`` = the estimate);
       ``est < threshold - confirm_band`` rejects outright.
    2. EXACT tier (only pairs inside the +-confirm_band gray zone):
       join the 64-bit hashed-shingle arrays and compute exact Jaccard
       JVM-side (array_intersect); accept iff ``>= threshold``
       (``verified=true``, ``jaccard`` exact).

    Scale shape: the sketch UDF runs ONCE per doc (persisted — see
    lifecycle note), no raw text passes the scan, and the O(doc-length)
    shingle arrays are joined ONLY for gray-zone pairs — a hot doc in
    many clear-duplicate pairs ships 512 signature bytes per pair, not
    its text-sized shingle array (the round-2 byte-volume caveat).
    With 64 slots the estimate's s.e. at J=0.5 is ~0.0625, so the
    default 0.2 band is ~3.2 sigma: P(true J>=0.5 rejected outright)
    ~7e-4 per pair, and every borderline decision is exact.

    CONSUMER NOTE: the ``jaccard`` column has mixed semantics by
    design — on ``verified=true`` rows it is the exact set Jaccard, on
    ``verified=false`` rows it is the signature ESTIMATE (s.e. ~0.06
    at J=0.5).  Downstream thresholding sharper than the confirm band
    must filter on ``verified`` (or re-verify) rather than treating
    the column as uniformly exact.

    Lifecycle: with ``persist=True`` (default) the internal sketch
    DataFrame stays persisted so the band explode and both score tiers
    share one UDF pass; it is exposed as ``result._sketch_handle`` —
    long-lived sessions issuing many dedup calls should
    ``result._sketch_handle.unpersist()`` after materializing the
    result (bench.py does).  One-shot callers that will materialize
    the result exactly once and cannot manage the handle should pass
    ``persist=False`` (the sketch recomputes per downstream use)."""
    from .spread import widen_scan

    base = widen_scan(
        docs.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
    )
    sketch = base.select(
        "doc_id", _minhash_sketch_udf("text").alias("s")
    ).select(
        "doc_id", F.col("s.bands").alias("bands"),
        F.col("s.sig").alias("sig"), F.col("s.sh").alias("sh")
    )
    if persist:
        sketch = sketch.persist()
    banded = sketch.select("doc_id", F.explode("bands").alias("bucket"))
    pairs = _candidate_pairs(banded)
    sig = sketch.select("doc_id", "sig")
    scored = (
        pairs.join(sig.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("sig", "sig_a"), "doc_a")
        .join(sig.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("sig", "sig_b"), "doc_b")
        .withColumn(
            "est",
            F.size(
                F.filter(
                    F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                    lambda eq: eq,
                )
            ).cast("double") / F.size("sig_a"),
        )
        .select("doc_a", "doc_b", "est")
    )
    lo = threshold - confirm_band
    hi = threshold + confirm_band
    # single linear pass: keep candidates with est >= lo, then LEFT-join
    # the shingle arrays with `est < hi` in the join condition — the
    # O(doc-length) sh arrays attach ONLY to gray-zone rows (each doc's
    # array shuffles once, keyed by doc_id; clear accepts never see it)
    cand = scored.where(F.col("est") >= lo)
    sh_a = sketch.select(
        F.col("doc_id").alias("a_id"), F.col("sh").alias("sh_a")
    )
    sh_b = sketch.select(
        F.col("doc_id").alias("b_id"), F.col("sh").alias("sh_b")
    )
    in_gray = F.col("est") < hi
    joined = cand.join(
        sh_a, (F.col("doc_a") == F.col("a_id")) & in_gray, "left"
    ).join(sh_b, (F.col("doc_b") == F.col("b_id")) & in_gray, "left")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    exact = F.when(union == 0, F.lit(1.0)).otherwise(
        inter.cast("double") / union
    )
    result = (
        joined.withColumn(
            "jaccard",
            F.round(F.when(in_gray, exact).otherwise(F.col("est")), 6),
        )
        .withColumn("verified", in_gray)
        .where(
            ~in_gray | (F.coalesce(exact, F.lit(-1.0)) >= threshold)
        )
        .select("doc_a", "doc_b", "jaccard", "verified")
    )
    result._sketch_handle = sketch  # caller-owned unpersist hook
    return result


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
    from .spread import widen_scan

    base = widen_scan(
        docs.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
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
    max_df: int = 10_000,
) -> DataFrame:
    """Exact word-k-gram Jaccard pairs >= threshold, fully relational
    (shingle explode + self-join) — no sketches, no Python.

    Hot-shingle guard: the shingle self-join is quadratic in any
    shingle's document frequency (a boilerplate sentence shared by 1e6
    docs would emit 1e12 join rows), so shingles with df > ``max_df``
    are dropped BEFORE the join via a df window over the single
    shingle scan (one exchange, partitioned by shingle — the self-join
    legs and the per-doc size agg all reuse it; the standard
    positional-filter practice).  Jaccard is then computed
    consistently over each doc's df<=max_df shingle subset — exact
    whenever nothing is dropped (the SQL-oracle regime; nothing drops
    at the test scales), conservative-approximate on corpora with
    mega-df boilerplate.  Dropped shingles are observable via the
    returned DataFrame's ``_dropped_shingles`` attribute (a lazy
    (shingle, df) DataFrame).  Pass ``max_df=None`` to disable — the
    driver's oracle-gated query does, because its DuckDB SQL defines
    UNCAPPED Jaccard and the semantics must match at any scale."""
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
    dropped = None
    if max_df is not None:
        # lazy observability hook; only computed if the caller
        # materializes it (it re-aggregates the explode)
        dropped = (
            exploded.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_df)
        )
        # df filter as a window over the one shingle exchange — the
        # self-join legs below join on this same key and reuse the
        # exchange, so the guard adds no extra scan of the corpus
        exploded = (
            exploded.withColumn(
                "df",
                F.count(F.lit(1)).over(Window.partitionBy("shingle")),
            )
            .where(F.col("df") <= max_df)
            .drop("df")
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
    result = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(jac >= threshold)  # threshold the exact value, round for output
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )
    result._dropped_shingles = dropped  # observability hook (may be None)
    return result
