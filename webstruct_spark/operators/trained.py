# -*- coding: utf-8 -*-
"""Trained-model tagging path (closes SURVEY M1): distributed label
extraction → deterministic driver-side fit on a bounded sample →
broadcast weights → distributed batched-Viterbi inference.

Mirrors the reference train→predict workflow
(/root/reference/webstruct/crfsuite.py:49-97,
/root/reference/webstruct/wapiti.py:178-246): the labeled sample is
what the reference would load from annotated trees; the fit is the
averaged-perceptron CRF in :mod:`webstruct_spark.kernel.crf`; the
predict is the same flat-row mapInPandas shape as the rule tagger.

Scale notes: the TRAINING sample is bounded (``sample`` turns,
order-deterministic) — exactly the reference's posture (its CI trains
on a handful of pages).  INFERENCE is fully distributed and narrow.
The labeled-sample collect is the only driver materialization.
"""
from __future__ import annotations

import uuid
from typing import Dict, List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernel.bilou import encode_tokens
from ..kernel.crf import CRFTagger
from ..kernel.tokenize import default_segment_words
from .tagger import DEFAULT_TYPES

_CRF_CACHE: Dict[str, CRFTagger] = {}


def labeled_sequences(text: str) -> Tuple[List[str], List[str]]:
    """(clean_tokens, gold_iob2_tags) from one marker-bearing turn."""
    toks = default_segment_words(text or "")
    chars = [t[0] for t in toks]
    idx_tags = encode_tokens(chars)
    return [chars[i] for i, _ in idx_tags], [t for _, t in idx_tags]


def train_crf(
    turns: DataFrame,
    entity_types=DEFAULT_TYPES,
    sample: int = 1500,
    epochs: int = 4,
    text_col: str = "text",
) -> CRFTagger:
    """Fit the averaged-perceptron CRF on the first ``sample`` labeled
    turns in stable (conv_id, turn_idx) order — deterministic, so a
    single-node fit on the same rows yields identical weights."""
    rows = (
        turns.select("conv_id", "turn_idx", F.col(text_col).alias("text"))
        .orderBy("conv_id", "turn_idx")
        .limit(sample)
        .collect()
    )
    seqs = [labeled_sequences(r["text"]) for r in rows]
    return CRFTagger(entity_types).fit(seqs, epochs=epochs)


def train_crf_local(
    texts, entity_types=DEFAULT_TYPES, sample: int = 1500, epochs: int = 4
) -> CRFTagger:
    """Single-node twin of :func:`train_crf` over an already-ordered
    text iterable (the gold builder path).  Must stay in lockstep."""
    seqs = [labeled_sequences(t) for t in list(texts)[:sample]]
    return CRFTagger(entity_types).fit(seqs, epochs=epochs)


# -- distributed training (iterated parameter mixing) -------------------

_FIT_PART_SCHEMA = None  # built lazily (needs pyspark types)


def _fit_part_schema():
    global _FIT_PART_SCHEMA
    if _FIT_PART_SCHEMA is None:
        from pyspark.sql import types as T

        _FIT_PART_SCHEMA = T.StructType(
            [
                T.StructField("pid", T.IntegerType()),
                T.StructField("blob", T.BinaryType()),
            ]
        )
    return _FIT_PART_SCHEMA


def train_crf_distributed(
    turns: DataFrame,
    entity_types=DEFAULT_TYPES,
    n_parts: int = 8,
    rounds: int = 4,
    sample: int | None = None,
    text_col: str = "text",
) -> CRFTagger:
    """Distributed CRF training over the FULL labeled corpus (or an
    optional bounded head) via iterated parameter mixing (McDonald,
    Hall & Mann, NAACL 2010): each mixing round broadcasts the current
    weights, every partition runs one deterministic averaged-perceptron
    epoch from them over its own shard (sorted by (conv_id, turn_idx)),
    and the driver averages the resulting parameter vectors in stable
    partition order.

    This closes the reference workflow gap left by :func:`train_crf`
    (which, like the reference CI — /root/reference/webstruct/
    tests/test_crfsuite.py:31-60 — trains on a small sorted head): the
    reference's ``WapitiCRF.fit`` (/root/reference/webstruct/
    wapiti.py:178-246) trains on the whole annotated corpus, and so
    does this, without ever collecting the corpus to the driver — only
    ``n_parts`` weight blobs cross per round.

    Determinism (load-bearing for the driver hash oracle vs the
    single-node twin :func:`train_crf_mixed_local`): the shard
    assignment is ``crc32(conv_id) % n_parts`` (bit-identical JVM-side
    and in :mod:`zlib`), every shard fit is input-order deterministic
    with no RNG, and the mix averages in ascending pid order.

    100 TB shape: one narrow pass per round (scan → groupBy(pid) →
    applyInPandas fit → n_parts tiny rows).  ``n_parts`` bounds the
    per-executor training-shard size — scale it with the corpus.
    """
    import pickle

    from pyspark.sql import functions as F

    spark = turns.sparkSession
    src = turns.select("conv_id", "turn_idx", F.col(text_col).alias("text"))
    if sample is not None:
        src = src.orderBy("conv_id", "turn_idx").limit(sample)
    src = src.withColumn(
        "pid",
        (F.crc32(F.col("conv_id").cast("binary")) % n_parts).cast("int"),
    ).persist()
    try:
        model = CRFTagger(entity_types)
        for _round in range(rounds):
            bc = spark.sparkContext.broadcast(model.export())

            def fit_part(pdf):
                import pandas as pd

                pdf = pdf.sort_values(
                    ["conv_id", "turn_idx"], kind="mergesort"
                )
                seqs = [labeled_sequences(t) for t in pdf["text"].tolist()]
                m = CRFTagger.from_export(bc.value)
                m.fit(seqs, epochs=1)
                return pd.DataFrame(
                    {
                        "pid": [int(pdf["pid"].iloc[0])],
                        "blob": [pickle.dumps(m.export())],
                    }
                )

            rows = (
                src.groupBy("pid")
                .applyInPandas(fit_part, _fit_part_schema())
                .collect()
            )
            bc.destroy()
            blobs = [
                pickle.loads(r["blob"])
                for r in sorted(rows, key=lambda r: r["pid"])
            ]
            model = CRFTagger.average_exports(blobs)
    finally:
        src.unpersist()
    return model


def train_crf_mixed_local(
    rows,
    entity_types=DEFAULT_TYPES,
    n_parts: int = 8,
    rounds: int = 4,
    sample: int | None = None,
) -> CRFTagger:
    """Single-node twin of :func:`train_crf_distributed` over
    (conv_id, turn_idx, text) triples — identical shard assignment,
    per-shard fit, and mixing order, so the weights are byte-identical
    to the distributed fit (the gold-builder path).  Must stay in
    lockstep."""
    import zlib

    rows = sorted(rows)
    if sample is not None:
        rows = rows[:sample]
    shards: dict[int, list] = {}
    for cid, ti, tx in rows:
        pid = zlib.crc32(cid.encode("utf-8")) % n_parts
        shards.setdefault(pid, []).append((cid, ti, tx))
    model = CRFTagger(entity_types)
    for _round in range(rounds):
        blob = model.export()
        blobs = []
        for pid in sorted(shards):
            seqs = [
                labeled_sequences(tx) for _cid, _ti, tx in shards[pid]
            ]
            m = CRFTagger.from_export(blob)
            m.fit(seqs, epochs=1)
            blobs.append(m.export())
        model = CRFTagger.average_exports(blobs)
    return model


def crf_tagged_mentions(
    turns: DataFrame,
    model: CRFTagger,
    text_col: str = "text",
) -> DataFrame:
    """Distributed inference with broadcast trained weights: flat
    mention rows (conv_id, turn_idx, mention_idx, text, entity_type,
    tok_start, tok_end) from plain (marker-stripped) token streams.
    Shares the mapInArrow/mapInPandas inference pass with the rule
    tagger (operators/tagger.py:_tagged_rows_df)."""
    from .tagger import _tagged_rows_df

    spark = turns.sparkSession
    bc = spark.sparkContext.broadcast(model.export())
    cache_key = uuid.uuid4().hex

    def get_model() -> CRFTagger:
        m = _CRF_CACHE.get(cache_key)
        if m is None:
            m = CRFTagger.from_export(bc.value)
            _CRF_CACHE.clear()
            _CRF_CACHE[cache_key] = m
        return m

    return _tagged_rows_df(turns, text_col, get_model)
