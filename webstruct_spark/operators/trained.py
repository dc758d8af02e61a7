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

    100 TB shape: ONE shuffle total (an identity ``partitionBy`` that
    pins exactly one shard per partition — a hash-partitioned
    ``groupBy(pid)`` co-locates 2-3 shards per task by balls-in-bins
    and every round then waits on the heaviest task), tokenization +
    gold encoding run once (round-invariant, cached with the
    partition; MEMORY_AND_DISK, so it spills rather than OOMs), and
    each mixing round is a shuffle-free ``mapPartitions`` returning
    ``n_parts`` tiny weight blobs.  ``n_parts`` bounds the
    per-executor training-shard size — scale it with the corpus and
    the core count.
    """
    import pickle

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    spark = turns.sparkSession
    src = turns.select("conv_id", "turn_idx", F.col(text_col).alias("text"))
    if sample is not None:
        # full-triple order: ties on (conv_id, turn_idx) would
        # otherwise truncate nondeterministically, breaking the
        # byte-identity contract with train_crf_mixed_local (which
        # sorts whole (conv_id, turn_idx, text) triples)
        src = src.orderBy("conv_id", "turn_idx", "text").limit(sample)
    src = src.withColumn(
        "pid",
        (F.crc32(F.col("conv_id").cast("binary")) % n_parts).cast("int"),
    )

    def _prep(it):
        # one shard per partition (identity partitioner); sort matches
        # the single-node twin, then tokenize + gold-encode + extract
        # token features ONCE — all three are round-invariant, so the
        # cached partition carries fit-ready inputs for every round
        from ..kernel.crf import token_features

        rows = sorted(it, key=lambda kv: (kv[1][0], kv[1][1]))
        if rows:
            seqs = [labeled_sequences(tx) for _p, (_c, _t, tx) in rows]
            feats = [
                [token_features(toks, i) for i in range(len(toks))]
                for toks, _tags in seqs
            ]
            yield rows[0][0], seqs, feats

    parted = (
        src.rdd.map(
            lambda r: (
                int(r["pid"]),
                (r["conv_id"], int(r["turn_idx"]), r["text"]),
            )
        )
        .partitionBy(n_parts, lambda pid: pid)
        .mapPartitions(_prep, preservesPartitioning=True)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        model = CRFTagger(entity_types)
        for _round in range(rounds):
            bc = spark.sparkContext.broadcast(model.export())

            def fit_part(it, _bc=bc):
                for pid, seqs, feats in it:
                    m = CRFTagger.from_export(_bc.value)
                    m.fit(seqs, epochs=1, feats_per_seq=feats)
                    yield pid, pickle.dumps(m.export())

            rows = parted.mapPartitions(fit_part).collect()
            bc.destroy()
            blobs = [
                pickle.loads(b)
                for _pid, b in sorted(rows, key=lambda kv: kv[0])
            ]
            model = CRFTagger.average_exports(blobs)
    finally:
        parted.unpersist()
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
