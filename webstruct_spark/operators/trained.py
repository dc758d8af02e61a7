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
