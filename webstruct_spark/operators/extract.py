# -*- coding: utf-8 -*-
"""Mention extraction: the distributed form of the reference inference
chain tokenize → IOB2-encode → decode → smart_join
(/root/reference/webstruct/model.py:40-50 ``NER.extract``), run per
turn inside ONE Arrow-vectorized pandas UDF.

Scale design:

* The whole chain is narrow (no shuffle): parquet scan → pandas UDF →
  explode.  Catalyst prunes the scan to (conv_id, turn_idx, text).
* The UDF returns per-turn ``n_tokens`` + decoded entity structs ONLY
  — token arrays never leave the Python worker on the hot path, so
  the Arrow exchange carries ~5% of the token volume.
* A separate debug/parity UDF (:func:`tokenize_tags_udf`) exposes the
  full (tokens, tags) arrays for round-trip tests and the detokenize
  sink.
"""
from __future__ import annotations

from typing import List

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..kernel.bilou import decode_mentions, encode_tokens
from ..kernel.smartjoin import smart_join
from ..kernel.tokenize import default_segment_words

# struct returned per turn by the hot-path UDF (explicit StructType:
# DDL strings would need an active SparkContext at import time)
ENTITY_STRUCT = T.StructType(
    [
        T.StructField("entity_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("entity_type", T.StringType()),
        T.StructField("tok_start", T.IntegerType()),
        T.StructField("tok_end", T.IntegerType()),
        T.StructField("first_char", T.IntegerType()),
        T.StructField("last_char", T.IntegerType()),
    ]
)
EXTRACT_TYPE = T.StructType(
    [
        T.StructField("n_tokens", T.IntegerType()),
        T.StructField("entities", T.ArrayType(ENTITY_STRUCT)),
    ]
)

TOKEN_STRUCT = T.StructType(
    [
        T.StructField("chars", T.StringType()),
        T.StructField("position", T.IntegerType()),
        T.StructField("length", T.IntegerType()),
    ]
)
TOKENS_TYPE = T.StructType(
    [
        T.StructField("tokens", T.ArrayType(TOKEN_STRUCT)),
        T.StructField("tags", T.ArrayType(T.StringType())),
    ]
)


def extract_turn_entities(text: str) -> tuple:
    """(n_clean_tokens, [entity dicts]) for one marker-bearing turn."""
    toks = default_segment_words(text or "")
    chars = [t[0] for t in toks]
    idx_tags = encode_tokens(chars)
    clean_chars = [chars[i] for i, _ in idx_tags]
    clean_first = [toks[i][1] for i, _ in idx_tags]
    clean_last = [toks[i][1] + toks[i][2] - 1 for i, _ in idx_tags]
    tags = [t for _, t in idx_tags]
    ents: List[dict] = []
    for items, etype in decode_mentions(list(range(len(clean_chars))), tags):
        text_joined = smart_join(clean_chars[i] for i in items)
        if not text_joined:  # _drop_empty parity (model.py:131-132)
            continue
        ents.append(
            dict(
                entity_idx=len(ents),
                text=text_joined,
                entity_type=etype,
                tok_start=items[0],
                tok_end=items[-1],
                first_char=clean_first[items[0]],
                last_char=clean_last[items[-1]],
            )
        )
    return len(clean_chars), ents


@pandas_udf(EXTRACT_TYPE)
def extract_entities_udf(texts: pd.Series) -> pd.DataFrame:
    n_tokens, entities = [], []
    for t in texts:
        n, e = extract_turn_entities(t)
        n_tokens.append(n)
        entities.append(e)
    return pd.DataFrame({"n_tokens": n_tokens, "entities": entities})


@pandas_udf(TOKENS_TYPE)
def tokenize_tags_udf(texts: pd.Series) -> pd.DataFrame:
    """Parity/debug path: full aligned (tokens, tags) arrays per turn."""
    all_tokens, all_tags = [], []
    for t in texts:
        toks = default_segment_words(t or "")
        chars = [x[0] for x in toks]
        idx_tags = encode_tokens(chars)
        all_tokens.append(
            [
                dict(chars=toks[i][0], position=toks[i][1], length=toks[i][2])
                for i, _ in idx_tags
            ]
        )
        all_tags.append([tag for _, tag in idx_tags])
    return pd.DataFrame({"tokens": all_tokens, "tags": all_tags})


def with_extraction(turns: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``n_tokens`` and ``entities`` columns; narrow (no shuffle)."""
    x = extract_entities_udf(F.col(text_col)).alias("_x")
    return turns.withColumn("_x", x).select(
        *[c for c in turns.columns],
        F.col("_x.n_tokens").alias("n_tokens"),
        F.col("_x.entities").alias("entities"),
    )


def mentions(turns: DataFrame, text_col: str = "text") -> DataFrame:
    """Mentions table: one row per extracted entity occurrence.

    Columns: conv_id, turn_idx, mention_idx, text, entity_type,
    tok_start, tok_end, first_char, last_char.
    """
    ext = turns.select(
        "conv_id",
        "turn_idx",
        extract_entities_udf(F.col(text_col)).alias("_x"),
    )
    e = ext.select(
        "conv_id", "turn_idx", F.explode("_x.entities").alias("m")
    )
    return e.select(
        "conv_id",
        "turn_idx",
        F.col("m.entity_idx").alias("mention_idx"),
        F.col("m.text").alias("text"),
        F.col("m.entity_type").alias("entity_type"),
        F.col("m.tok_start").alias("tok_start"),
        F.col("m.tok_end").alias("tok_end"),
        F.col("m.first_char").alias("first_char"),
        F.col("m.last_char").alias("last_char"),
    )
