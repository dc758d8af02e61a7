# -*- coding: utf-8 -*-
"""Model-based tagging path: Viterbi decode per turn over plain
(marker-stripped) text, with the rule/gazetteer score model broadcast
to executors — the distributed form of ``model.predict([html_tokens])``
(/root/reference/webstruct/model.py:60-68), one Arrow batch at a time.

The marker path (operators/extract.py) is the parity tagger; this path
exists for unlabeled data and is gated by segment F1 against gold
(like the reference CI gate, tests/test_crfsuite.py:46-60) rather than
exact parity.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..kernel.bilou import classify_token, decode_mentions
from ..kernel.smartjoin import smart_join
from ..kernel.tokenize import default_segment_words
from ..kernel.viterbi import RuleModel

PRED_MENTION_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("mention_idx", T.IntegerType()),
            T.StructField("text", T.StringType()),
            T.StructField("entity_type", T.StringType()),
            T.StructField("tok_start", T.IntegerType()),
            T.StructField("tok_end", T.IntegerType()),
        ]
    )
)

DEFAULT_TYPES = (
    "ORG", "PER", "CITY", "STATE", "ZIPCODE", "COUNTRY",
    "STREET", "TEL", "FAX", "EMAIL",
)


# worker-level model cache: RuleModel compilation (LongestMatcher
# prefilter over the whole gazetteer) happens once per executor per
# broadcast, not once per Arrow batch
_MODEL_CACHE: Dict[int, RuleModel] = {}


def _model_for(bc, key) -> RuleModel:
    model = _MODEL_CACHE.get(key)
    if model is None:
        amap, types = bc.value
        model = RuleModel(amap, types)
        _MODEL_CACHE.clear()  # old broadcasts are dead weight
        _MODEL_CACHE[key] = model
    return model


def plain_tokens(text: str) -> List[str]:
    """Marker-free token stream (what an unlabeled turn looks like)."""
    out = []
    for chars, _pos, _len in default_segment_words(text or ""):
        kind, _val = classify_token(chars)
        if kind == "token":
            out.append(chars)
    return out


def tagged_mentions(
    turns: DataFrame,
    gazetteer: DataFrame,
    entity_types: Sequence[str] = DEFAULT_TYPES,
    text_col: str = "text",
) -> DataFrame:
    """Predict mentions on plain text via the broadcast rule model.

    Output: (conv_id, turn_idx, mention_idx, text, entity_type,
    tok_start, tok_end).
    """
    spark = turns.sparkSession
    gaz_rows = gazetteer.select("alias", "entity_type").collect()
    alias_map: Dict[str, str] = {}
    for r in gaz_rows:
        # deterministic on collisions: keep lexicographically smaller type
        a = r["alias"]
        if a not in alias_map or r["entity_type"] < alias_map[a]:
            alias_map[a] = r["entity_type"]
    bc = spark.sparkContext.broadcast((alias_map, tuple(entity_types)))
    # driver-side cache key, stable for this broadcast's lifetime
    cache_key = "tag-%d-%d-%d" % (id(alias_map), len(alias_map),
                                  len(entity_types))

    @pandas_udf(PRED_MENTION_TYPE)
    def predict_udf(texts: pd.Series) -> pd.Series:
        model = _model_for(bc, cache_key)
        out = []
        for t in texts:
            toks = plain_tokens(t)
            tags = model.predict(toks)
            ments = []
            for items, etype in decode_mentions(
                list(range(len(toks))), tags
            ):
                ments.append(
                    dict(
                        mention_idx=len(ments),
                        text=smart_join(toks[i] for i in items),
                        entity_type=etype,
                        tok_start=items[0],
                        tok_end=items[-1],
                    )
                )
            out.append(ments)
        return pd.Series(out)

    return (
        turns.select(
            "conv_id", "turn_idx", F.explode(predict_udf(text_col)).alias("m")
        )
        .select(
            "conv_id",
            "turn_idx",
            F.col("m.mention_idx").alias("mention_idx"),
            F.col("m.text").alias("text"),
            F.col("m.entity_type").alias("entity_type"),
            F.col("m.tok_start").alias("tok_start"),
            F.col("m.tok_end").alias("tok_end"),
        )
    )


def token_confusion(
    turns: DataFrame,
    gazetteer: DataFrame,
    entity_types: Sequence[str] = DEFAULT_TYPES,
    text_col: str = "text",
) -> DataFrame:
    """M8 analog (reference metrics.py:97-109): token-level
    (gold_tag, pred_tag) confusion counts.  The marker-derived gold
    tags and the model-predicted tags align token-for-token because
    both tag the marker-free clean token stream."""
    spark = turns.sparkSession
    gaz_rows = gazetteer.select("alias", "entity_type").collect()
    alias_map: Dict[str, str] = {}
    for r in gaz_rows:
        a = r["alias"]
        if a not in alias_map or r["entity_type"] < alias_map[a]:
            alias_map[a] = r["entity_type"]
    bc = spark.sparkContext.broadcast((alias_map, tuple(entity_types)))
    cache_key = "conf-%d-%d-%d" % (id(alias_map), len(alias_map),
                                   len(entity_types))

    from ..kernel.bilou import encode_tokens
    from ..kernel.tokenize import default_segment_words

    pair_type = T.ArrayType(
        T.StructType(
            [
                T.StructField("tag_gold", T.StringType()),
                T.StructField("tag_pred", T.StringType()),
            ]
        )
    )

    @pandas_udf(pair_type)
    def confusion_udf(texts: pd.Series) -> pd.Series:
        model = _model_for(bc, cache_key)
        out = []
        for t in texts:
            toks = default_segment_words(t or "")
            chars = [x[0] for x in toks]
            idx_tags = encode_tokens(chars)
            clean = [chars[i] for i, _ in idx_tags]
            gold = [tag for _, tag in idx_tags]
            pred = model.predict(clean)
            out.append(
                [dict(tag_gold=g, tag_pred=p) for g, p in zip(gold, pred)]
            )
        return pd.Series(out)

    pairs = turns.select(F.explode(confusion_udf(text_col)).alias("p"))
    return pairs.groupBy(
        F.col("p.tag_gold").alias("tag_gold"),
        F.col("p.tag_pred").alias("tag_pred"),
    ).agg(F.count(F.lit(1)).alias("n_tokens"))
