# -*- coding: utf-8 -*-
"""Feature stage: exploded clean-token rows + per-token feature struct
+ neighbor Pattern features (G1).

The reference computes features per token dict-at-a-time
(/root/reference/webstruct/feature_extraction.py:135-145) and global
``Pattern`` features by indexing neighbor dicts
(features/global_features.py:61-103).  Here:

* :func:`token_rows` — narrow mapInPandas emitting one row per clean
  token (primitive columns only);
* :func:`with_features` — ONE ``select`` building the full T1-T18
  struct JVM-side (functions/token_features.py);
* :func:`with_pattern` — lag/lead window over (conv_id, turn_idx)
  ordered by tok_idx, concatenating neighbor feature values with the
  reference's exact out-of-range (``?``) / missing (``_NA_``)
  conventions.
"""
from __future__ import annotations

from typing import Iterator, List, Sequence, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.token_features import feature_struct
from ..kernel.bilou import encode_tokens
from ..kernel.tokenize import default_segment_words

TOKEN_ROWS_SCHEMA = (
    "conv_id string, turn_idx int, tok_idx int, token string, "
    "position int, length int, tag string, n_tokens int, "
    "role string, tool string"
)


def token_rows(turns: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per clean token with its IOB2 tag from the inline
    markers (narrow; primitive columns)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                k: []
                for k in (
                    "conv_id turn_idx tok_idx token position length tag "
                    "n_tokens role tool".split()
                )
            }
            for cid, ti, tx, role, tool in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"],
                pdf["role"], pdf["tool"],
            ):
                toks = default_segment_words(tx or "")
                chars = [t[0] for t in toks]
                idx_tags = encode_tokens(chars)
                n = len(idx_tags)
                for k, (i, tag) in enumerate(idx_tags):
                    out["conv_id"].append(cid)
                    out["turn_idx"].append(ti)
                    out["tok_idx"].append(k)
                    out["token"].append(chars[i])
                    out["position"].append(toks[i][1])
                    out["length"].append(toks[i][2])
                    out["tag"].append(tag)
                    out["n_tokens"].append(n)
                    out["role"].append(role)
                    out["tool"].append(tool)
            yield pd.DataFrame(out)

    from .spread import widen_scan

    return widen_scan(
        turns.select("conv_id", "turn_idx", "text", "role", "tool")
    ).mapInPandas(run, TOKEN_ROWS_SCHEMA)


def with_features(tokens: DataFrame) -> DataFrame:
    """Adds the T1-T18 feature struct column (pure Column exprs)."""
    return tokens.withColumn(
        "features",
        feature_struct(
            F.col("token"),
            F.col("tok_idx"),
            F.col("n_tokens"),
            F.col("role"),
            F.col("tool"),
        ),
    )


def pattern_column(
    lookups: Sequence[Tuple[int, str]],
    separator: str = "/",
    out_value: str = "?",
    missing_value: str = "_NA_",
) -> Tuple[str, Column]:
    """(feature_name, Column) for one Pattern conjunction, e.g.
    ``[(-2, 'lower'), (-1, 'lower')]`` → ``lower[-2]/lower[-1]``.

    Reference key/value conventions:
    features/global_features.py:82-103 — out-of-range neighbors yield
    ``?``, missing feature values ``_NA_``; the feature is omitted
    (null here) when ALL values are out-of-range.
    """
    if not lookups:
        raise ValueError(
            "pattern requires at least one (offset, key) lookup"
        )
    w = Window.partitionBy("conv_id", "turn_idx").orderBy("tok_idx")
    keys: List[str] = []
    vals: List[Column] = []
    in_range: List[Column] = []
    for offset, key in lookups:
        if offset == 0:
            keys.append(key)
        elif offset < 0:
            keys.append("%s[%s]" % (key, offset))
        else:
            keys.append("%s[+%s]" % (key, offset))
        base = F.col("features")[key].cast("string")
        shifted = base if offset == 0 else F.lag(base, -offset).over(w)
        rng = (
            F.lit(True)
            if offset == 0
            else F.lag(F.lit(True), -offset, False).over(w)
        )
        vals.append(
            F.when(~rng, F.lit(out_value)).otherwise(
                F.coalesce(shifted, F.lit(missing_value))
            )
        )
        in_range.append(rng)
    all_out = None
    for rng in in_range:
        c = ~rng
        all_out = c if all_out is None else (all_out & c)
    name = separator.join(keys)
    col = F.when(~all_out, F.concat_ws(separator, *vals))
    return name, col


def with_pattern(
    tokens_with_features: DataFrame,
    patterns: Sequence[Sequence[Tuple[int, str]]],
) -> DataFrame:
    df = tokens_with_features
    for lookups in patterns:
        name, col = pattern_column(list(lookups))
        df = df.withColumn(name, col)
    return df
