# -*- coding: utf-8 -*-
"""Round-trip annotation sink (K1): rebuild marker-annotated turn text
from (tokens, tags) — the transcript analog of ``detokenize_single``
(/root/reference/webstruct/html_tokenizer.py:185-260), which re-inserts
`` __START_X__ / __END_X__ `` around tagged runs.

Contract (pytest-gated): re-extracting the reconstructed text yields
exactly the same (token, tag) stream — encode(detokenize(tokens, tags))
== tags — even though whitespace around markers is normalized rather
than byte-identical to an original annotated source.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..kernel.bilou import group_tags


def annotate_text(
    tokens: Sequence[Tuple[str, int, int]], tags: Sequence[str], text: str
) -> str:
    """Insert markers into ``text`` at the exact char offsets of the
    tagged token runs (offsets from the tokenizer are positions into
    ``text``)."""
    pieces: List[Tuple[int, str]] = []  # (position, marker)
    data = list(zip(tokens, tags))
    for items, tag in group_tags(data):
        if tag == "O":
            continue
        first = items[0]
        last = items[-1]
        pieces.append((first[1], " __START_%s__ " % tag))
        pieces.append((last[1] + last[2], " __END_%s__ " % tag))
    out = []
    prev = 0
    for pos, marker in sorted(pieces, key=lambda x: x[0]):
        out.append(text[prev:pos])
        out.append(marker)
        prev = pos
    out.append(text[prev:])
    return "".join(out)


@pandas_udf(T.StringType())
def annotate_udf(texts: pd.Series, tokens: pd.Series, tags: pd.Series) -> pd.Series:
    out = []
    for text, toks, tgs in zip(texts, tokens, tags):
        tok_tuples = [(t["chars"], t["position"], t["length"]) for t in toks]
        out.append(annotate_text(tok_tuples, list(tgs), text or ""))
    return pd.Series(out)


def annotated_turns(turns_with_tokens: DataFrame,
                    text_col: str = "plain_text") -> DataFrame:
    """Sink: (conv_id, turn_idx, annotated_text) from a DataFrame with
    ``tokens``/``tags`` arrays and the plain text column."""
    return turns_with_tokens.select(
        "conv_id",
        "turn_idx",
        annotate_udf(F.col(text_col), "tokens", "tags").alias("annotated_text"),
    )
