# -*- coding: utf-8 -*-
"""Custom stateful streaming operator: per-conversation running
mention statistics via ``applyInPandasWithState``.

The batch pipeline groups a conversation once it is fully ingested;
the streaming form maintains per-conversation state across
micro-batches — mention count, distinct entity types seen, last turn
index — and emits the updated row for every conversation touched by a
batch (Update output mode).  This is the streaming-native analog of
the reference's per-document accumulation, with state keyed exactly
like the batch shuffle (conv_id).

State is a flat tuple (counts + a comma-joined type set) so it stays
Arrow-serializable and bounded per conversation.
"""
from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_mentions", T.LongType()),
        T.StructField("n_types", T.IntegerType()),
        T.StructField("types", T.StringType()),
        T.StructField("last_turn", T.IntegerType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_mentions", T.LongType()),
        T.StructField("types", T.StringType()),
        T.StructField("last_turn", T.IntegerType()),
    ]
)


def _update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n_mentions, types_str, last_turn = state.get
        types = set(types_str.split(",")) if types_str else set()
    else:
        n_mentions, types, last_turn = 0, set(), -1
    for pdf in pdfs:
        n_mentions += len(pdf)
        types |= set(pdf["entity_type"].dropna())
        if len(pdf):
            last_turn = max(last_turn, int(pdf["turn_idx"].max()))
    types_str = ",".join(sorted(types))
    state.update((n_mentions, types_str, last_turn))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "n_mentions": [n_mentions],
            "n_types": [len(types)],
            "types": [types_str],
            "last_turn": [last_turn],
        }
    )


def conversation_state_stream(turn_stream: DataFrame) -> DataFrame:
    """Streaming per-conversation running mention stats (Update mode).

    Input: streaming transcripts; mentions are extracted with the same
    narrow operator as batch, then fed into the stateful update.
    """
    from ..operators.extract import extract_rows

    ments = extract_rows(turn_stream).where(F.col("mention_idx") >= 0)
    return ments.groupBy("conv_id").applyInPandasWithState(
        _update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
