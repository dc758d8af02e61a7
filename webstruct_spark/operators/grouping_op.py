# -*- coding: utf-8 -*-
"""Distributed entity grouping (record assembly).

Implements the reference grouping algorithm
(/root/reference/webstruct/grouping.py:46-137) per conversation with
ONE shuffle, and that shuffle carries only per-turn entity structs +
token counts — never token arrays:

1. narrow stage (extract.py) computes per turn: ``n_tokens`` and the
   decoded entities with turn-local token spans;
2. ``groupBy(conv_id).applyInPandas`` receives the per-turn rows,
   reconstructs global token positions with the closed form
   ``pos = 2*g + 3*k`` (g = clean tokens before, k = rank among
   token-bearing turns — a turn that produced no tokens does not bump
   the element counter, matching the reference's element-change rule),
   then runs the pinned threshold-argmax kernel.

Skew note: a mega-conversation is one group task; its cost is
O(#entities²) in the worst case (threshold candidates × scan), which
for 10^4 entities is still sub-second numpy/python work — the heavy
token processing stayed in the narrow stage.  AQE coalesces the many
small conversation partitions.
"""
from __future__ import annotations

from typing import Iterable, Optional, Set

import pandas as pd
from pyspark.sql import DataFrame

from ..kernel.grouping import best_clustering_entities, token_position

GROUP_ENTITIES_SCHEMA = (
    "conv_id string, group_id string, group_idx int, entity_idx int, "
    "text string, entity_type string, turn_idx int, threshold int, "
    "score int, n_entities int"
)

DEFAULT_DONT_PENALIZE: Set[str] = {"TEL", "FAX"}


def _make_grouper(dont_penalize: Optional[Set[str]]):
    dp = set(dont_penalize or ())

    def group_conversation(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("turn_idx")
        conv_id = pdf["conv_id"].iloc[0]
        entities = []  # ((text, turn_idx), entity_type) kernel infos
        spans = []
        g = 0  # clean tokens so far in conversation
        k = -1  # rank among token-bearing turns
        for turn_idx, n_tok, ents in zip(
            pdf["turn_idx"], pdf["n_tokens"], pdf["entities"]
        ):
            if n_tok and n_tok > 0:
                k += 1
            if ents is None:
                ents = ()
            for e in ents:
                entities.append(((e["text"], int(turn_idx)), e["entity_type"]))
                spans.append(
                    (
                        token_position(g + e["tok_start"], k),
                        token_position(g + e["tok_end"], k),
                    )
                )
            g += int(n_tok or 0)

        out = dict(
            conv_id=[], group_id=[], group_idx=[], entity_idx=[], text=[],
            entity_type=[], turn_idx=[], threshold=[], score=[], n_entities=[],
        )
        if entities:
            thr, score, clusters = best_clustering_entities(
                entities, spans, dont_penalize=dp
            )
            for gi, cluster in enumerate(clusters):
                members = [
                    (info[0], etype, info[1])
                    for info, etype, _dist in cluster
                    if info[0]  # _drop_empty parity
                ]
                if not members:
                    continue
                group_id = "%s:g%04d" % (conv_id, gi)
                for ei, (text, etype, turn_idx) in enumerate(members):
                    out["conv_id"].append(conv_id)
                    out["group_id"].append(group_id)
                    out["group_idx"].append(gi)
                    out["entity_idx"].append(ei)
                    out["text"].append(text)
                    out["entity_type"].append(etype)
                    out["turn_idx"].append(turn_idx)
                    out["threshold"].append(int(thr))
                    out["score"].append(int(score))
                    out["n_entities"].append(len(members))
        return pd.DataFrame(out)

    return group_conversation


def group_entities(
    extracted_turns: DataFrame,
    dont_penalize: Optional[Iterable[str]] = DEFAULT_DONT_PENALIZE,
) -> DataFrame:
    """Per-conversation grouping.

    Input: DataFrame with (conv_id, turn_idx, n_tokens, entities) from
    :func:`webstruct_spark.operators.extract.with_extraction`.
    Output: one row per (group, member entity) —
    ``GROUP_ENTITIES_SCHEMA``.
    """
    slim = extracted_turns.select("conv_id", "turn_idx", "n_tokens", "entities")
    return slim.groupBy("conv_id").applyInPandas(
        _make_grouper(set(dont_penalize or ())), GROUP_ENTITIES_SCHEMA
    )
