# -*- coding: utf-8 -*-
"""Entity linking: mention surfaces ⋈ broadcast gazetteer.

The reference's gazetteer lookup is a trie held in every worker
(/root/reference/webstruct/features/global_features.py:7-58); its
relational form is exactly a broadcast hash join on the normalized
alias — small build side, no shuffle of the mention stream.

Head-entity skew (a few aliases covering most mentions) is inert here
because the dictionary is broadcast and the probe side is aggregated
per (entity_type, norm_text) BEFORE the join — the two-stage
aggregation pattern: partial per-partition counts, merge, then one
joined row per distinct surface regardless of how hot it is.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def norm_text_col(c: Column) -> Column:
    """Spark twin of kernel.canon.norm_text (lower + trim + collapse
    whitespace)."""
    return F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))


def normalized_gazetteer(gazetteer: DataFrame) -> DataFrame:
    """(entity_type, norm_alias, canonical_id) — min(canonical_id) on
    normalization collisions, matching kernel.canon.link_edges."""
    return (
        gazetteer.select(
            "entity_type",
            norm_text_col(F.col("alias")).alias("norm_alias"),
            "canonical_id",
        )
        .groupBy("entity_type", "norm_alias")
        .agg(F.min("canonical_id").alias("canonical_id"))
    )


def mention_surfaces(mentions: DataFrame) -> DataFrame:
    """Distinct (entity_type, norm_text) with mention counts — the
    partial-aggregate stage that neutralizes head-entity skew."""
    return (
        mentions.select(
            "entity_type", norm_text_col(F.col("text")).alias("norm_text")
        )
        .groupBy("entity_type", "norm_text")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
    )


def link_surfaces(surfaces: DataFrame, gazetteer: DataFrame) -> DataFrame:
    """Left-join surfaces to the broadcast alias dictionary.

    Output: (entity_type, norm_text, n_mentions, canonical_id nullable).
    """
    gaz = normalized_gazetteer(gazetteer)
    return surfaces.join(
        F.broadcast(gaz),
        on=[
            surfaces["entity_type"] == gaz["entity_type"],
            surfaces["norm_text"] == gaz["norm_alias"],
        ],
        how="left",
    ).select(
        surfaces["entity_type"],
        surfaces["norm_text"],
        surfaces["n_mentions"],
        gaz["canonical_id"],
    )
