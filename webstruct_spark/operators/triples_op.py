# -*- coding: utf-8 -*-
"""Relational triple assembly + groups summary over the group-entity
rows — pure window/aggregate ops (no Python), mirroring
``webstruct_spark.kernel.triples.assemble_triples`` exactly:

subject = min over (type-priority, entity_idx); one triple per other
member: (subj_text, 'has_'+lower(type), member_text); triple_idx
numbers non-subject members in document order.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..kernel.triples import SUBJECT_PRIORITY


def _priority_col():
    c = F.when(F.col("entity_type") == SUBJECT_PRIORITY[0], F.lit(0))
    for i, t in enumerate(SUBJECT_PRIORITY[1:], start=1):
        c = c.when(F.col("entity_type") == t, F.lit(i))
    return c.otherwise(F.lit(len(SUBJECT_PRIORITY)))


def triples(group_entities: DataFrame) -> DataFrame:
    """(conv_id, group_id, triple_idx, subj, pred, obj)."""
    w = Window.partitionBy("conv_id", "group_id")
    ge = group_entities.where(F.col("n_entities") >= 2).withColumn(
        "_prio", _priority_col()
    )
    ge = ge.withColumn(
        "_subj",
        F.min(F.struct("_prio", "entity_idx", "text", "entity_type")).over(w),
    )
    members = ge.where(F.col("entity_idx") != F.col("_subj.entity_idx"))
    wo = Window.partitionBy("conv_id", "group_id").orderBy("entity_idx")
    return members.select(
        "conv_id",
        "group_id",
        (F.row_number().over(wo) - F.lit(1)).cast("int").alias("triple_idx"),
        F.col("_subj.text").alias("subj"),
        F.concat(F.lit("has_"), F.lower("entity_type")).alias("pred"),
        F.col("text").alias("obj"),
        F.col("_subj.entity_type").alias("subj_type"),
        F.col("entity_type").alias("obj_type"),
    )


def groups_summary(group_entities: DataFrame) -> DataFrame:
    """(conv_id, group_id, threshold, n_entities, first_turn) — one row
    per group, matching the gold builder's groups table."""
    return group_entities.groupBy("conv_id", "group_id").agg(
        F.first("threshold").alias("threshold"),
        F.first("n_entities").alias("n_entities"),
        F.min(F.struct("entity_idx", "turn_idx"))["turn_idx"].alias("first_turn"),
    )
