# -*- coding: utf-8 -*-
"""Graph materialization: resolve triple endpoints to canonical node
ids — the final "graph materialize" stage of the north rule (triple
extraction → entity linking → canonicalization → graph).

``materialize_edges`` joins the (subj, pred, obj) triples against the
canonicalization links on (entity_type, normalized text) for both
endpoints, producing an edge table whose endpoints are stable node
ids.  The links side is the distinct-surface table (small relative to
triples), so both joins broadcast; provenance (conv_id, group_id,
triple_idx) is preserved per edge.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .linking import norm_text_col


def materialize_edges(triples: DataFrame, links: DataFrame) -> DataFrame:
    """(subj_node, pred, obj_node, subj, obj, conv_id, group_id,
    triple_idx) — endpoints resolved through the canonical links;
    unlinked surfaces keep their deterministic surface node id, so the
    join is inner and lossless."""
    l_subj = links.select(
        F.col("entity_type").alias("_st"),
        F.col("norm_text").alias("_sn"),
        F.col("node_id").alias("subj_node"),
    )
    l_obj = links.select(
        F.col("entity_type").alias("_ot"),
        F.col("norm_text").alias("_on"),
        F.col("node_id").alias("obj_node"),
    )
    t = triples.withColumn("_sn", norm_text_col(F.col("subj"))).withColumn(
        "_on", norm_text_col(F.col("obj"))
    )
    out = (
        t.join(
            F.broadcast(l_subj),
            (t["subj_type"] == l_subj["_st"]) & (t["_sn"] == l_subj["_sn"]),
            "inner",
        )
        .join(
            F.broadcast(l_obj),
            (t["obj_type"] == l_obj["_ot"]) & (t["_on"] == l_obj["_on"]),
            "inner",
        )
    )
    return out.select(
        "subj_node",
        "pred",
        "obj_node",
        "subj",
        "obj",
        "conv_id",
        "group_id",
        "triple_idx",
    )


def node_degrees(edges: DataFrame) -> DataFrame:
    """Per-node degree summary over the materialized edge table:
    ``(node_id, out_degree, in_degree, degree)`` — the first query a
    KG consumer runs (hub detection, join-fanout estimation, skew
    diagnosis before a traversal).  Two hash aggregates on the node
    id + one join of the two slim aggregate tables; at 100 TB the
    edge table is already orders of magnitude smaller than the
    corpus, and the aggregates reduce it to one row per node, so AQE
    handles the head-entity skew (hub nodes) with map-side partial
    aggregation."""
    out_deg = edges.groupBy(F.col("subj_node").alias("node_id")).agg(
        F.count("*").alias("out_degree")
    )
    in_deg = edges.groupBy(F.col("obj_node").alias("node_id")).agg(
        F.count("*").alias("in_degree")
    )
    j = out_deg.join(in_deg, "node_id", "full_outer")
    return j.select(
        "node_id",
        F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
        F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        (
            F.coalesce("out_degree", F.lit(0))
            + F.coalesce("in_degree", F.lit(0))
        ).alias("degree"),
    )


def edge_weights(edges: DataFrame) -> DataFrame:
    """Collapse multi-edges into weighted canonical edges:
    ``(subj_node, pred, obj_node, n_triples, n_convs)`` — the
    aggregated graph a downstream embedding/traversal consumes
    (n_convs = distinct supporting conversations, the provenance
    weight).  One hash aggregate keyed on the edge triple; skew on
    hub-to-hub edges is bounded by map-side partial aggregation +
    AQE."""
    return edges.groupBy("subj_node", "pred", "obj_node").agg(
        F.count("*").alias("n_triples"),
        F.countDistinct("conv_id").alias("n_convs"),
    )
