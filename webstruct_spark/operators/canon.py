# -*- coding: utf-8 -*-
"""Canonicalization: connected components over the surface↔canonical
edge list, as iterative DataFrame joins (min-label propagation — the
DataFrame form of small-star/large-star), with periodic
localCheckpoint to cut lineage.

Component id = lexicographic min member key, identical to the
single-node union-find in ``webstruct_spark.kernel.canon`` (gold
builder + fixed-point tests).  On the alias graph components are
stars (diameter ≤ 2) so this converges in 2 iterations, but the
operator is general: near-duplicate or blocking-key edges from the
dedup operators plug into the same loop.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .linking import link_surfaces, mention_surfaces


def surface_key_col(entity_type, norm_text):
    return F.concat(F.lit("t:"), entity_type, F.lit(":"), norm_text)


def connected_components_df(
    vertices: DataFrame,
    edges: DataFrame,
    max_iter: int = 50,
) -> DataFrame:
    """vertices: (node); edges: (src, dst).  Returns (node, label) with
    label = min member key of the node's component.

    Every iteration materializes via localCheckpoint — the convergence
    check re-reads the checkpointed labels instead of re-executing the
    whole join lineage (without this the loop is quadratic in work).
    """
    bidir = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    bidir = bidir.localCheckpoint(eager=True)
    labels = vertices.select(
        F.col("node"), F.col("node").alias("label")
    ).localCheckpoint(eager=True)
    for _i in range(max_iter):
        nbr_min = (
            bidir.join(labels, bidir["src"] == labels["node"])
            .select(bidir["dst"].alias("node"), "label")
            .groupBy("node")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", "label")
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        "connected_components_df did not converge within %d iterations "
        "(component diameter too large) — raise max_iter" % max_iter
    )


def fuzzy_edges(
    surfaces: DataFrame, threshold: float = 0.5, max_block: int = 1000
) -> DataFrame:
    """Near-duplicate surface edges via blocking-key self-join:
    candidates share (entity_type, first token) — the blocking key —
    and are verified by word-shingle Jaccard >= threshold (JVM-side).

    This is the salted/blocked canonicalization join of SURVEY §2.8:
    the self-join only materializes within blocks, hot blocks are
    bounded by ``max_block`` (oversized blocks are dropped and logged
    into the output as nothing — an explicit cap, not a silent skew
    stall; AQE skew-join splits the rest).

    Input: (entity_type, norm_text) distinct surfaces.
    Output: (src, dst) surface-key edges.
    """
    words = F.split(F.col("norm_text"), " ")
    blocked = surfaces.select(
        "entity_type",
        "norm_text",
        F.concat(F.col("entity_type"), F.lit("|"), words[0]).alias("block"),
        F.array_distinct(words).alias("w"),
    )
    sizes = blocked.groupBy("block").agg(F.count(F.lit(1)).alias("bn"))
    blocked = blocked.join(
        F.broadcast(sizes.where(F.col("bn") <= max_block)), "block", "inner"
    )
    a = blocked.alias("a")
    b = blocked.alias("b")
    inter = F.size(F.array_intersect(F.col("a.w"), F.col("b.w")))
    union = (
        F.size(F.col("a.w")) + F.size(F.col("b.w")) - inter
    )
    jac = inter / union
    pairs = (
        a.join(b, F.col("a.block") == F.col("b.block"))
        .where(F.col("a.norm_text") < F.col("b.norm_text"))
        .where(jac >= threshold)
    )
    return pairs.select(
        surface_key_col(F.col("a.entity_type"), F.col("a.norm_text")).alias("src"),
        surface_key_col(F.col("b.entity_type"), F.col("b.norm_text")).alias("dst"),
    )


def canonicalize(
    mentions: DataFrame,
    gazetteer: DataFrame,
    fuzzy: bool = False,
    fuzzy_threshold: float = 0.5,
):
    """Full linking + canonicalization.

    ``fuzzy=True`` additionally merges near-duplicate surfaces
    (blocking-key self-join + Jaccard, :func:`fuzzy_edges`) into the
    same components as the gazetteer-linked edges.

    Returns (links_df, nodes_df):
      links: (entity_type, norm_text, node_id)
      nodes: (node_id, entity_type, canonical_text, n_surfaces,
              n_mentions)
    """
    surfaces = mention_surfaces(mentions)
    linked = link_surfaces(surfaces, gazetteer)
    linked = linked.withColumn(
        "skey", surface_key_col(F.col("entity_type"), F.col("norm_text"))
    )
    edges = linked.where(F.col("canonical_id").isNotNull()).select(
        F.col("skey").alias("src"),
        F.concat(F.lit("g:"), "canonical_id").alias("dst"),
    )
    if fuzzy:
        edges = edges.union(
            fuzzy_edges(
                linked.select("entity_type", "norm_text"),
                threshold=fuzzy_threshold,
            )
        )
    vertices = linked.select(F.col("skey").alias("node")).union(
        edges.select(F.col("dst").alias("node"))
    ).distinct()
    labels = connected_components_df(vertices, edges)

    links = linked.join(labels, linked["skey"] == labels["node"]).select(
        "entity_type",
        "norm_text",
        F.col("label").alias("node_id"),
        "n_mentions",
    )
    nodes = links.groupBy("node_id").agg(
        F.min(F.struct("entity_type", "norm_text"))["entity_type"].alias(
            "entity_type"
        ),
        F.min("norm_text").alias("canonical_text"),
        F.count(F.lit(1)).cast("int").alias("n_surfaces"),
        F.sum("n_mentions").alias("n_mentions"),
    )
    return links.select("entity_type", "norm_text", "node_id"), nodes
