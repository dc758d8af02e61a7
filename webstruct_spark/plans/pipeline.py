# -*- coding: utf-8 -*-
"""The full KG-construction pipeline: transcripts → extracted turns →
mentions → group entities → groups/triples → links/nodes, each stage a
committed parquet table with manifest lineage.

Stage DAG (all reads are from the previous stage's committed table, so
a resumed run never recomputes upstream work):

  extracted   narrow scan+UDF over transcripts (tokenize+encode+decode)
  mentions    explode of extracted entities (narrow)
  group_entities  ONE shuffle by conv_id (entities + token counts only)
  groups      hash aggregate over group_entities
  triples     window ops over group_entities
  links,nodes broadcast gazetteer join + connected components

At 100 TB: `extracted` is the dominant stage and is embarrassingly
parallel; its output is ~5-10% of input bytes (entities only).  The
single wide dependency is group_entities' shuffle keyed by conv_id,
whose payload is the already-slim entity structs.  Everything after
operates on mention/entity tables that are orders of magnitude smaller
than the corpus.
"""
from __future__ import annotations

import os
import time
from typing import Dict, List, Optional, Sequence

from pyspark.sql import SparkSession

from ..concurrency import run_concurrent_jobs
from ..operators.canon import canonicalize
from ..operators.extract import extract_rows, mentions_from_rows
from ..operators.grouping_op import DEFAULT_DONT_PENALIZE, group_entities
from ..operators.triples_op import groups_summary, triples as triples_op
from .manifest import Manifest

from pyspark.sql import functions as F

# bump when any stage table's schema/layout changes: resuming into an
# older layout rebuilds instead of serving stale outputs
LAYOUT_VERSION = "3-graph-edges"

STAGES = [
    "extracted",
    "mentions",
    "group_entities",
    "groups",
    "triples",
    "links",
    "nodes",
    "edges",
]


def build_kg(
    spark: SparkSession,
    corpus_dir: str,
    out_dir: str,
    resume: bool = True,
    dont_penalize=DEFAULT_DONT_PENALIZE,
    stage_concurrency: int = 4,
) -> Dict[str, str]:
    """Run (or resume) the staged build. Returns stage -> output path.

    ``stage_concurrency``: independent stages of the DAG run as
    concurrent Spark jobs from driver threads (1 = strict sequential).
    mentions ∥ group_entities once `extracted` commits, then
    groups ∥ triples ∥ canonicalize — safe because every stage reads
    only COMMITTED upstream parquet (immutable once written), writes
    its own directory, and manifest appends are lock-serialized.  The
    win is the same as domain_cv's fold concurrency: canonicalize is
    an iterative driver-barrier loop (large-star/small-star rounds)
    whose executor gaps the groups/triples scans fill; on a cluster
    the scheduler's FIFO interleave of independent jobs does the same.
    Tasks are submitted in topological order, so a worker can only
    block on futures submitted earlier — no deadlock at any pool
    size ≥ 1 (see :func:`..concurrency.run_concurrent_jobs`, which
    also cancels queued stages AND interrupts in-flight sibling Spark
    jobs on the first stage failure)."""
    man = Manifest(out_dir, layout_version=LAYOUT_VERSION)

    def committed(stage: str) -> bool:
        return resume and man.is_committed(stage)

    STAGE_INPUTS = {
        "extracted": ["transcripts"],
        "mentions": ["extracted"],
        "group_entities": ["extracted"],
        "groups": ["group_entities"],
        "triples": ["group_entities"],
        "links": ["mentions", "gazetteer"],
        "nodes": ["mentions", "gazetteer"],
        "edges": ["triples", "links"],
    }

    def run_stage(stage: str, df_builder) -> str:
        path = man.stage_path(stage)
        if committed(stage):
            return path
        t0 = time.time()
        df = df_builder()
        df.write.mode("overwrite").parquet(path)
        man.commit(stage, time.time() - t0, inputs=STAGE_INPUTS.get(stage))
        return path

    transcripts = spark.read.parquet(
        os.path.join(corpus_dir, "transcripts.parquet")
    )
    gazetteer = spark.read.parquet(
        os.path.join(corpus_dir, "gazetteer.parquet")
    )

    # -- stage tasks (each waits on its deps' futures, then builds) ----
    futs: Dict[str, object] = {}

    def _dep(name: str) -> str:
        f = futs[name]
        return f if isinstance(f, str) else f.result()

    def t_extracted() -> str:
        return run_stage("extracted", lambda: extract_rows(transcripts))

    def t_mentions() -> str:
        ex = spark.read.parquet(_dep("extracted"))
        return run_stage("mentions", lambda: mentions_from_rows(ex))

    def t_group_entities() -> str:
        ex = spark.read.parquet(_dep("extracted"))
        return run_stage(
            "group_entities",
            lambda: group_entities(ex, dont_penalize=dont_penalize),
        )

    def t_groups() -> str:
        ge = spark.read.parquet(_dep("group_entities"))
        return run_stage("groups", lambda: groups_summary(ge))

    def t_triples() -> str:
        ge = spark.read.parquet(_dep("group_entities"))
        return run_stage("triples", lambda: triples_op(ge))

    def t_canon() -> str:
        # links+nodes share one canonicalize() computation, so they
        # commit as one task; returns the links path (nodes path is
        # man.stage_path("nodes")).
        if not (committed("links") and committed("nodes")):
            mentions_df = spark.read.parquet(_dep("mentions"))
            links_df, nodes_df = canonicalize(mentions_df, gazetteer)
            t0 = time.time()
            if not committed("links"):
                links_df.write.mode("overwrite").parquet(
                    man.stage_path("links")
                )
                man.commit("links", time.time() - t0,
                           inputs=STAGE_INPUTS["links"])
            t0 = time.time()
            if not committed("nodes"):
                nodes_df.write.mode("overwrite").parquet(
                    man.stage_path("nodes")
                )
                man.commit("nodes", time.time() - t0,
                           inputs=STAGE_INPUTS["nodes"])
        return man.stage_path("links")

    def t_edges() -> str:
        from ..operators.graph import materialize_edges

        links_tbl = spark.read.parquet(_dep("canon"))
        triples_tbl = spark.read.parquet(_dep("triples"))
        return run_stage(
            "edges", lambda: materialize_edges(triples_tbl, links_tbl)
        )

    # topological submission order (every task's deps appear earlier)
    TASKS = [
        ("extracted", t_extracted),
        ("mentions", t_mentions),
        ("group_entities", t_group_entities),
        ("groups", t_groups),
        ("triples", t_triples),
        ("canon", t_canon),
        ("edges", t_edges),
    ]

    run_concurrent_jobs(
        spark, TASKS, max(1, int(stage_concurrency)), futs=futs
    )

    paths = {name: _dep(name) for name, _fn in TASKS if name != "canon"}
    paths["links"] = man.stage_path("links")
    paths["nodes"] = man.stage_path("nodes")
    return paths
