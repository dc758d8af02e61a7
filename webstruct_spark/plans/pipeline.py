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

from pyspark.sql import DataFrame, SparkSession

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
) -> Dict[str, str]:
    """Run (or resume) the staged build. Returns stage -> output path."""
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

    paths: Dict[str, str] = {}

    paths["extracted"] = run_stage(
        "extracted", lambda: extract_rows(transcripts)
    )
    extracted = spark.read.parquet(paths["extracted"])

    paths["mentions"] = run_stage(
        "mentions", lambda: mentions_from_rows(extracted)
    )
    mentions_df = spark.read.parquet(paths["mentions"])

    paths["group_entities"] = run_stage(
        "group_entities",
        lambda: group_entities(extracted, dont_penalize=dont_penalize),
    )
    ge = spark.read.parquet(paths["group_entities"])

    paths["groups"] = run_stage("groups", lambda: groups_summary(ge))
    paths["triples"] = run_stage("triples", lambda: triples_op(ge))

    if not (committed("links") and committed("nodes")):
        links_df, nodes_df = canonicalize(mentions_df, gazetteer)
        t0 = time.time()
        if not committed("links"):
            links_df.write.mode("overwrite").parquet(man.stage_path("links"))
            man.commit("links", time.time() - t0,
                       inputs=STAGE_INPUTS["links"])
        t0 = time.time()
        if not committed("nodes"):
            nodes_df.write.mode("overwrite").parquet(man.stage_path("nodes"))
            man.commit("nodes", time.time() - t0,
                       inputs=STAGE_INPUTS["nodes"])
    paths["links"] = man.stage_path("links")
    paths["nodes"] = man.stage_path("nodes")

    links_tbl = spark.read.parquet(paths["links"])
    triples_tbl = spark.read.parquet(paths["triples"])

    def edges_builder() -> DataFrame:
        from ..operators.graph import materialize_edges

        return materialize_edges(triples_tbl, links_tbl)

    paths["edges"] = run_stage("edges", edges_builder)
    return paths
