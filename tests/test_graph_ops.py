# -*- coding: utf-8 -*-
"""Graph-consumer operators over the materialized edge table
(operators/graph.py): degree summary and weighted edge collapse."""
from webstruct_spark.operators.graph import edge_weights, node_degrees


def _edges(spark):
    rows = [
        # (subj_node, pred, obj_node, subj, obj, conv_id, group_id, ti)
        ("A", "has_tel", "B", "Acme", "555", "c1", "c1:g0", 0),
        ("A", "has_tel", "B", "Acme", "555", "c2", "c2:g0", 0),
        ("A", "has_tel", "B", "Acme", "555-0", "c2", "c2:g1", 1),
        ("A", "has_email", "C", "Acme", "a@x", "c1", "c1:g0", 1),
        ("B", "has_org", "A", "555", "Acme", "c3", "c3:g0", 0),
        ("D", "has_tel", "B", "Dyn", "555", "c3", "c3:g0", 1),
    ]
    return spark.createDataFrame(
        rows,
        "subj_node string, pred string, obj_node string, subj string,"
        " obj string, conv_id string, group_id string, triple_idx int",
    )


def test_node_degrees(spark):
    got = {
        r["node_id"]: (r["out_degree"], r["in_degree"], r["degree"])
        for r in node_degrees(_edges(spark)).collect()
    }
    # C appears only as an object, D only as a subject — both must
    # still get a row (full-outer with zero fill)
    assert got == {
        "A": (4, 1, 5),
        "B": (1, 4, 5),
        "C": (0, 1, 1),
        "D": (1, 0, 1),
    }


def test_edge_weights(spark):
    got = {
        (r["subj_node"], r["pred"], r["obj_node"]):
            (r["n_triples"], r["n_convs"])
        for r in edge_weights(_edges(spark)).collect()
    }
    # the A-has_tel-B multi-edge: 3 triples across 2 conversations
    assert got[("A", "has_tel", "B")] == (3, 2)
    assert got[("A", "has_email", "C")] == (1, 1)
    assert got[("B", "has_org", "A")] == (1, 1)
    assert got[("D", "has_tel", "B")] == (1, 1)
    assert len(got) == 4


def test_unmatched_triple_endpoints(spark):
    """The monitoring companion of materialize_edges: links from a
    DIFFERENT corpus state -> the inner joins drop edges silently,
    and this check names exactly the dropped endpoints; links in
    lockstep -> empty."""
    from webstruct_spark.operators.graph import (
        materialize_edges,
        unmatched_triple_endpoints,
    )
    from webstruct_spark.operators.linking import norm_text_col
    from pyspark.sql import functions as F

    triples = spark.createDataFrame(
        [
            ("c1", "c1:g0", 0, "Acme Corp", "ORG", "has_tel",
             "555-0100", "TEL"),
            ("c1", "c1:g0", 1, "Acme Corp", "ORG", "has_city",
             "Austin", "CITY"),
        ],
        "conv_id string, group_id string, triple_idx int, subj string,"
        " subj_type string, pred string, obj string, obj_type string",
    )
    surfaces = triples.select(
        F.col("subj_type").alias("entity_type"),
        norm_text_col(F.col("subj")).alias("norm_text"),
    ).unionByName(
        triples.select(
            F.col("obj_type").alias("entity_type"),
            norm_text_col(F.col("obj")).alias("norm_text"),
        )
    ).distinct()
    links_full = surfaces.withColumn(
        "node_id", F.concat_ws(":", "entity_type", "norm_text")
    )
    # lockstep links: no drops, edges cover every triple
    assert unmatched_triple_endpoints(triples, links_full).count() == 0
    assert materialize_edges(triples, links_full).count() == 2
    # stale links missing the CITY surface: the edge silently drops
    # from materialize_edges, and the check names it
    links_stale = links_full.where(F.col("entity_type") != "CITY")
    assert materialize_edges(triples, links_stale).count() == 1
    missing = unmatched_triple_endpoints(triples, links_stale).collect()
    assert [(r["endpoint"], r["entity_type"], r["text"], r["triple_idx"])
            for r in missing] == [("obj", "CITY", "Austin", 1)]


def test_check_kg_links_audit(spark, corpus_dir, tmp_path):
    """check_kg_links over a real build: zero uncovered endpoints on
    the in-pipeline tables; after an out-of-band links overwrite that
    drops one entity type, the audit counts and names the dropped
    endpoints; an uncommitted stage yields a structured refusal
    report (auditing it would prove nothing, but the refusal still
    carries the crash-vs-deletion diagnosis); the exit-code taxonomy
    (0 healthy / 3 dirty-or-unauditable / 4 covered-but-torn) is
    pinned via the factored check_links_rc."""
    import json
    import os
    import shutil

    from pyspark.sql import functions as F

    from webstruct_spark.plans.pipeline import build_kg, check_kg_links

    out = str(tmp_path / "kg")
    paths = build_kg(spark, corpus_dir, out)
    clean = check_kg_links(spark, out)
    assert clean["uncovered"] == 0
    assert clean["by_endpoint"] == {}
    assert clean["sample"] == []

    # a healthy report still carries the full diagnosis schema (a
    # consumer must never KeyError on the common all-clear case)
    assert clean["pending_intent_count"] == 0
    assert clean["torn"] is False and clean["probable_cause"] is None
    assert clean["audited"] is True and clean["not_committed"] == []

    from jobs.kg_build import check_links_rc

    assert check_links_rc(clean) == 0

    # out-of-band surgery: rewrite links without one entity type —
    # exactly the stale-links shape the audit exists to make loud.
    # Pick the type DETERMINISTICALLY from the triples' own endpoint
    # types (min over distinct), not links.first(): first() on an
    # unordered scan is partition-order-dependent and could select a
    # type that never appears as a triple endpoint, making the prune
    # a no-op
    triples = spark.read.parquet(paths["triples"])
    etype = min(
        r["t"]
        for r in triples.select(F.col("subj_type").alias("t"))
        .unionAll(triples.select(F.col("obj_type").alias("t")))
        .distinct()
        .collect()
    )
    # independent expected count: the join keys are (entity_type,
    # norm_text), so pruning every etype link uncovers exactly the
    # triple endpoints of that type — computed here from the triples
    # table alone, NOT from the audit's own groupBy
    expected = (
        triples.where(F.col("subj_type") == etype).count()
        + triples.where(F.col("obj_type") == etype).count()
    )
    assert expected > 0
    links = spark.read.parquet(paths["links"]).cache()
    links.count()
    pruned = links.where(F.col("entity_type") != etype)
    shutil.rmtree(paths["links"])
    pruned.write.parquet(paths["links"])
    links.unpersist()  # session-scoped spark — don't pin storage
    # the commit's _SUCCESS is recreated by the overwrite write, so
    # the manifest predicate still passes — this is a pure DATA tear
    got = check_kg_links(spark, out)
    assert got["uncovered"] == expected
    assert set(got["by_endpoint"]) <= {"subj", "obj"}
    assert 0 < len(got["sample"]) <= 20
    assert all(r["entity_type"] == etype for r in got["sample"])
    # no pending intents, no identity tear → the diagnosis must name
    # out-of-band modification, not a crashed maintenance run
    assert got["pending_intent_count"] == 0 and got["torn"] is False
    assert got["probable_cause"].startswith("out-of-band")
    assert check_links_rc(got) == 3

    # the CLI contract a scheduler alerts on: a dirty audit must FAIL
    # the process (exit 3 — distinguishable from argparse's 2 and a
    # crash's 1), not just print JSON; rc-based monitors never parse
    # stdout.  One subprocess (own JVM) — the only way to observe the
    # real exit code without stopping the shared fixture session
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [_sys.executable, os.path.join(repo, "jobs", "kg_build.py"),
         "--out", out, "--check-links", "--cores", "2"],
        capture_output=True, text=True, timeout=600, cwd=repo,
    )
    assert proc.returncode == 3, proc.stderr[-2000:]
    cli_report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert cli_report["uncovered"] == expected

    # with a pending write-ahead intent the SAME uncovered rows must
    # be diagnosed as a crashed maintenance run (fix = resume it),
    # not as table surgery
    from webstruct_spark.plans.manifest import Manifest
    from webstruct_spark.plans.pipeline import LAYOUT_VERSION

    man = Manifest(out, layout_version=LAYOUT_VERSION, spark=spark)
    intent = man.write_intent("triples", [], None)
    try:
        crashed = check_kg_links(spark, out)
        assert crashed["uncovered"] == got["uncovered"]
        assert crashed["pending_intent_count"] == 1
        assert crashed["probable_cause"].startswith("crashed append")
        assert check_links_rc(crashed) == 3  # uncovered wins over torn
    finally:
        man.clear_intent(intent)

    # covered-but-pending (a crashed maintenance run whose links
    # still cover every endpoint, or a live append racing the audit)
    # must be rc-alertable too — rc 4, distinct from dirty's 3
    from webstruct_spark.operators.linking import norm_text_col

    shutil.rmtree(paths["links"])
    (
        triples.select(
            F.col("subj_type").alias("entity_type"),
            norm_text_col(F.col("subj")).alias("norm_text"),
        )
        .unionAll(
            triples.select(
                F.col("obj_type").alias("entity_type"),
                norm_text_col(F.col("obj")).alias("norm_text"),
            )
        )
        .distinct()
        .withColumn(
            "node_id", F.concat_ws("|", "entity_type", "norm_text")
        )
        .write.parquet(paths["links"])
    )
    intent = man.write_intent("edges", [], None)
    try:
        covered = check_kg_links(spark, out)
        assert covered["uncovered"] == 0
        assert covered["pending_intent_count"] == 1
        assert check_links_rc(covered) == 4
    finally:
        man.clear_intent(intent)

    # an uncommitted stage yields a structured REFUSAL report (not a
    # traceback): audited=False, uncovered unknown (None), the stage
    # named, and — with no pending maintenance — the never-built /
    # out-of-band-deletion diagnosis.  rc 3: un-auditable is
    # alert-worthy, and "the audit code broke" (rc 1) it is not
    shutil.rmtree(paths["links"])
    refused = check_kg_links(spark, out)
    assert refused["audited"] is False and refused["uncovered"] is None
    assert refused["not_committed"] == ["links"]
    assert refused["sample"] == [] and refused["by_endpoint"] == {}
    assert "out-of-band deletion" in refused["probable_cause"]
    assert check_links_rc(refused) == 3

    # same missing stage WITH a pending intent → the refusal blames
    # the crashed maintenance run and points at resume, not surgery
    intent = man.write_intent("links", [], None, kind="overwrite")
    try:
        refused2 = check_kg_links(spark, out)
        assert refused2["audited"] is False
        assert refused2["pending_intent_count"] == 1
        assert refused2["probable_cause"].startswith("crashed append")
        assert check_links_rc(refused2) == 3
    finally:
        man.clear_intent(intent)
