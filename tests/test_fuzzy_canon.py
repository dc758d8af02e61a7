# -*- coding: utf-8 -*-
"""Fuzzy canonicalization: blocking-key self-join edges merge
near-duplicate surfaces into one component."""
from pyspark.sql import functions as F


def test_fuzzy_canon_merges_near_duplicates(spark):
    from webstruct_spark.operators.canon import canonicalize, fuzzy_edges

    mentions = spark.createDataFrame(
        [
            ("c1", 0, "Acme Systems Inc", "ORG"),
            ("c1", 1, "Acme Systems", "ORG"),  # near-dup of above
            ("c1", 2, "Acme Labs", "ORG"),  # shares block, low jaccard
            ("c2", 0, "Dallas", "CITY"),
            ("c2", 1, "dallas", "CITY"),  # exact after normalization
        ],
        "conv_id string, turn_idx int, text string, entity_type string",
    )
    gaz = spark.createDataFrame(
        [("Dallas", "CITY:1", "CITY", 1.0)],
        "alias string, canonical_id string, entity_type string, weight double",
    )

    # without fuzzy: the two Acme variants stay separate nodes
    _l1, nodes1 = canonicalize(mentions, gaz)
    n1 = {r["node_id"] for r in nodes1.collect()}
    assert len(n1) == 4  # acme systems inc / acme systems / acme labs / dallas

    # with fuzzy: 'acme systems inc' and 'acme systems' merge (jaccard
    # 2/3 >= 0.5); 'acme labs' stays out (1/4 < 0.5)
    links2, nodes2 = canonicalize(mentions, gaz, fuzzy=True)
    n2 = {r["node_id"] for r in nodes2.collect()}
    assert len(n2) == 3
    by_text = {r["norm_text"]: r["node_id"] for r in links2.collect()}
    assert by_text["acme systems inc"] == by_text["acme systems"]
    assert by_text["acme labs"] != by_text["acme systems"]
    assert by_text["dallas"] == "g:CITY:1"


def test_fuzzy_edges_block_cap(spark):
    """Oversized blocks are dropped by the explicit cap."""
    from webstruct_spark.operators.canon import fuzzy_edges

    rows = [("ORG", "acme v%d" % i) for i in range(30)]
    surfaces = spark.createDataFrame(rows, "entity_type string, norm_text string")
    capped = fuzzy_edges(surfaces, threshold=0.1, max_block=10)
    assert capped.count() == 0  # block of 30 > cap 10 -> no pairs
    uncapped = fuzzy_edges(surfaces, threshold=0.1, max_block=100)
    assert uncapped.count() > 0


def test_fuzzy_edges_dropped_blocks_observable(spark):
    """A hot block over max_block must surface in the _dropped_blocks
    hook (with its size) while a small block still produces edges —
    the cap is observable, never a silent loss."""
    from webstruct_spark.operators.canon import fuzzy_edges

    rows = [("ORG", "the clinic %d" % i) for i in range(30)]  # hot block
    rows += [("ORG", "acme systems"), ("ORG", "acme systems inc")]
    surfaces = spark.createDataFrame(
        rows, "entity_type string, norm_text string"
    )
    edges = fuzzy_edges(surfaces, threshold=0.5, max_block=10)
    got = {
        (r["src"], r["dst"]) for r in edges.collect()
    }
    # the small acme block still merges
    assert ("t:ORG:acme systems", "t:ORG:acme systems inc") in got
    # nothing from the hot block made it into the edges
    assert not any("the clinic" in s or "the clinic" in d for s, d in got)
    dropped = {
        (r["block"], r["bn"]) for r in edges._dropped_blocks.collect()
    }
    assert dropped == {("ORG|the", 30)}
