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
