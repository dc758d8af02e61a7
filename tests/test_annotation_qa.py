# -*- coding: utf-8 -*-
"""Annotation QA: the flat-text analogs of the reference's
annotation_converter / annotation_verifier CLIs (stream diff instead
of DOM tree diff)."""
from pyspark.sql import functions as F

from webstruct_spark.functions.annotation_qa import (
    convert_gate_to_webannotator,
    stream_diff,
    verify_annotations,
)
from webstruct_spark.functions.loaders import (
    gate_markers,
    wa_markers_nested,
)

TAGS = ["ORG", "TEL", "CITY"]


def test_stream_diff_agreement_and_divergences():
    a = "call __START_ORG__ Acme Inc __END_ORG__ today"
    assert stream_diff(a, a) is None
    # same tokens, different tag -> 'tag' at the first tagged token
    b = "call __START_TEL__ Acme Inc __END_TEL__ today"
    d = stream_diff(a, b)
    assert d["reason"] == "tag" and d["idx"] == 1
    assert d["left"] == "Acme/B-ORG" and d["right"] == "Acme/B-TEL"
    # different token
    c = "call __START_ORG__ Acme Ltd __END_ORG__ today"
    d = stream_diff(a, c)
    assert d == {"idx": 2, "reason": "token", "left": "Inc", "right": "Ltd"}
    # prefix agreement, extra tail -> 'length'
    d = stream_diff(a, a + " extra")
    assert d["reason"] == "length" and d["idx"] == 4


def test_convert_and_verify_round_trip(spark):
    """annotation_converter analog: GATE text -> WA HTML; verifier
    analog: reloading the WA HTML yields the same (token, tag) stream
    as direct GATE ingestion — corpus-wide, zero divergent rows."""
    rows = [
        ("c0", 0, "Call <ORG>Acme Inc</ORG> at <TEL>555-1234</TEL> now."),
        ("c0", 1, "We are in <CITY>Austin</CITY>, near <ORG>Stark Ltd</ORG>."),
        ("c1", 0, "No annotations at all here."),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, gate_text string"
    )
    converted = df.withColumn(
        "wa_html", convert_gate_to_webannotator(F.col("gate_text"), TAGS)
    )
    both = converted.select(
        "conv_id",
        "turn_idx",
        gate_markers(F.col("gate_text"), TAGS).alias("left_m"),
        wa_markers_nested(F.col("wa_html")).alias("right_m"),
    )
    bad = verify_annotations(both, "left_m", "right_m")
    assert bad.count() == 0


def test_verify_surfaces_malformed_markers_instead_of_crashing(spark):
    """A row whose markers don't form a valid sequence (stray
    __END_X__) is the exact defect the verifier exists to find — it
    must be REPORTED (reason 'encode-error'), not crash the job."""
    rows = [
        ("c0", 0, "fine text", "fine text"),
        ("c0", 1, "fine text", "stray __END_ORG__ here"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, l string, r string"
    )
    got = verify_annotations(df, "l", "r").collect()
    assert len(got) == 1
    row = got[0]
    assert row["turn_idx"] == 1 and row["reason"] == "encode-error"
    assert row["left"] == "ok" and "close tag" in row["right"]


def test_verify_handles_nonidentifier_column_names(spark):
    df = spark.createDataFrame(
        [("c0", "__START_ORG__ A __END_ORG__", "A")],
        ["conv-id", "left text", "right text"],
    )
    got = verify_annotations(
        df, "left text", "right text", id_cols=["conv-id"]
    ).collect()
    assert len(got) == 1 and got[0]["conv-id"] == "c0"
    assert got[0]["reason"] == "tag"


def test_verify_reports_planted_divergence(spark):
    rows = [
        ("c0", 0, "__START_ORG__ Acme __END_ORG__ rocks",
         "__START_ORG__ Acme __END_ORG__ rocks"),
        ("c0", 1, "__START_ORG__ Acme __END_ORG__ rocks",
         "__START_TEL__ Acme __END_TEL__ rocks"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, l string, r string"
    )
    got = verify_annotations(df, "l", "r").collect()
    assert len(got) == 1
    row = got[0]
    assert (row["conv_id"], row["turn_idx"]) == ("c0", 1)
    assert row["reason"] == "tag" and row["diff_idx"] == 0
    assert row["left"] == "Acme/B-ORG" and row["right"] == "Acme/B-TEL"
