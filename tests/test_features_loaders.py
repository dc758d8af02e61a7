# -*- coding: utf-8 -*-
"""Feature stage (T1-T18 + G1 Pattern), annotation loaders (S2/S3),
GeoNames source (S6/S7), detokenize sink (K1)."""
import re

import pytest
from pyspark.sql import functions as F

# reference _shape semantics
# (/root/reference/webstruct/features/token_features.py:107-121)
def _shape_py(token: str) -> str:
    if re.match(r"[-+]?[0-9]+(\.[0-9]*)?|[0-9]*\.[0-9]+$", token):
        return "number"
    if re.match(r"\W+$", token):
        return "punct"
    if re.match(r"[A-Z][a-z'`]+$", token):
        return "upcase"
    if re.match(r"[A-Z][A-Z'`]+$", token):
        return "caps"
    if re.match(r"[a-z]+$", token):
        return "downcase"
    if re.match(r"\w+$", token):
        return "mixedcase"
    return "other"


FUZZ_TOKENS = [
    "Dallas", "ACME", "a1b2", "hello", "42", "3.14", "-7", "+8.",
    ".5", "!!", "Mo.", "o'clock", "D'Arcy", "X", "x", "9am",
    "214-351-2456", "ada@acme.com", "©", "...", "``",
]


def test_token_shape_matches_reference(spark):
    from webstruct_spark.functions.token_features import token_shape

    df = spark.createDataFrame([(t,) for t in FUZZ_TOKENS], "token string")
    got = {
        r["token"]: r["shape"]
        for r in df.select("token", token_shape(F.col("token")).alias("shape")).collect()
    }
    for t in FUZZ_TOKENS:
        assert got[t] == _shape_py(t), (t, got[t], _shape_py(t))


def test_feature_struct_values(spark):
    from webstruct_spark.operators.features_op import token_rows, with_features

    turns = spark.createDataFrame(
        [("c1", 0, "user", None,
          "Contact __START_ORG__ Acme Corp __END_ORG__ on Monday 12:30")],
        "conv_id string, turn_idx int, role string, tool string, text string",
    )
    rows = {r["token"]: r for r in with_features(token_rows(turns)).collect()}
    f = rows["Acme"]["features"]
    assert f["lower"] == "acme"
    assert f["shape"] == "upcase"
    assert f["first_upper"] is True
    assert f["prefix3"] == "acm" and f["suffix2"] == "me"
    assert f["parent_role"] == "user"
    assert rows["Monday"]["features"]["looks_like_weekday"] is True
    assert rows["12:30"]["features"]["looks_like_time"] is True
    assert rows["Contact"]["features"]["at_block_start"] is True
    assert rows["Acme"]["tag"] == "B-ORG" and rows["Corp"]["tag"] == "I-ORG"
    # number_pattern masks
    turns2 = spark.createDataFrame(
        [("c1", 0, "user", None, "call 214-351-2456 now")],
        "conv_id string, turn_idx int, role string, tool string, text string",
    )
    r2 = {r["token"]: r for r in with_features(token_rows(turns2)).collect()}
    assert r2["214-351-2456"]["features"]["num_pattern"] == "XXX-XXX-XXXX"
    assert r2["now"]["features"]["num_pattern"] is None


def test_pattern_feature_matches_reference_conventions(spark):
    """Reference Pattern((-1,'lower'),(0,'lower')) doctest semantics:
    out-of-range -> '?', feature name 'lower[-1]/lower'."""
    from webstruct_spark.operators.features_op import (
        token_rows,
        with_features,
        with_pattern,
    )

    turns = spark.createDataFrame(
        [("c1", 0, "user", None, "Acme Corp called")],
        "conv_id string, turn_idx int, role string, tool string, text string",
    )
    df = with_pattern(
        with_features(token_rows(turns)), [[(-1, "lower"), (0, "lower")]]
    )
    vals = {r["token"]: r["lower[-1]/lower"] for r in df.collect()}
    assert vals["Acme"] == "?/acme"  # left neighbor out of range
    assert vals["Corp"] == "acme/corp"
    assert vals["called"] == "corp/called"


def test_gate_and_wa_loaders(spark):
    from webstruct_spark.functions.loaders import gate_markers, wa_span_markers
    from webstruct_spark.operators.extract import mentions

    gate = spark.createDataFrame(
        [("c1", 0, "meet <PER>Ada Lovelace</PER> at <ORG>Acme Corp</ORG>")],
        "conv_id string, turn_idx int, text string",
    ).withColumn("text", gate_markers(F.col("text"), ["PER", "ORG", "CITY"]))
    got = {
        (r["text"], r["entity_type"]) for r in mentions(gate).collect()
    }
    assert got == {("Ada Lovelace", "PER"), ("Acme Corp", "ORG")}

    wa = spark.createDataFrame(
        [("c1", 0, 'visit <span wa-id="3" wa-type="CITY">Dallas</span> soon')],
        "conv_id string, turn_idx int, text string",
    ).withColumn("text", wa_span_markers(F.col("text")))
    got2 = {(r["text"], r["entity_type"]) for r in mentions(wa).collect()}
    assert got2 == {("Dallas", "CITY")}


def test_geonames_reader_and_alias_explode(spark, tmp_path):
    from webstruct_spark.sources.geonames import alias_rows, read_geonames

    tsv = tmp_path / "geo.tsv"
    rows = [
        # geonameid name asciiname alternatenames lat lon fclass fcode
        # cc cc2 a1 a2 a3 a4 population elev dem tz mod
        "5128581\tNew York City\tNew York City\tNYC,New York,Big Apple\t40.7\t-74.0\tP\tPPL\tUS\t\tNY\t\t\t\t8175133\t\t10\tAmerica/New_York\t2020-01-01",
        "4684888\tDallas\tDallas\t\t32.7\t-96.8\tP\tPPL\tUS\t\tTX\t\t\t\t1300092\t\t128\tAmerica/Chicago\t2020-01-01",
    ]
    tsv.write_text("\n".join(rows) + "\n")
    geo = read_geonames(spark, str(tsv))
    assert geo.count() == 2
    aliases = {
        (r["alias"], r["canonical_id"], r["entity_type"])
        for r in alias_rows(geo).collect()
    }
    assert ("NYC", "GEO:5128581", "CITY") in aliases
    assert ("Big Apple", "GEO:5128581", "CITY") in aliases
    assert ("Dallas", "GEO:4684888", "CITY") in aliases
    # dedup: name == asciiname collapses to one row
    assert (
        len([a for a in aliases if a[1] == "GEO:4684888"]) == 1
    )


def test_detokenize_round_trip(spark):
    """K1: annotate plain text from predicted tags; re-extracting the
    annotated text reproduces the same (token, tag) stream."""
    from webstruct_spark.kernel.bilou import encode_tokens
    from webstruct_spark.kernel.tokenize import default_segment_words
    from webstruct_spark.operators.detokenize import annotate_text

    plain = "visit Acme Corp in Dallas TX or call 214-351-2456 now"
    toks = default_segment_words(plain)
    tags = ["O", "B-ORG", "I-ORG", "O", "B-CITY", "B-STATE", "O", "O",
            "B-TEL", "O"]
    assert len(toks) == len(tags)
    annotated = annotate_text(toks, tags, plain)
    chars = [t[0] for t in default_segment_words(annotated)]
    idx_tags = encode_tokens(chars)
    got = [(chars[i], t) for i, t in idx_tags]
    want = [(t[0], tag) for t, tag in zip(toks, tags)]
    assert got == want
