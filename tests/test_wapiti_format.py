# -*- coding: utf-8 -*-
"""K3/M3: wapiti train-file sink + feature-template encoder.

Reference goldens: the doctests of WapitiFeatureEncoder /
prepare_wapiti_template / _tostr (/root/reference/webstruct/
wapiti.py:335-498) replicated verbatim, plus Spark-vs-twin line and
file-layout parity."""
import os

import pytest

from webstruct_spark.kernel.wapiti_format import (
    WapitiFeatureEncoder,
    prepare_wapiti_template,
    sequences_to_data_blocks,
    to_train_sequence,
    to_wapiti_value,
)

VOCAB = {"token": 0, "tag": 1}


def test_prepare_template_reference_doctests():
    # wapiti.py:452-474 doctests
    assert (
        prepare_wapiti_template(
            '*:Pos-1 L=%x[-1, tag]\n*:Suf-2 X=%m[ 0,token,".?.?$"]',
            VOCAB,
        )
        == '*:Pos-1 L=%x[-1,1]\n*:Suf-2 X=%m[0,0,".?.?$"]'
    )
    # comment lines pass through untouched
    assert (
        prepare_wapiti_template(
            '*:Pos-1 L=%x[-1, tag]\n# *:Suf-2 X=%m[ 0,token,".?.?$"]',
            VOCAB,
        )
        == '*:Pos-1 L=%x[-1,1]\n# *:Suf-2 X=%m[ 0,token,".?.?$"]'
    )
    # numeric columns stay as-is
    assert prepare_wapiti_template("u:W=%x[0,0]", VOCAB) == "u:W=%x[0,0]"


def test_tostr_reference_doctests():
    # wapiti.py:477-494 doctests (+ the dict.get(None) path)
    assert to_wapiti_value("foo") == "foo"
    assert to_wapiti_value(10) == "10"
    assert to_wapiti_value(True) == "1"
    assert to_wapiti_value(False) == "0"
    assert to_wapiti_value(None) == "None"


def _fitted():
    we = WapitiFeatureEncoder(["token", "tag"])
    we.fit([[{"token": "the", "tag": "DT"}, {"token": "dog", "tag": "NN"}]])
    return we


def test_unigram_template_reference_doctests():
    # wapiti.py:408-426 doctests
    assert _fitted().unigram_features_template() == (
        "\n# Unigrams for all custom features\n"
        "*feat:token=%x[0,0]\n*feat:tag=%x[0,1]\n"
    )
    assert _fitted().unigram_features_template("u") == (
        "\n# Unigrams for all custom features\n"
        "ufeat:token=%x[0,0]\nufeat:tag=%x[0,1]\n"
    )


def test_encoder_transform_and_order():
    we = WapitiFeatureEncoder(("token",))
    we.fit(
        [
            [{"token": "Acme", "upper": True, "len": 4}],
            [{"token": "st.", "street": True}],
        ]
    )
    # front name first, rest sorted (documented determinism
    # divergence from the reference's set order)
    assert we.feature_names_ == ("token", "len", "street", "upper")
    lines = we.transform_single(
        [{"token": "Acme", "upper": True, "len": 4}]
    )
    # missing 'street' -> 'None' (dict.get parity), bool -> '1'
    assert lines == ["Acme 4 None 1"]
    assert we.prepare_template("u:U=%x[0,upper]") == "u:U=%x[0,3]"


def test_train_sequence_and_block_layout():
    seq = to_train_sequence(["a 1", "b 0"], ["B-ORG", "I-ORG"])
    assert seq == "a 1 B-ORG\nb 0 I-ORG"
    # every block followed by a blank line, including the last
    # (reference wapiti.py:303-310)
    assert sequences_to_data_blocks(["x", "y"]) == "x\n\ny\n\n"


TURNS = [
    ("c1", 0, "user", "Call __START_ORG__ Acme Inc __END_ORG__ today", None),
    ("c1", 1, "tool", "ok", "search"),
    ("c2", 0, "agent", "__START_CITY__ Austin __END_CITY__", None),
]


def _twin_rows():
    """Single-node twin of wapiti_train_lines over TURNS — the SAME
    shared dict builder the gold builder uses."""
    from webstruct_spark.sources.goldbuild import wapiti_feature_dicts

    per_turn = [
        (
            cid,
            ti,
            wapiti_feature_dicts(
                dict(conv_id=cid, turn_idx=ti, role=role,
                     text=text, tool=tool)
            ),
        )
        for cid, ti, role, text, tool in TURNS
    ]
    enc = WapitiFeatureEncoder(move_to_front=("token",))
    enc.fit([[d for d, _ in dicts] for _c, _t, dicts in per_turn])
    out = {}
    for cid, ti, dicts in per_turn:
        lines = enc.transform_single([d for d, _ in dicts])
        for k, (line, (_d, tag)) in enumerate(zip(lines, dicts)):
            out[(cid, ti, k)] = "%s %s" % (line, tag)
    return out, enc


def test_spark_lines_match_twin(spark):
    from webstruct_spark.operators.wapiti_io import wapiti_train_lines

    turns = spark.createDataFrame(
        TURNS, "conv_id string, turn_idx int, role string, "
        "text string, tool string"
    )
    got = {
        (r["conv_id"], r["turn_idx"], r["tok_idx"]): r["line"]
        for r in wapiti_train_lines(turns).collect()
    }
    want, _enc = _twin_rows()
    assert got == want
    # sanity: marker tokens never appear, tags ride as the last column
    assert any(v.endswith(" B-ORG") for v in want.values())
    assert not any("__START_" in v for v in want.values())


def test_write_train_files_layout(spark, tmp_path):
    from webstruct_spark.operators.wapiti_io import (
        wapiti_sequences,
        wapiti_train_lines,
        write_wapiti_train_files,
    )

    turns = spark.createDataFrame(
        TURNS, "conv_id string, turn_idx int, role string, "
        "text string, tool string"
    )
    lines = wapiti_train_lines(turns)
    out = os.path.join(str(tmp_path), "wapiti_train")
    write_wapiti_train_files(lines, out, n_files=1)
    parts = [
        f for f in os.listdir(out) if f.startswith("part-")
    ]
    assert len(parts) == 1
    with open(os.path.join(out, parts[0]), encoding="utf8") as f:
        text = f.read()
    # twin layout: blocks in (conv_id, turn_idx) order, blank-line
    # separated, trailing blank line included
    want, _enc = _twin_rows()
    seqs = {}
    for (cid, ti, k), line in sorted(want.items()):
        seqs.setdefault((cid, ti), []).append(line)
    expect = sequences_to_data_blocks(
        "\n".join(v) for _k, v in sorted(seqs.items())
    )
    assert text == expect
    # and the grouped DataFrame agrees with the twin's blocks
    blocks = {
        (r["conv_id"], r["turn_idx"]): r["block"]
        for r in wapiti_sequences(lines).collect()
    }
    assert blocks[("c1", 0)] == "\n".join(seqs[("c1", 0)]) + "\n"


def test_write_train_files_roundtrip_multifile(spark, tmp_path):
    """Close the loop on the sink's FILE layout beyond line hashing:
    write the sf0.001 corpus as n_files=4 wapiti train files, read the
    actual part-files back, split the blank-line-separated blocks, and
    reconstruct the exact multiset of per-sequence blocks the
    single-node twin produces (gold_wapiti_lines parquet, pinned by
    the reference doctests)."""
    from collections import Counter

    import duckdb

    from webstruct_spark.operators.wapiti_io import (
        wapiti_train_lines,
        write_wapiti_train_files,
    )

    corpus = "/root/repo/data/transcripts/sf0.001"
    turns = spark.read.parquet(os.path.join(corpus, "transcripts.parquet"))
    lines = wapiti_train_lines(turns)
    out = os.path.join(str(tmp_path), "wapiti_train_multi")
    write_wapiti_train_files(lines, out, n_files=4)
    parts = sorted(
        f for f in os.listdir(out) if f.startswith("part-")
    )
    assert len(parts) == 4
    got_blocks: Counter = Counter()
    nonempty_parts = 0
    for p in parts:
        with open(os.path.join(out, p), encoding="utf8") as f:
            text = f.read()
        if not text:
            continue
        nonempty_parts += 1
        assert text.endswith("\n\n")  # trailing blank line after last block
        blocks = [b for b in text.split("\n\n") if b]
        # within a part-file, blocks sort by (conv_id, turn_idx):
        # verify via each block's first line's token column order later
        got_blocks.update(blocks)
    assert nonempty_parts > 1  # the fan-out really spread sequences
    gold = duckdb.sql(
        "select conv_id, turn_idx, tok_idx, line from read_parquet('%s') "
        "order by conv_id, turn_idx, tok_idx"
        % os.path.join(corpus, "gold_wapiti_lines.parquet")
    ).fetchall()
    want_seqs: dict = {}
    for cid, ti, _k, line in gold:
        want_seqs.setdefault((cid, ti), []).append(line)
    want_blocks = Counter("\n".join(v) for v in want_seqs.values())
    assert got_blocks == want_blocks


def test_fit_feature_names_map_column(spark):
    from webstruct_spark.operators.wapiti_io import (
        fit_feature_names,
        wapiti_line_col,
    )

    df = spark.createDataFrame(
        [(1, {"token": "a", "upper": "1"}), (2, {"token": "b", "len": "3"})],
        "id int, features map<string,string>",
    )
    names = fit_feature_names(df, move_to_front=("token",))
    assert names == ("token", "len", "upper")
    rows = {
        r["id"]: r["l"]
        for r in df.select(
            "id", wapiti_line_col(df, names).alias("l")
        ).collect()
    }
    # map misses render as 'None', matching dict.get in the twin
    assert rows[1] == "a None 1"
    assert rows[2] == "b 3 None"


def test_write_template(tmp_path):
    from webstruct_spark.operators.wapiti_io import write_wapiti_template

    path = os.path.join(str(tmp_path), "template.txt")
    text = write_wapiti_template(
        path,
        ("token", "tag"),
        feature_template="*:Pos-1 L=%x[-1, tag]",
        unigrams_scope="u",
    )
    with open(path, encoding="utf8") as f:
        assert f.read() == text
    assert text == (
        "*:Pos-1 L=%x[-1,1]\n"
        "\n# Unigrams for all custom features\n"
        "ufeat:token=%x[0,0]\nufeat:tag=%x[0,1]\n"
    )


def test_empty_turn_emits_no_block(spark):
    """Documented divergence: a turn with zero clean tokens produces
    NO data-file block (the reference writes an empty block; wapiti
    ignores both)."""
    from webstruct_spark.operators.wapiti_io import (
        wapiti_sequences,
        wapiti_train_lines,
    )

    turns = spark.createDataFrame(
        [("c1", 0, "user", "", None), ("c1", 1, "user", "hello", None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string",
    )
    lines = wapiti_train_lines(turns)
    blocks = wapiti_sequences(lines).collect()
    assert [(r["conv_id"], r["turn_idx"]) for r in blocks] == [("c1", 1)]
