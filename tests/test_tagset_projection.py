# -*- coding: utf-8 -*-
"""P3/P4 tagset projection: out-of-tagset markers are dropped while
their text survives — mirroring the reference's ``tagset`` /
``known_entities`` behavior (html_tokenizer.py:323-332 _limit_tags,
loaders.py:81-85 _prune_tags)."""
import pytest
from pyspark.sql import functions as F

from webstruct_spark.kernel.bilou import encode_tokens, limit_tags
from webstruct_spark.kernel.tokenize import default_segment_words
from webstruct_spark.operators.extract import (
    _extract_turn_entities_twopass,
    extract_turn_entities_py,
)

TEXT = (
    "__START_FOO__ alpha __END_FOO__ visit __START_PER__ Ada "
    "Lovelace __END_PER__ near __START_BAR__ beta __END_BAR__ ."
)


def test_limit_tags_drops_markers_keeps_text():
    toks = [t[0] for t in default_segment_words(TEXT)]
    kept = limit_tags(toks, {"PER"})
    assert "__START_FOO__" not in kept and "__END_BAR__" not in kept
    assert "alpha" in kept and "beta" in kept  # text survives
    assert "__START_PER__" in kept and "__END_PER__" in kept
    # projected stream now encodes cleanly: alpha/beta become 'O'
    tags = dict(
        (toks_i, tag)
        for toks_i, tag in (
            (kept[i], t) for (i, t) in encode_tokens(kept)
        )
    )
    assert tags["alpha"] == "O" and tags["beta"] == "O"
    assert tags["Ada"] == "B-PER" and tags["Lovelace"] == "I-PER"


def test_limit_tags_none_is_identity():
    toks = [t[0] for t in default_segment_words(TEXT)]
    assert limit_tags(toks, None) == toks


def test_fused_and_twopass_agree_under_tagset():
    for tagset in ({"PER"}, {"FOO"}, {"PER", "BAR"}, set()):
        a = extract_turn_entities_py(TEXT, tagset=tagset)
        b = _extract_turn_entities_twopass(TEXT, tagset=tagset)
        assert a == b, tagset


def test_projection_changes_extraction():
    n_all, ents_all = extract_turn_entities_py(TEXT)
    n_per, ents_per = extract_turn_entities_py(TEXT, tagset={"PER"})
    assert {e[1] for e in ents_all} == {"FOO", "PER", "BAR"}
    assert {e[1] for e in ents_per} == {"PER"}
    # dropped markers' text tokens are still counted as clean tokens
    assert n_per == n_all + 0  # same clean-token stream either way


def test_out_of_tagset_close_marker_does_not_raise():
    """The round-1 gap: an out-of-tagset close marker used to raise in
    encode; projected away it must not."""
    s = "x __END_FOO__ y"
    with pytest.raises(ValueError):
        extract_turn_entities_py(s)
    n, ents = extract_turn_entities_py(s, tagset={"PER"})
    assert n == 2 and ents == []


def test_mentions_tagset_distributed(spark):
    turns = spark.createDataFrame(
        [("c1", 0, TEXT)], "conv_id string, turn_idx int, text string"
    )
    from webstruct_spark.operators.extract import mentions

    got = mentions(turns, tagset={"PER"}).collect()
    assert [(r["text"], r["entity_type"]) for r in got] == [
        ("Ada Lovelace", "PER")
    ]


def test_wa_known_entities_prunes_unknown_spans(spark):
    from webstruct_spark.functions.loaders import wa_span_markers

    html = (
        'see <span wa-type="ORG" wa-id="1">Acme</span> and '
        '<span wa-type="JUNK" wa-id="2">noise</span> ok'
    )
    df = spark.createDataFrame([(html,)], "text string").select(
        wa_span_markers(F.col("text"), known_entities=("ORG",)).alias("m")
    )
    out = df.collect()[0]["m"]
    assert "__START_ORG__ Acme __END_ORG__" in out
    assert "JUNK" not in out and "__START_JUNK__" not in out
    assert "noise" in out  # unknown span unwrapped, text kept
