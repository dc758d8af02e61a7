# -*- coding: utf-8 -*-
"""BILOU/IOB2 codec goldens — reference IobEncoder doctests
(/root/reference/webstruct/sequence_encoding.py:10-159) plus
round-trip idempotence."""
import pytest

from webstruct_spark.kernel.bilou import (
    classify_token,
    decode_mentions,
    encode_tokens,
    group_tags,
)


def encoded_pairs(tokens):
    return [(tokens[i], tag) for i, tag in encode_tokens(tokens)]


def test_classify():
    assert classify_token("foo") == ("token", "foo")
    assert classify_token("__START_ORG__") == ("start", "ORG")
    assert classify_token("__END_ORG__") == ("end", "ORG")


def test_encode_simple():
    assert encoded_pairs(["__START_PER__", "John", "__END_PER__", "said"]) == [
        ("John", "B-PER"),
        ("said", "O"),
    ]


def test_encode_adjacent_entities():
    tokens = [
        "hello",
        "__START_PER__",
        "John",
        "Doe",
        "__END_PER__",
        "__START_PER__",
        "Mary",
        "__END_PER__",
        "said",
    ]
    pairs = encoded_pairs(tokens)
    assert [p[0] for p in pairs] == ["hello", "John", "Doe", "Mary", "said"]
    assert [p[1] for p in pairs] == ["O", "B-PER", "I-PER", "B-PER", "O"]


def test_encode_mismatched_close_raises():
    with pytest.raises(ValueError):
        encode_tokens(["__START_PER__", "John", "__END_ORG__"])


def test_group():
    data = [
        ("hello", "O"),
        (",", "O"),
        ("John", "B-PER"),
        ("Doe", "I-PER"),
        ("Mary", "B-PER"),
        ("said", "O"),
    ]
    assert group_tags(data) == [
        (["hello", ","], "O"),
        (["John", "Doe"], "PER"),
        (["Mary"], "PER"),
        (["said"], "O"),
    ]


def test_group_repairs_dangling_i():
    data = [("hello", "O"), ("John", "I-PER"), ("Doe", "I-PER")]
    assert group_tags(data) == [(["hello"], "O"), (["John", "Doe"], "PER")]


def test_group_strict_raises():
    data = [("hello", "O"), ("John", "I-PER"), ("Doe", "I-PER")]
    with pytest.raises(ValueError):
        group_tags(data, strict=True)


def test_decode_mentions_drops_o_runs():
    toks = ["hi", "John", "Doe", "bye"]
    tags = ["O", "B-PER", "I-PER", "O"]
    assert decode_mentions(toks, tags) == [(["John", "Doe"], "PER")]


def test_round_trip_idempotence():
    """encode(decorate(decode(tags))) == tags for valid sequences."""
    toks = ["a", "b", "c", "d", "e", "f"]
    tags = ["O", "B-ORG", "I-ORG", "B-CITY", "O", "B-ORG"]
    # decorate: rebuild a marker stream from grouped entities
    stream = []
    for items, tag in group_tags(zip(toks, tags)):
        if tag == "O":
            stream.extend(items)
        else:
            stream.append("__START_%s__" % tag)
            stream.extend(items)
            stream.append("__END_%s__" % tag)
    pairs = [(stream[i], t) for i, t in encode_tokens(stream)]
    assert [p[0] for p in pairs] == toks
    assert [p[1] for p in pairs] == tags
