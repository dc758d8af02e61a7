# -*- coding: utf-8 -*-
"""Property-based invariants (hypothesis) — beyond the reference's
golden-vector strategy:

* tokenizer: offsets are monotonic, in-bounds, non-overlapping; every
  non-whitespace char of the input is covered by some token span
  (quote replacements keep length-1 spans).
* BILOU: encode→decorate→encode is a fixed point for well-formed
  streams; group() output concatenates back to the input.
* smart_join is idempotent on already-joined text tokens.
"""
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from webstruct_spark.kernel.bilou import encode_tokens, group_tags
from webstruct_spark.kernel.smartjoin import smart_join
from webstruct_spark.kernel.tokenize import segment_words

text_strategy = st.text(
    alphabet=st.sampled_from(
        list("abcXYZ019 \t\n.,;:'\"()[]{}|!?#$%&-@_…“”`©")
    ),
    max_size=120,
)


@settings(max_examples=300, deadline=None)
@given(text_strategy)
def test_tokenizer_offsets_invariants(s):
    toks = segment_words(s)
    prev_end = 0
    for chars, pos, ln in toks:
        assert chars  # no empty tokens
        assert 0 <= pos <= len(s)
        assert ln >= 1 and pos + ln <= len(s)
        assert pos >= prev_end  # non-overlapping, ordered
        prev_end = pos + ln
    # every non-whitespace char is inside some token span
    covered = [False] * len(s)
    for _c, pos, ln in toks:
        for i in range(pos, pos + ln):
            covered[i] = True
    for i, ch in enumerate(s):
        if not ch.isspace():
            assert covered[i], (s, i, ch)


tag_types = st.sampled_from(["PER", "ORG", "CITY"])


@st.composite
def wellformed_stream(draw):
    """Random well-formed marker/token stream."""
    out = []
    for _ in range(draw(st.integers(0, 10))):
        if draw(st.booleans()):
            t = draw(tag_types)
            out.append("__START_%s__" % t)
            for _ in range(draw(st.integers(0, 3))):
                out.append(draw(st.sampled_from(["a", "b", "cc"])))
            out.append("__END_%s__" % t)
        else:
            out.append(draw(st.sampled_from(["x", "y", "zz"])))
    return out


@settings(max_examples=300, deadline=None)
@given(wellformed_stream())
def test_bilou_encode_decorate_fixed_point(stream):
    idx_tags = encode_tokens(stream)
    tokens = [stream[i] for i, _ in idx_tags]
    tags = [t for _, t in idx_tags]
    # decorate: rebuild a marker stream from the grouped runs
    rebuilt = []
    for items, tag in group_tags(list(zip(tokens, tags))):
        if tag == "O":
            rebuilt.extend(items)
        else:
            rebuilt.append("__START_%s__" % tag)
            rebuilt.extend(items)
            rebuilt.append("__END_%s__" % tag)
    idx_tags2 = encode_tokens(rebuilt)
    assert [rebuilt[i] for i, _ in idx_tags2] == tokens
    assert [t for _, t in idx_tags2] == tags


@settings(max_examples=300, deadline=None)
@given(st.lists(st.sampled_from(["O", "B-PER", "I-PER", "B-ORG", "I-ORG"]),
                max_size=12))
def test_group_tags_partitions_input(tags):
    infos = list(range(len(tags)))
    groups = group_tags(list(zip(infos, tags)))
    flat = [i for items, _t in groups for i in items]
    assert flat == infos  # a partition of the input, in order
    for items, t in groups:
        assert items
        assert t == "O" or re.fullmatch(r"\w+", t)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from(["Hello", ",", "world", "!", "(", ")",
                                 "214", "x."]), max_size=8))
def test_smart_join_idempotent_on_words(tokens):
    joined = smart_join(tokens)
    assert smart_join([joined]) == joined
