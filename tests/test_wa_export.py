# -*- coding: utf-8 -*-
"""K2 to_webannotator export: marker text → WA span HTML + color
legend, round-tripping through the WA loader to the identical
token/tag sequence."""
import duckdb
import pytest

from webstruct_spark.kernel.bilou import encode_tokens
from webstruct_spark.kernel.tokenize import default_segment_words
from webstruct_spark.kernel.wadom import (
    DEFAULT_COLORS,
    EntityColors,
    entity_colors_from_html,
    markers_to_webannotator,
    wa_color_legend,
    wa_to_markers,
)


def _tokens_tags(text):
    chars = [t[0] for t in default_segment_words(text)]
    return [(chars[i], tag) for i, tag in encode_tokens(chars)]


def test_round_trip_token_tags():
    src = (
        "call __START_PER__ Ada Lovelace __END_PER__ at "
        "__START_CITY__ Austin __END_CITY__ today <3 & tomorrow."
    )
    html, colors, _nid = markers_to_webannotator(src)
    back = wa_to_markers(html)
    assert _tokens_tags(back) == _tokens_tags(src)
    assert colors["PER"][:2] == DEFAULT_COLORS[0]
    assert colors["CITY"][:2] == DEFAULT_COLORS[1]


def test_round_trip_real_corpus():
    texts = [
        r[0]
        for r in duckdb.sql(
            "select text from read_parquet("
            "'/root/repo/data/transcripts/sf0.001/transcripts.parquet') "
            "order by conv_id, turn_idx limit 400"
        ).fetchall()
    ]
    colors = EntityColors()
    nid = 1
    for t in texts:
        html, colors, nid = markers_to_webannotator(t, colors, nid)
        assert _tokens_tags(wa_to_markers(html)) == _tokens_tags(t), t


def test_wa_ids_are_sequential_and_colors_stable():
    colors = EntityColors()
    h1, colors, nid = markers_to_webannotator(
        "__START_A__ x __END_A__", colors, 1
    )
    h2, colors, nid = markers_to_webannotator(
        "__START_B__ y __END_B__ __START_A__ z __END_A__", colors, nid
    )
    assert 'wa-id="1"' in h1
    assert 'wa-id="2"' in h2 and 'wa-id="3"' in h2
    assert nid == 4
    # A keeps its color across turns
    assert h2.count(colors["A"][1]) == 1


def test_legend_round_trip():
    colors = EntityColors()
    _ = colors["PER"], colors["ORG"]
    legend = wa_color_legend(colors)
    back = entity_colors_from_html("<html>" + legend + "</html>")
    assert dict(back) == dict(colors)


def test_mismatched_close_raises():
    with pytest.raises(ValueError):
        markers_to_webannotator("__START_A__ x __END_B__")


def test_overflow_colors_deterministic():
    c1, c2 = EntityColors(), EntityColors()
    for i in range(20):
        t = "T%02d" % i
        assert c1[t] == c2[t]
    assert c1["T19"][1].startswith("#") and len(c1["T19"][1]) == 7
