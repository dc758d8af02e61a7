# -*- coding: utf-8 -*-
"""Nested/overlapping WebAnnotator spans: the reference's own
``test_wa_nested_fragment`` golden
(/root/reference/webstruct/tests/test_loaders.py:47-) ported to the
wadom loader — same fragments, same expected {token: tag} maps,
including the overlapping addr-vs-city/state/country annotations and
split same-wa-id spans."""
from webstruct_spark.kernel.bilou import encode_tokens
from webstruct_spark.kernel.tokenize import default_segment_words
from webstruct_spark.kernel.wadom import wa_to_markers

FRAGMENT = """
<div class="copyright">Copyright Â© 2013 <span style="color: rgb(0, 0, 0); background-color: rgb(255, 0, 0); text-decoration: none;" wa-subtypes="" wa-id="227" wa-type="org" class="WebAnnotator_org">Weatherseal Spray Foam.</span> All Rights Reserved.<br>
Website Designed by <a wa_temp_href="http://www.western-webs.com" target="_blank" title="www.western-webs.com">Western-Webs</a>,
                <a wa_temp_href="http://tuam.galway-ireland.ie" target="_blank" title="http://tuam.galway-ireland.ie"><span style="color: rgb(0, 0, 0); background-color: rgb(51, 204, 255); text-decoration: none;" wa-subtypes="" wa-id="2010" wa-type="city" class="WebAnnotator_city"><span style="color: rgb(255, 255, 255); background-color: rgb(102, 51, 102); text-decoration: none;" wa-subtypes="" wa-id="2011" wa-type="addr" class="WebAnnotator_addr">Tuam</span></span></a><span style="color: rgb(255, 255, 255); background-color: rgb(102, 51, 102); text-decoration: none;" wa-subtypes="" wa-id="2011" wa-type="addr" class="WebAnnotator_addr">,
                </span><a wa_temp_href="http://www.galway-ireland.ie" target="_blank" title="www.galway-ireland.ie/"><span style="color: rgb(0, 0, 0); background-color: rgb(255, 0, 0); text-decoration: none;" wa-subtypes="" wa-id="2009" wa-type="state" class="WebAnnotator_state"><span style="color: rgb(255, 255, 255); background-color: rgb(102, 51, 102); text-decoration: none;" wa-subtypes="" wa-id="2011" wa-type="addr" class="WebAnnotator_addr">County Galway</span></span></a><span style="color: rgb(255, 255, 255); background-color: rgb(102, 51, 102); text-decoration: none;" wa-subtypes="" wa-id="2011" wa-type="addr" class="WebAnnotator_addr">,</span>
                <a wa_temp_href="http://www.ebookireland.com" target="_blank" title="www.ebookireland.com"><span style="color: rgb(0, 0, 0); background-color: rgb(255, 153, 0); text-decoration: none;" wa-subtypes="" wa-id="2008" wa-type="country" class="WebAnnotator_country"><span style="color: rgb(255, 255, 255); background-color: rgb(102, 51, 102); text-decoration: none;" wa-subtypes="" wa-id="2011" wa-type="addr" class="WebAnnotator_addr"> Ireland</span></span></a></div>
"""

FRAGMENT2 = """
    <div class="copyright">Copyright Â© 2013 <span style="color: rgb(0, 0, 0); background-color: rgb(255, 0, 0); text-decoration: none;" wa-subtypes="" wa-id="227" wa-type="org" class="WebAnnotator_org">Weatherseal Spray Foam.</span> All Rights Reserved.<br>
Website Designed by <a wa_temp_href="http://www.western-webs.com" target="_blank" title="www.western-webs.com">Western-Webs</a>,
                <a wa_temp_href="http://tuam.galway-ireland.ie" target="_blank" title="http://tuam.galway-ireland.ie"><span style="color: rgb(255, 255, 255); background-color: rgb(102, 51, 102); text-decoration: none;" wa-subtypes="" wa-id="2012" wa-type="addr" class="WebAnnotator_addr"><span style="color: rgb(0, 0, 0); background-color: rgb(51, 204, 255); text-decoration: none;" wa-subtypes="" wa-id="2013" wa-type="city" class="WebAnnotator_city">Tuam</span></span></a><span style="color: rgb(255, 255, 255); background-color: rgb(102, 51, 102); text-decoration: none;" wa-subtypes="" wa-id="2012" wa-type="addr" class="WebAnnotator_addr">,
<span style="color: rgb(0, 0, 0); background-color: rgb(255, 0, 0); text-decoration: none;" wa-subtypes="" wa-id="2014" wa-type="state" class="WebAnnotator_state">                </span></span><a wa_temp_href="http://www.galway-ireland.ie" target="_blank" title="www.galway-ireland.ie/"><span style="color: rgb(255, 255, 255); background-color: rgb(102, 51, 102); text-decoration: none;" wa-subtypes="" wa-id="2012" wa-type="addr" class="WebAnnotator_addr"><span style="color: rgb(0, 0, 0); background-color: rgb(255, 0, 0); text-decoration: none;" wa-subtypes="" wa-id="2014" wa-type="state" class="WebAnnotator_state">County Galway</span></span></a><span style="color: rgb(255, 255, 255); background-color: rgb(102, 51, 102); text-decoration: none;" wa-subtypes="" wa-id="2012" wa-type="addr" class="WebAnnotator_addr">,</span>
                <a wa_temp_href="http://www.ebookireland.com" target="_blank" title="www.ebookireland.com"><span style="color: rgb(255, 255, 255); background-color: rgb(102, 51, 102); text-decoration: none;" wa-subtypes="" wa-id="2012" wa-type="addr" class="WebAnnotator_addr"><span style="color:#000000; background-color:#FF9900;" wa-subtypes="" wa-id="2015" wa-type="country" class="WebAnnotator_country"> Ireland</span></span></a></div>"""

EXPECTED1 = {
    "Tuam": "B-city", "County": "B-state", "Galway": "I-state",
    "Ireland": "B-country",
}
EXPECTED2 = {
    "Tuam": "B-addr", "County": "I-addr", "Galway": "I-addr",
    "Ireland": "I-addr",
}


def _tags(fragment, known):
    text = wa_to_markers(fragment, known_entities=known)
    chars = [t[0] for t in default_segment_words(text)]
    return {chars[i]: tag for i, tag in encode_tokens(chars)}


def _assert_entities(fragment, known, expected):
    got = _tags(fragment, known)
    for token, tag in expected.items():
        assert got.get(token) == tag, (token, got.get(token), tag)


def test_wa_nested_fragment_reference_golden():
    _assert_entities(FRAGMENT, {"city", "state", "country", "street"},
                     EXPECTED1)
    _assert_entities(FRAGMENT, {"addr"}, EXPECTED2)
    _assert_entities(FRAGMENT2, {"city", "state", "country", "street"},
                     EXPECTED1)
    _assert_entities(FRAGMENT2, {"addr"}, EXPECTED2)


def test_untagged_tokens_are_O():
    got = _tags(FRAGMENT, {"city"})
    assert got["Website"] == "O"
    assert got["Copyright"] == "O"
    assert got["Tuam"] == "B-city"


def test_split_span_same_id_is_one_entity():
    html = (
        'a <span wa-id="1" wa-type="org">Acme</span> x '
        '<span wa-id="1" wa-type="org">Systems</span> b'
    )
    got = _tags(html, None)
    assert got["Acme"] == "B-org"
    assert got["x"] == "I-org"  # between first and last span of id 1
    assert got["Systems"] == "I-org"
    assert got["a"] == "O" and got["b"] == "O"


def test_wa_color_legend_dropped():
    html = (
        '<span wa-id="9" wa-type="per">Ada</span>'
        "<wa-color>PER legend noise</wa-color> tail"
    )
    text = wa_to_markers(html, None)
    assert "legend" not in text
    assert "__START_per__" in text and "tail" in text


def test_single_quoted_and_unquoted_wa_attrs():
    """lxml accepts wa-id='1' / wa-type=ORG; the minimal parser must
    not silently drop such annotations (ADVICE r2)."""
    from webstruct_spark.kernel.wadom import wa_to_markers

    h = ("<p>Visit <span wa-id='3' wa-type='ORG' class=hl>Acme "
         "Corp</span> today</p>")
    out = wa_to_markers(h)
    assert "__START_ORG__" in out and "__END_ORG__" in out, out
    h2 = '<p><span wa-id=5 wa-type=CITY>Oslo</span></p>'
    out2 = wa_to_markers(h2)
    assert "__START_CITY__" in out2, out2


def test_entity_colors_never_collide():
    from webstruct_spark.kernel.wadom import EntityColors

    ec = EntityColors()
    for i in range(300):
        ec["TYPE%03d" % i]
    bgs = [bg for _fg, bg, _i in ec.values()]
    assert len(set(bgs)) == len(bgs)
