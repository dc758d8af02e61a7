# -*- coding: utf-8 -*-
"""infer_domain (A10/A11): base-href short-circuit, commented base,
blacklist-filtered mode vote with sorted-first tie-break, registered-
domain extraction incl. multi-part TLDs."""
from pyspark.sql import functions as F

from webstruct_spark.operators.domains import (
    infer_domain,
    registered_domain_col,
)


def _domains(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["d"]
        for r in df.select(registered_domain_col(F.col("url")).alias("d"))
        .collect()
    ]


def test_registered_domain_reference_doctests(spark):
    # /root/reference/webstruct/utils.py:315-324 goldens
    assert _domains(
        spark,
        [
            "http://example.com/path",
            "https://hello.example.com/foo/bar",
            "http://hello.example.co.uk/foo?bar=1",
            "https://www.data.gov.uk:8080/x",
            "not a url",
            "http://localhost/x",
        ],
    ) == ["example.com", "example.com", "example.co.uk", "data.gov.uk",
          "", ""]


def _infer(spark, pages):
    df = spark.createDataFrame(pages, "page_id long, html string")
    return {r["page_id"]: r["domain"] for r in infer_domain(df).collect()}


def test_base_href_short_circuits(spark):
    got = _infer(
        spark,
        [
            (1, '<base href="http://a.example.com/x">'
                '<a href="http://other.org/1"><a href="http://other.org/2">'),
            # commented base is found inside <head> comments (reference
            # scans //head/comment() only)
            (2, '<head><!-- <base href="https://commented.co.uk/y"> -->'
                '</head><a href="http://other.org/1">'),
            # a commented base OUTSIDE <head> is ignored -> vote wins
            (3, '<body><!-- <base href="https://commented.co.uk/y"> -->'
                '<a href="http://other.org/1"></body>'),
            # a real base tag wins over an earlier commented one
            (4, '<head><!-- <base href="http://stale.org/"> --></head>'
                "<base href='http://real.example.com/'>"
                '<a href="http://other.org/1">'),
            # single-quoted real base tag is accepted (lxml parity)
            (5, "<base target='_top' href='http://sq.example.co.uk/'>"),
            # commented base is double-quote-only (reference regex)
            (6, "<head><!-- <base href='http://sq-comment.org/'> --></head>"
                '<a href="http://vote.org/1">'),
        ],
    )
    assert got[1] == "example.com"
    assert got[2] == "commented.co.uk"
    assert got[3] == "other.org"
    assert got[4] == "example.com"
    assert got[5] == "example.co.uk"
    assert got[6] == "vote.org"


def test_multi_tld_subset(spark):
    """com.mx-style suffixes from the extended offline PSL subset."""
    assert _domains(
        spark,
        [
            "http://www.tienda.com.mx/x",
            "https://foo.bar.gob.mx/y",
            "http://shop.example.com.ar/z",
            "http://a.b.co.ke/",
            "http://plain.example.io/",
        ],
    ) == ["tienda.com.mx", "bar.gob.mx", "example.com.ar", "b.co.ke",
          "example.io"]


def test_anchored_href_vote(spark):
    """Substring attributes (wa_temp_href=, data-href=) must not vote
    — lxml's //*/@href matches the attribute NAME exactly."""
    got = _infer(
        spark,
        [
            (1, '<a wa_temp_href="http://fake.org/1" '
                'data-href="http://fake.org/2" '
                'href="http://real.com/1">'),
        ],
    )
    assert got[1] == "real.com"


def test_namespaced_href_does_not_vote(spark):
    """xlink:href= (inline SVG) must not vote either: ':' is a
    non-word character, so a bare [^\\w-] anchor would let it through,
    but lxml's //*/@href matches only the attribute named exactly
    'href'."""
    got = _infer(
        spark,
        [
            (1, '<svg><use xlink:href="http://sprite.net/icons#a"/>'
                '<use xlink:href="http://sprite.net/icons#b"/></svg>'
                '<a href="http://real.com/1">x</a>'),
        ],
    )
    assert got[1] == "real.com"


def test_mode_vote_blacklist_and_tie(spark):
    got = _infer(
        spark,
        [
            # google.com is blacklisted even though most common
            (1, '<a href="http://google.com/1"><a href="http://google.com/2">'
                '<a href="http://acme.com/1">'),
            # 2-2 tie -> lexicographically smallest wins
            (2, '<a href="http://zeta.org/1"><a href="http://zeta.org/2">'
                '<a href="http://alpha.org/1"><a href="http://alpha.org/2">'),
            # nothing usable -> ''
            (3, '<a href="http://google.com/only"> plain text'),
            (4, "no links at all"),
        ],
    )
    assert got[1] == "acme.com"
    assert got[2] == "alpha.org"
    assert got[3] == ""
    assert got[4] == ""


def test_commented_links_and_single_quotes(spark):
    """Reference lxml never sees comment content as hrefs; attributes
    may use single quotes."""
    got = _infer(
        spark,
        [
            # commented-out links must NOT vote
            (1, '<!-- <a href="http://stale.org/1"><a href="http://stale.org/2"> -->'
                '<a href="http://real.com/1">'),
            # single-quoted href must vote
            (2, "<a href='http://single.org/x'>"),
        ],
    )
    assert got[1] == "real.com"
    assert got[2] == "single.org"


def test_base_attr_name_anchoring(spark):
    """Substring attributes inside a <base> tag (wa_temp_href=,
    data-href=) are not the base href — lxml reads the attribute NAMED
    href; the WebAnnotator corpus rewrites href to wa_temp_href, so
    matching it would short-circuit to the wrong domain."""
    got = _infer(
        spark,
        [
            # wa_temp_href only: no real base -> the href vote decides
            (1, "<base target='_top' wa_temp_href='http://evil.org/'>"
                '<a href="http://real.com/1">'),
            # data-href before the real href: the real one wins
            (2, '<base data-href="http://decoy.org/" '
                'href="http://real.example.com/">'),
        ],
    )
    assert got[1] == "real.com"
    assert got[2] == "example.com"


def test_uppercase_href_votes(spark):
    """lxml lowercases HTML attribute names, so HREF= votes in the
    reference — legacy uppercase HTML must count here too."""
    got = _infer(
        spark,
        [(1, '<A HREF="http://legacy.com/1"><A HREF="http://legacy.com/2">'
             '<a href="http://other.org/1">')],
    )
    assert got[1] == "legacy.com"


def test_commented_base_without_closing_head(spark):
    """HTML5 allows omitting </head>; lxml still builds the head
    element, so the reference finds head comments there.  The head
    region falls back to everything before <body (else the whole
    document)."""
    got = _infer(
        spark,
        [
            # no </head>: head region ends at <body
            (1, '<head><!-- <base href="http://commented.co.uk/x"> -->'
                '<title>t</title><body><a href="http://other.org/1">'),
            # no </head> and no <body>: whole document is scanned
            (2, '<head><!-- <base href="http://commented.com/x"> -->'
                '<a href="http://other.org/1">'),
        ],
    )
    assert got[1] == "commented.co.uk"
    assert got[2] == "commented.com"


def test_ensure_html_pages_rejects_stale_count(tmp_path):
    """The conv→domain pairing is i % n_pages, so a pre-existing
    pages file generated with a DIFFERENT count must fail loudly, not
    silently redefine every fold/domain assignment."""
    import pytest

    from webstruct_spark.sources.html_pages import ensure_html_pages

    d = str(tmp_path)
    p1 = ensure_html_pages(d, n_pages=60)
    assert ensure_html_pages(d, n_pages=60) == p1  # same count: fine
    with pytest.raises(ValueError, match="60 pages but 500"):
        ensure_html_pages(d, n_pages=500)


def test_ensure_html_pages_rejects_stale_seed(tmp_path):
    import pytest

    from webstruct_spark.sources.html_pages import ensure_html_pages

    d = str(tmp_path)
    ensure_html_pages(d, n_pages=60, seed=42)
    assert ensure_html_pages(d, n_pages=60, seed=42)  # same params: fine
    with pytest.raises(ValueError, match="seed 42 .* seed 7"):
        ensure_html_pages(d, n_pages=60, seed=7)
