# -*- coding: utf-8 -*-
"""infer_domain operator (A10/A11): most-likely domain per page —
the relational re-expression of
/root/reference/webstruct/infer_domain.py:22-74:

1. a real ``<base href>`` tag (either quote style, searched on
   comment-stripped html — reference ``_get_base_href``,
   infer_domain.py:68-72) wins; failing that, a commented-out base tag
   inside <head> comments (reference ``_get_commented_base_href``,
   infer_domain.py:61-66, double-quote-only regex).  A non-empty href
   short-circuits: its registered domain wins, even if empty;
2. otherwise every href's registered domain votes (attribute name
   anchored — ``wa_temp_href=`` does not vote), the 12-domain
   blacklist filtered out, most-common wins, ties to the
   lexicographically smallest (``sorted(top_domains)[0]``);
3. no evidence → ''.

Registered-domain extraction (reference ``get_domain``,
utils.py:315-324, which uses tldextract): host = authority of the
URL minus port, registered domain = last two labels, or last three
when the last two form a multi-part public suffix.  The full public
suffix list is not available offline, so a fixed common subset is
used — identically in the Spark expression and the DuckDB oracle SQL.

Everything is pure Column expressions (codegen, no Python):
regexp extraction → explode → count → window argmin.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# reference blacklist (infer_domain.py:22-27)
DOMAIN_BLACKLIST = (
    "google.com", "twitter.com", "facebook.com", "youtube.com",
    "fonts.com", "googleapis.com", "fonts.net", "addthis.com",
    "flickr.com", "paypal.com", "pinterest.com", "linkedin.com",
)

# Multi-part public suffixes: a curated offline subset of the public
# suffix list (https://publicsuffix.org/, public data) covering the
# common ccTLD second-level registries.  The reference uses tldextract
# with the full live PSL; suffixes outside this subset fall back to
# the last-two-labels rule (documented divergence — the DuckDB oracle
# shares the identical subset).
MULTI_TLD = (
    # UK / IE
    "co.uk", "org.uk", "gov.uk", "ac.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk",
    # Australia / NZ
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "maori.nz", "iwi.nz",
    # Japan / Korea / China / Taiwan / HK / SG / MY / ID / TH / VN / PH
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "ac.kr",
    "hs.kr", "ms.kr", "es.kr", "sc.kr",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "name.my",
    "co.id", "net.id", "or.id", "ac.id", "sch.id", "go.id", "web.id",
    "my.id", "biz.id",
    "co.th", "in.th", "or.th", "ac.th", "go.th", "mi.th", "net.th",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "ac.vn",
    "biz.vn", "info.vn", "name.vn", "pro.vn",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "ngo.ph",
    # South Asia / Middle East / Africa
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "edu.in", "gov.in", "ac.in", "res.in",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk", "biz.pk",
    "com.bd", "net.bd", "org.bd", "edu.bd", "gov.bd", "ac.bd",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "k12.tr",
    "av.tr", "bel.tr",
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il", "k12.il",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa", "sch.sa",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "sci.eg",
    "co.za", "net.za", "org.za", "gov.za", "edu.za", "ac.za", "web.za",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng",
    "co.ke", "ne.ke", "or.ke", "ac.ke", "go.ke", "sc.ke", "me.ke",
    # Europe (ccTLDs with registry second levels)
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "com.gr", "net.gr", "org.gr", "edu.gr", "gov.gr",
    "com.pt", "net.pt", "org.pt", "edu.pt", "gov.pt", "publ.pt",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "com.ro", "org.ro", "tm.ro", "nt.ro", "store.ro", "info.ro",
    # Americas
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br",
    "art.br", "blog.br", "eco.br",
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "int.ar",
    "mil.ar", "tur.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "nom.co",
    "mil.co",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "mil.pe",
    "nom.pe",
    "com.ve", "net.ve", "org.ve", "edu.ve", "gob.ve", "mil.ve",
    "co.ve", "info.ve", "web.ve",
    "com.ec", "net.ec", "org.ec", "edu.ec", "gob.ec", "fin.ec",
    "med.ec", "mil.ec", "pro.ec", "info.ec",
    "com.uy", "net.uy", "org.uy", "edu.uy", "gub.uy", "mil.uy",
    "com.py", "net.py", "org.py", "edu.py", "gov.py", "mil.py",
    "coop.py",
    "com.bo", "net.bo", "org.bo", "edu.bo", "gob.bo", "int.bo",
    "mil.bo", "tv.bo", "web.bo",
    "gob.cl",
    "co.cr", "fi.cr", "ac.cr", "go.cr", "or.cr", "sa.cr", "ed.cr",
    "com.do", "net.do", "org.do", "edu.do", "gob.do", "gov.do",
    "mil.do", "sld.do", "web.do", "art.do",
    "com.gt", "org.gt", "edu.gt", "gob.gt", "ind.gt", "mil.gt",
    "com.sv", "org.sv", "edu.sv", "gob.sv", "red.sv",
    "com.ni", "org.ni", "edu.ni", "gob.ni",
)

_HOST_RE = r'^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#:]+)'
# real <base href> tag, either quote style, attrs allowed before href
# (lxml lowercases HTML element/attribute names -> case-insensitive);
# searched on comment-STRIPPED html, so a commented tag never matches.
# `(?:[^>]*?\s)?` forces the attribute NAME to start right after
# whitespace, so substring attributes (wa_temp_href=, data-href=)
# inside the tag never match as the base href.
_BASE_TAG_RE = "(?is)<base\\s(?:[^>]*?\\s)?href\\s*=\\s*[\"']([^\"']*)[\"']"
# commented-out base tag fallback: the reference scans //head/comment()
# with the case-SENSITIVE, double-quote-only regex base\s+href="..."
# (/root/reference/webstruct/infer_domain.py:21,61-66) — applied here
# to the comments extracted from the <head> region.  The head region
# approximates lxml's implicit-head recovery: it ends at the first
# </head or <body, else spans the whole document (a page that omits
# the optional </head> still gets its head comments scanned).
# DOCUMENTED DIVERGENCE (same class as the other regex
# approximations): on a tag-soup page with NEITHER </head nor <body,
# lxml's recovery would move a comment that appears after visible
# body content into the implicit <body>, while this whole-document
# fallback still treats it as a head comment — a commented base tag
# in that position short-circuits here but not in the reference.  The
# DuckDB oracle applies the identical rule, so the driver gate stays
# in lockstep.
_HEAD_RE = r"(?is)^(.*?)(?:</head|<body|\z)"
_COMMENT_RE = r"(?s)<!--.*?-->"
_BASE_COMMENT_RE = r'base\s+href="([^"]*)"'
# vote hrefs: comments are stripped FIRST (the reference's lxml
# //*/@href never sees comment content), both quote styles accepted;
# the leading [^\w:-] anchors the attribute NAME so substring
# attributes (wa_temp_href=, data-href=) and NAMESPACED attributes
# (xlink:href= in inline SVG — lxml's //*/@href matches only the
# attribute named exactly 'href') do not vote; (?i) because lxml
# lowercases attribute names (HREF= votes in the reference)
_HREF_RE = "(?i)[^\\w:-]href=[\"']([^\"']*)[\"']"


def registered_domain_col(url):
    """Registered domain of a URL as a Column ('' when unparseable)."""
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # try_element_at: out-of-range -> NULL (ANSI-safe; the `when`
    # guards pick the right arity, but expressions evaluate eagerly)
    last2 = F.concat_ws(
        ".", F.try_element_at(labels, F.lit(-2)),
        F.try_element_at(labels, F.lit(-1)),
    )
    last3 = F.concat_ws(
        ".", F.try_element_at(labels, F.lit(-3)),
        F.try_element_at(labels, F.lit(-2)),
        F.try_element_at(labels, F.lit(-1)),
    )
    return (
        F.when(host == "", F.lit(""))
        .when((n >= 3) & last2.isin(*MULTI_TLD), last3)
        .when(n >= 2, last2)
        .otherwise(F.lit(""))
    )


def infer_domain(
    pages: DataFrame, id_col: str = "page_id", html_col: str = "html"
) -> DataFrame:
    """(page_id, domain) — reference get_tree_domain semantics: a real
    ``<base href>`` tag wins over a commented-out one (which is only
    looked for inside <head> comments), a non-empty href
    short-circuits to its registered domain, else the anchored href
    vote decides."""
    html_nc = F.regexp_replace(F.col(html_col), _COMMENT_RE, "")
    head = F.regexp_extract(F.col(html_col), _HEAD_RE, 1)
    head_comments = F.array_join(
        F.regexp_extract_all(head, F.lit(_COMMENT_RE), F.lit(0)), "\n"
    )
    real_base = F.regexp_extract(html_nc, _BASE_TAG_RE, 1)
    commented_base = F.regexp_extract(head_comments, _BASE_COMMENT_RE, 1)
    base = pages.select(
        F.col(id_col).alias("page_id"),
        F.col(html_col).alias("html"),
        F.when(real_base != "", real_base)
        .otherwise(commented_base)
        .alias("base_href"),
    )
    with_base = base.select(
        "page_id",
        "html",
        "base_href",
        registered_domain_col(F.col("base_href")).alias("base_domain"),
    )
    # vote path: explode href domains, filter blacklist, count, argmin
    hrefs = with_base.where(F.col("base_href") == "").select(
        "page_id",
        F.explode(
            F.regexp_extract_all(
                F.regexp_replace(F.col("html"), _COMMENT_RE, ""),
                F.lit(_HREF_RE),
                F.lit(1),
            )
        ).alias("href"),
    )
    voted = (
        hrefs.select(
            "page_id", registered_domain_col(F.col("href")).alias("d")
        )
        .where((F.col("d") != "") & ~F.col("d").isin(*DOMAIN_BLACKLIST))
        .groupBy("page_id", "d")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("page_id").orderBy(
        F.col("n").desc(), F.col("d").asc()
    )
    top = (
        voted.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("page_id", F.col("d").alias("vote_domain"))
    )
    return with_base.join(top, "page_id", "left").select(
        "page_id",
        F.when(F.col("base_href") != "", F.col("base_domain"))
        .otherwise(F.coalesce("vote_domain", F.lit("")))
        .alias("domain"),
    )


def infer_domain_oracle_sql(parquet_path: str) -> str:
    """DuckDB SQL computing the same result over the same parquet —
    the driver correctness oracle (kept in lockstep with the Column
    expressions above)."""
    multi = ", ".join("'%s'" % t for t in MULTI_TLD)
    black = ", ".join("'%s'" % d for d in DOMAIN_BLACKLIST)
    return f"""
        WITH pages AS (
            SELECT page_id, html,
                   CASE WHEN real_base != '' THEN real_base
                        ELSE commented_base END AS base_href
            FROM (
                SELECT page_id, html,
                    coalesce(regexp_extract(
                        regexp_replace(html, '<!--.*?-->', '', 'gs'),
                        '(?is)<base\\s(?:[^>]*?\\s)?href\\s*=\\s*["'']([^"'']*)["'']',
                        1), '') AS real_base,
                    coalesce(regexp_extract(
                        array_to_string(regexp_extract_all(
                            coalesce(regexp_extract(html,
                                '(?is)^(.*?)(?:</head|<body|\\z)', 1), ''),
                            '<!--.*?-->', 0, 's'), chr(10)),
                        'base\\s+href="([^"]*)"', 1), '') AS commented_base
                FROM read_parquet('{parquet_path}')
            )
        ), dom AS (
            SELECT *, CASE
                WHEN host = '' THEN ''
                WHEN len(labels) >= 3 AND
                     (labels[-2] || '.' || labels[-1]) IN ({multi})
                    THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
                WHEN len(labels) >= 2 THEN labels[-2] || '.' || labels[-1]
                ELSE '' END AS base_domain
            FROM (
                SELECT *, string_split(host, '.') AS labels FROM (
                    SELECT *, lower(coalesce(regexp_extract(base_href,
                        '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/?#:]+)', 1), ''))
                        AS host
                    FROM pages
                )
            )
        ), hrefs AS (
            SELECT page_id, unnest(regexp_extract_all(
                regexp_replace(html, '<!--.*?-->', '', 'gs'),
                '(?i)[^\\w:-]href=["'']([^"'']*)["'']', 1)) AS href
            FROM dom WHERE base_href = ''
        ), hdom AS (
            SELECT page_id, CASE
                WHEN host = '' THEN ''
                WHEN len(labels) >= 3 AND
                     (labels[-2] || '.' || labels[-1]) IN ({multi})
                    THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
                WHEN len(labels) >= 2 THEN labels[-2] || '.' || labels[-1]
                ELSE '' END AS d
            FROM (
                SELECT *, string_split(host, '.') AS labels FROM (
                    SELECT page_id, lower(coalesce(regexp_extract(href,
                        '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/?#:]+)', 1), ''))
                        AS host
                    FROM hrefs
                )
            )
        ), votes AS (
            SELECT page_id, d, count(*) AS n FROM hdom
            WHERE d != '' AND d NOT IN ({black})
            GROUP BY page_id, d
        ), top AS (
            SELECT page_id, d AS vote_domain FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY page_id ORDER BY n DESC, d ASC) AS rk
                FROM votes
            ) WHERE rk = 1
        )
        SELECT dom.page_id,
               CASE WHEN base_href != '' THEN base_domain
                    ELSE coalesce(vote_domain, '') END AS domain
        FROM dom LEFT JOIN top ON dom.page_id = top.page_id
    """
