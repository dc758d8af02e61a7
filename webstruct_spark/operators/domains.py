# -*- coding: utf-8 -*-
"""infer_domain operator (A10/A11): most-likely domain per page —
the relational re-expression of
/root/reference/webstruct/infer_domain.py:22-74:

1. a ``<base href>`` (direct or commented out — the reference's
   ``_find_base_href`` regex ``base\\s+href="(...)"`` matches both)
   short-circuits: its registered domain wins, even if empty;
2. otherwise every href's registered domain votes, the 12-domain
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

# common multi-part public suffixes (offline subset of the PSL)
MULTI_TLD = (
    "co.uk", "org.uk", "gov.uk", "ac.uk", "co.jp", "or.jp",
    "com.au", "net.au", "com.br", "co.in", "co.nz", "co.za",
)

_HOST_RE = r'^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#:]+)'
# matches a direct OR commented-out base tag — exactly the reference's
# _find_base_href regex behavior (it searches comment text too)
_BASE_RE = r'base\s+href="([^"]*)"'
# vote hrefs: comments are stripped FIRST (the reference's lxml
# //*/@href never sees comment content), both quote styles accepted
_COMMENT_RE = r"(?s)<!--.*?-->"
_HREF_RE = r"href=[\"']([^\"']*)[\"']"


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
    """(page_id, domain) — reference get_tree_domain semantics."""
    base = pages.select(
        F.col(id_col).alias("page_id"),
        F.col(html_col).alias("html"),
        F.regexp_extract(html_col, _BASE_RE, 1).alias("base_href"),
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
                   coalesce(regexp_extract(html,
                       'base\\s+href="([^"]*)"', 1), '') AS base_href
            FROM read_parquet('{parquet_path}')
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
                'href=["'']([^"'']*)["'']', 1)) AS href
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
