# -*- coding: utf-8 -*-
"""Deterministic synthetic href-bearing HTML pages — the input for the
infer_domain operator (A10/A11;
/root/reference/webstruct/infer_domain.py:22-74 needs pages with
``<base href>`` tags, commented-out base tags, or plain links).

Generated as an idempotent sidecar (``html_pages.parquet``) next to a
transcript corpus: seed-fixed, wall-clock-free.  Page shapes:

* ~20%% carry a direct ``<base href="...">``,
* ~10%% carry a commented ``<!-- <base href="..."> -->``,
* the rest have only ``<a href>`` links (mode-vote territory),
  including blacklisted domains, subdomains, multi-part TLDs, and
  deliberate vote ties (exercising the sorted-first tie-break).
"""
from __future__ import annotations

import os
import random
from typing import List

import pyarrow as pa
import pyarrow.parquet as pq

_DOMAINS = [
    "example.com", "news-site.org", "acme-corp.com", "shop.example.co.uk",
    "data.gov.uk", "widgets.com.au", "blog.example.com", "tools.co.jp",
    "portal.net", "info-hub.org", "archive.example.co.uk", "mail.com.br",
]
_BLACKLISTED = [
    "google.com", "twitter.com", "facebook.com", "youtube.com",
    "fonts.com", "googleapis.com", "addthis.com", "linkedin.com",
]
_PATHS = ["", "/index.html", "/a/b?q=1", "/p", "/x/y/z#frag"]


def _url(rng: random.Random, domain: str) -> str:
    scheme = rng.choice(["http", "https"])
    sub = rng.choice(["", "www.", "cdn.", "m."])
    port = rng.choice(["", "", "", ":8080"])
    return "%s://%s%s%s%s" % (scheme, sub, domain, port, rng.choice(_PATHS))


def generate_html_pages(n_pages: int, seed: int = 42) -> List[dict]:
    rng = random.Random(seed * 31 + 7)
    rows = []
    for pid in range(n_pages):
        parts = ["<html><head><title>page %d</title>" % pid]
        shape = rng.random()
        if shape < 0.2:
            parts.append(
                '<base href="%s">' % _url(rng, rng.choice(_DOMAINS))
            )
        elif shape < 0.3:
            parts.append(
                '<!-- <base href="%s"> -->' % _url(rng, rng.choice(_DOMAINS))
            )
        parts.append("</head><body>")
        n_links = rng.randint(0, 12)
        for li in range(n_links):
            pool = _BLACKLISTED if rng.random() < 0.3 else _DOMAINS
            parts.append(
                '<a href="%s">link %d</a>' % (_url(rng, rng.choice(pool)), li)
            )
        parts.append("</body></html>")
        rows.append(dict(page_id=pid, html=" ".join(parts)))
    return rows


PAGES_SCHEMA = pa.schema([("page_id", pa.int64()), ("html", pa.string())])


def ensure_html_pages(corpus_dir: str, n_pages: int, seed: int = 42) -> str:
    """Write ``html_pages.parquet`` into ``corpus_dir`` if missing;
    returns the file path.

    An EXISTING file must have been generated with exactly this
    ``(n_pages, seed)`` — the conv→domain pairing is ``i % n_pages``
    over these specific pages, so a stale file from a caller that
    requested different parameters would silently change every
    downstream fold/domain assignment.  Enforced loudly (footer
    row-count + stored-seed schema metadata, no data scan) instead of
    documented-only; a legacy file without the seed key only gets the
    count check."""
    path = os.path.join(corpus_dir, "html_pages.parquet")
    if os.path.exists(path):
        md = pq.read_metadata(path)
        have = md.num_rows
        if have != n_pages:
            raise ValueError(
                "html_pages.parquet at %s has %d pages but %d were "
                "requested — delete the stale file (it is regenerated "
                "deterministically) or fix the caller's n_pages; see "
                "default_n_pages" % (path, have, n_pages)
            )
        kv = md.schema.to_arrow_schema().metadata or {}
        have_seed = kv.get(b"html_pages_seed")
        if have_seed is not None and have_seed != str(seed).encode():
            raise ValueError(
                "html_pages.parquet at %s was generated with seed %s "
                "but seed %d was requested — delete the stale file or "
                "fix the caller" % (path, have_seed.decode(), seed)
            )
        return path
    rows = generate_html_pages(n_pages, seed=seed)
    tbl = pa.Table.from_pydict(
        {
            "page_id": [r["page_id"] for r in rows],
            "html": [r["html"] for r in rows],
        },
        schema=PAGES_SCHEMA.with_metadata(
            {b"html_pages_seed": str(seed).encode()}
        ),
    )
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp)
    os.rename(tmp, path)
    return path


def sf_of_dir(corpus_dir: str) -> float:
    """Scale factor from a corpus dir basename ('…/sf0.01' → 0.01);
    0.01 when unparseable — the single parser shared by the driver
    entry, the gold builder and the CLI so page counts can never
    diverge between them."""
    base = os.path.basename(os.path.normpath(corpus_dir))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return 0.01


def default_n_pages(sf: float) -> int:
    """The one formula for how many synthetic HTML pages back a scale
    factor (used by ensure_html_pages callers; the file is written
    once, so every caller MUST agree on this number or the
    conv→domain pairing would depend on who generated it first)."""
    return max(60, int(5000 * sf))
