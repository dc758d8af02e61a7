# -*- coding: utf-8 -*-
"""Annotation-ingestion functions (S2/S3): convert externally-annotated
text into the inline `` __START_X__ … __END_X__ `` marker format the
extraction chain consumes.

* :func:`gate_markers` — GATE-style ``<ORG>…</ORG>`` inline tags →
  markers, the Column re-expression of ``GateLoader.loadbytes``
  (/root/reference/webstruct/loaders.py:107-150): the reference
  regex-replaces ``<TYPE>``/``</TYPE>`` with `` __START_TYPE__ `` /
  `` __END_TYPE__ `` (spaces included) before any parsing.
* :func:`wa_span_markers` — WebAnnotator-style
  ``<span wa-type="X" …>…</span>`` runs → markers
  (``WebAnnotatorLoader``, loaders.py:56-104, simplified to the flat
  single-span case — transcripts have no DOM so nested/split spans
  cannot arise).

Both are pure ``regexp_replace`` chains: JVM-side, codegen'd, no
Python.
"""
from __future__ import annotations

from typing import Optional, Sequence, Set

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def gate_markers(text: Column, tagset: Sequence[str]) -> Column:
    """``<ORG>Acme</ORG>`` → `` __START_ORG__ Acme __END_ORG__ ``."""
    alternation = "|".join(tagset)
    out = F.regexp_replace(
        text, r"<(%s)>" % alternation, r" __START_$1__ "
    )
    return F.regexp_replace(out, r"</(%s)>" % alternation, r" __END_$1__ ")


def wa_span_markers(text: Column, known_entities=None) -> Column:
    """``<span wa-type="ORG" ...>Acme</span>`` →
    `` __START_ORG__ Acme __END_ORG__ `` (flat spans).

    ``known_entities`` applies the P4 projection first: spans of any
    OTHER wa-type are unwrapped to their inner text (the reference's
    ``_prune_tags``/``drop_tag``, loaders.py:81-85) before conversion.
    """
    if known_entities is not None:
        alternation = "|".join(known_entities)
        text = F.regexp_replace(
            text,
            r'<span[^>]*wa-type="(?!(?:%s)")\w+"[^>]*>([^<]*)</span>'
            % alternation,
            r"$1",
        )
    out = F.regexp_replace(
        text,
        r'<span[^>]*wa-type="(\w+)"[^>]*>([^<]*)</span>',
        r" __START_$1__ $2 __END_$1__ ",
    )
    return out


def wa_markers_nested(text: Column, known_entities=None) -> Column:
    """Full WebAnnotator ingestion including NESTED / overlapping /
    split same-wa-id spans (kernel/wadom.py — exact
    ``WebAnnotatorLoader`` semantics, reference loaders.py:56-104,
    gated by the reference's nested-fragment golden).  Pandas UDF;
    use :func:`wa_span_markers` (pure Column regex) when the input is
    known to be flat single spans."""
    from ..kernel.wadom import wa_to_markers

    known = None if known_entities is None else set(known_entities)

    @pandas_udf(T.StringType())
    def _udf(html: pd.Series) -> pd.Series:
        return html.map(lambda h: wa_to_markers(h or "", known))

    return _udf(text)


def to_webannotator(text: Column, entity_types=()) -> Column:
    """K2 export: marker-bearing text → WebAnnotator span HTML with a
    per-turn <wa-color> legend appended (kernel/wadom.py
    markers_to_webannotator; reference webannotator.py:376-434).
    The color map is rebuilt PER ROW, pre-seeded with ``entity_types``
    in the given order — so output is a pure function of the row
    (batch/partition layout cannot change colors or leak other rows'
    types into a turn's legend).  Pass the full tagset for stable
    colors across turns; an unseeded type gets its color from
    first-appearance order within its own turn.  wa-ids restart at 1
    per turn (turns are independent rows — the reference numbers per
    page)."""
    from ..kernel.wadom import (
        EntityColors,
        markers_to_webannotator,
        wa_color_legend,
    )

    seed_types = tuple(entity_types)

    @pandas_udf(T.StringType())
    def _udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            colors = EntityColors()
            for st in seed_types:
                colors[st]
            html, colors, _nid = markers_to_webannotator(t or "", colors, 1)
            out.append(html + wa_color_legend(colors))
        return pd.Series(out)

    return _udf(text)
