# -*- coding: utf-8 -*-
"""Annotation QA: the flat-text re-expression of the reference's two
annotation-workflow CLIs.

* reference ``annotation_converter.py`` (GATE → WebAnnotator file
  converter, /root/reference/webstruct/annotation_converter.py:8-50):
  in the transcript graft this is a pure Column composition that
  already exists — :func:`convert_gate_to_webannotator` documents it
  (``gate_markers`` ingest → ``to_webannotator`` export, S3 + K2).
* reference ``annotation_verifier.py`` (GATE-vs-WA tree diff,
  /root/reference/webstruct/annotation_verifier.py:16-96): the DOM
  tree diff collapses to a (token, tag) STREAM diff in the flat-text
  world — two annotation formats agree iff they yield the same
  token/tag sequence.  :func:`stream_diff` is the single-node kernel;
  :func:`verify_annotations` runs it corpus-wide as an Arrow-batched
  pandas UDF and returns only the divergent rows (at 100 TB the
  verifier is a full-scan filter that emits a tiny defect table — no
  shuffle, no driver loop).
"""
from __future__ import annotations

from typing import Optional, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernel.bilou import encode_tokens
from ..kernel.tokenize import default_segment_words


def _stream(text: str) -> list:
    """(token, iob2_tag) pairs of one marker-bearing text — the same
    segment→encode composition as the gold extractor (per-turn unit,
    state never crosses calls)."""
    chars = [t[0] for t in default_segment_words(text or "")]
    return [(chars[i], tag) for i, tag in encode_tokens(chars)]


def stream_diff(left: str, right: str) -> Optional[dict]:
    """First divergence of two marker-bearing texts' (token, tag)
    streams, or None when the annotations agree.

    The flat-text analog of the reference verifier's
    ``tree_difference`` (annotation_verifier.py:83-96): instead of a
    DOM node path, the locator is the token index; instead of
    tag/attrib/text/tail cases, the reported reason is 'token',
    'tag', or 'length'.  A side whose markers don't even form a
    valid sequence (stray/crossing ``__END_X__`` → encode raises) is
    itself a defect to SURFACE, not a crash: reported as reason
    'encode-error' with the per-side error message — so a corpus-wide
    verify never dies on the first malformed row."""
    streams, errs = {}, {}
    for name, text in (("left", left), ("right", right)):
        try:
            streams[name] = _stream(text)
        except ValueError as e:
            errs[name] = str(e)
    if errs:
        return {
            "idx": -1,
            "reason": "encode-error",
            "left": errs.get("left", "ok"),
            "right": errs.get("right", "ok"),
        }
    ls, rs = streams["left"], streams["right"]
    for i, ((lt, ltag), (rt, rtag)) in enumerate(zip(ls, rs)):
        if lt != rt:
            return {"idx": i, "reason": "token",
                    "left": lt, "right": rt}
        if ltag != rtag:
            return {"idx": i, "reason": "tag",
                    "left": "%s/%s" % (lt, ltag),
                    "right": "%s/%s" % (rt, rtag)}
    if len(ls) != len(rs):
        return {"idx": min(len(ls), len(rs)), "reason": "length",
                "left": str(len(ls)), "right": str(len(rs))}
    return None


_DIFF_FIELDS = [
    T.StructField("diff_idx", T.IntegerType()),
    T.StructField("reason", T.StringType()),
    T.StructField("left", T.StringType()),
    T.StructField("right", T.StringType()),
]


def verify_annotations(
    df: DataFrame,
    left_col: str,
    right_col: str,
    id_cols: Sequence[str] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Rows of ``df`` where the two marker-bearing text columns
    (e.g. a GATE-ingested and a WebAnnotator-ingested rendering of
    the same turn) disagree, with the first divergence located.

    Output: id_cols + (diff_idx, reason, left, right) — empty when
    the corpus verifies clean.  One Arrow-batched pass, no shuffle."""
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols] + _DIFF_FIELDS
    )
    cols = list(id_cols) + [left_col, right_col]

    def run(batches):
        for pdf in batches:
            rows = []
            # positional column access (not itertuples+getattr, which
            # mangles any column name that isn't a valid Python
            # identifier) — the public API accepts every legal Spark
            # column name
            id_vals = [pdf[c].tolist() for c in id_cols]
            lefts = pdf[left_col].tolist()
            rights = pdf[right_col].tolist()
            for i in range(len(pdf)):
                d = stream_diff(lefts[i], rights[i])
                if d is not None:
                    rows.append(
                        tuple(v[i] for v in id_vals)
                        + (d["idx"], d["reason"], d["left"], d["right"])
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            )

    from ..operators.spread import widen_scan

    return widen_scan(df.select(*cols)).mapInPandas(run, out_schema)


def convert_gate_to_webannotator(
    text: Column, tagset: Sequence[str]
) -> Column:
    """GATE-annotated text → WebAnnotator HTML — the reference
    ``annotation_converter`` CLI as one Column expression: GATE
    ``<ENT>…</ENT>`` ingestion (loaders.gate_markers, S3) composed
    with the WebAnnotator span/legend export (loaders.to_webannotator,
    K2).  Colors are the deterministic EntityColors assignment, which
    stands in for the reference's --sample color transfer."""
    from .loaders import gate_markers, to_webannotator

    return to_webannotator(
        gate_markers(text, tagset), entity_types=tagset
    )
