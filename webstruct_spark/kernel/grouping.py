# -*- coding: utf-8 -*-
"""Unsupervised entity grouping (record assembly) with exact reference
parity.

Reproduces ``/root/reference/webstruct/grouping.py``:

* token positions: start at -5; +2 when the parent block changes, +1
  when the element changes, +2 per token (``grouping.py:140-154``).
  For transcripts the parent AND element both change at each turn
  boundary, so consecutive turns are 3 positions apart — the
  structural analog of a new element under a new parent.
* distances between consecutive entity spans
  (``grouping.py:157-167``),
* threshold clustering (``grouping.py:124-137``),
* the heuristic cluster score (+count for singleton-or-exempt tags,
  -count for duplicated tags, -1 per cluster; ``grouping.py:95-121``),
* threshold selection: candidate thresholds are the distinct distances
  except the first, sorted DESCENDING, and ``max`` keeps the FIRST
  maximal score — ties therefore go to the LARGER threshold
  (``grouping.py:81,92``).  This scan order is load-bearing; do not
  "improve" it.

Everything here is per-conversation and runs inside an
``applyInPandas`` group in the Spark layer
(``webstruct_spark/operators/grouping_op.py``).
"""
from __future__ import annotations

from collections import Counter
from typing import Any, Callable, List, Optional, Sequence, Set, Tuple

from .bilou import group_tags

Entity = Tuple[List[Any], str]  # (token infos, entity type)
Cluster = List[Tuple[List[Any], str, int]]  # [(infos, type, distance)]

# the ONE grouping-default definition; lives in the pyspark-free
# kernel so the single-node gold twin (sources/goldbuild.py) can use
# it without dragging pandas + pyspark into its import chain.
# operators/grouping_op.py re-exports it for the DataFrame-side users.
# Reference: webstruct/model.py extract_groups(dont_penalize=
# {'TEL','FAX'}) in tests/test_crfsuite.py:133-161.
DEFAULT_DONT_PENALIZE: Set[str] = {"TEL", "FAX"}


def block_positions(
    parent_ids: Sequence[Any], elem_ids: Sequence[Any]
) -> List[int]:
    """Integer page/transcript position per token."""
    pos = -(2 + 1 + 2)
    prev_parent = prev_elem = object()
    out: List[int] = []
    for parent, elem in zip(parent_ids, elem_ids):
        if parent != prev_parent:
            pos += 2
            prev_parent = parent
        if elem != prev_elem:
            pos += 1
            prev_elem = elem
        pos += 2
        out.append(pos)
    return out


def span_distances(start_end_pairs: Sequence[Tuple[int, int]]) -> List[int]:
    """Gap before each entity span: start_i - end_{i-1} (first gap is
    measured from position 0)."""
    out: List[int] = []
    prev_end = 0
    for start, end in start_end_pairs:
        out.append(start - prev_end)
        prev_end = end
    return out


def entities_with_positions(
    infos: Sequence[Any],
    tags: Sequence[str],
    positions: Sequence[int],
) -> Tuple[List[Entity], List[Tuple[int, int]]]:
    """Decode tagged tokens into entities plus (first, last) token
    positions per entity."""
    entities: List[Entity] = []
    spans: List[Tuple[int, int]] = []
    paired = list(zip(zip(infos, positions), tags))
    for items, tag in group_tags(paired):
        if tag == "O":
            continue
        toks = [it[0] for it in items]
        token_positions = [it[1] for it in items]
        entities.append((toks, tag))
        spans.append((token_positions[0], token_positions[-1]))
    return entities, spans


def cluster_by_threshold(
    entities: Sequence[Entity],
    distances: Sequence[int],
    threshold: int,
) -> List[Cluster]:
    groups: List[Cluster] = []
    buf: Cluster = []
    for (toks, tag), dist in zip(entities, distances):
        if dist > threshold and buf:
            groups.append(buf)
            buf = []
        buf.append((toks, tag, dist))
    if buf:
        groups.append(buf)
    return groups


def clustering_score(
    clusters: Sequence[Cluster],
    threshold: int,
    dont_penalize: Optional[Set[str]] = None,
) -> int:
    dont_penalize = set(dont_penalize or ())
    score = 0
    for cluster in clusters:
        cnt = Counter(tag for _toks, tag, _dist in cluster)
        cl_score = sum(v for k, v in cnt.items() if v == 1 or k in dont_penalize)
        cl_score -= sum(v for k, v in cnt.items() if v != 1 and k not in dont_penalize)
        cl_score -= 1
        score += cl_score
    return score


def best_clustering_entities(
    entities: Sequence[Entity],
    spans: Sequence[Tuple[int, int]],
    dont_penalize: Optional[Set[str]] = None,
    score_func: Optional[Callable[..., float]] = None,
) -> Tuple[int, float, List[Cluster]]:
    """Threshold argmax over pre-decoded entities + spans.

    This is the shuffle-minimal entry point: at scale the distributed
    layer decodes entities per turn (narrow), ships ONLY
    (entity, tag, span) rows to the conversation level, and calls this
    — token arrays never cross the shuffle boundary.
    """
    score = score_func or clustering_score
    distances = span_distances(spans)
    thresholds = sorted(set(distances[1:]), reverse=True)
    if not thresholds:
        return 0, 0, cluster_by_threshold(entities, distances, 0)
    best = None
    for thr in thresholds:  # descending: first max wins ties
        clusters = cluster_by_threshold(entities, distances, thr)
        s = score(clusters, thr, dont_penalize=dont_penalize)
        if best is None or s > best[1]:
            best = (thr, s, clusters)
    return best


def best_clustering(
    infos: Sequence[Any],
    tags: Sequence[str],
    positions: Sequence[int],
    dont_penalize: Optional[Set[str]] = None,
    score_func: Optional[Callable[..., float]] = None,
) -> Tuple[int, float, List[Cluster]]:
    """Token-level wrapper: decode entities, then threshold argmax.
    Returns ``(threshold, score, clusters)``."""
    entities, spans = entities_with_positions(infos, tags, positions)
    return best_clustering_entities(
        entities, spans, dont_penalize=dont_penalize, score_func=score_func
    )


import numpy as _np


def best_clustering_ids(
    tag_ids,
    distances,
    exempt_mask,
) -> Tuple[int, int, "_np.ndarray"]:
    """Vectorized threshold argmax (exact integer parity with
    :func:`best_clustering_entities`, fuzz-gated): given per-entity
    ``tag_ids`` (int array), ``distances`` (int array, first measured
    from 0) and a per-tag-id ``exempt_mask`` (dont_penalize), return
    ``(threshold, score, cluster_ids)``.

    All thresholds are evaluated in ONE (T, E) numpy pass: cluster ids
    by cumsum of boundary flags, scores by a single flat bincount over
    (threshold, cluster, tag) — no per-threshold Python loops.  Scan
    order (thresholds descending, first max wins) is preserved via
    ``argmax``.
    """
    tag_ids = _np.asarray(tag_ids, dtype=_np.int64)
    distances = _np.asarray(distances, dtype=_np.int64)
    E = tag_ids.shape[0]
    if E == 0:
        return 0, 0, _np.zeros(0, dtype=_np.int64)
    n_tags = int(exempt_mask.shape[0])
    thresholds = _np.unique(distances[1:])[::-1]  # descending
    if thresholds.shape[0] == 0:
        return 0, 0, _np.zeros(E, dtype=_np.int64)
    T = thresholds.shape[0]
    scores = _np.empty(T, dtype=_np.int64)
    # chunk thresholds so a mega-conversation (large E AND large T)
    # bounds the (chunk, clusters, tags) bincount to a few MB
    chunk = max(1, min(T, 4_000_000 // max(1, E * n_tags)))
    tag_row = tag_ids[None, :]
    for c0 in range(0, T, chunk):
        thr = thresholds[c0 : c0 + chunk]
        tc = thr.shape[0]
        # (tc, E) cluster ids: boundary when dist > thr (never at e=0)
        bounds = distances[None, 1:] > thr[:, None]
        cids = _np.zeros((tc, E), dtype=_np.int64)
        _np.cumsum(bounds, axis=1, out=cids[:, 1:])
        n_clusters = cids[:, -1] + 1
        cmax = int(n_clusters.max())
        stride_t = cmax * n_tags
        flat = (
            _np.arange(tc, dtype=_np.int64)[:, None] * stride_t
            + cids * n_tags
            + tag_row
        )
        counts = _np.bincount(flat.ravel(), minlength=tc * stride_t)
        tags_flat = _np.tile(_np.arange(n_tags, dtype=_np.int64), tc * cmax)
        sign = _np.where(
            (counts == 1) | exempt_mask[tags_flat], counts, -counts
        )
        scores[c0 : c0 + tc] = (
            sign.reshape(tc, stride_t).sum(axis=1) - n_clusters
        )
    best = int(_np.argmax(scores))  # first max = largest threshold
    thr_best = int(thresholds[best])
    best_cids = _np.zeros(E, dtype=_np.int64)
    _np.cumsum(distances[1:] > thr_best, out=best_cids[1:])
    return thr_best, int(scores[best]), best_cids


def token_position(global_token_index: int, turn_rank: int) -> int:
    """Closed form of :func:`block_positions` for transcripts where
    parent == elem == the turn: position = 2*g + 3*k with g = tokens
    before this one in the conversation and k = 0-based rank of the
    turn within the conversation.  Lets the distributed layer compute
    positions from per-turn token counts alone (cumulative sum), with
    no token-level shuffle."""
    return 2 * global_token_index + 3 * turn_rank
