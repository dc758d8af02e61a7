# -*- coding: utf-8 -*-
"""Trained-model tagging path (closes SURVEY M1): distributed label
extraction → deterministic driver-side fit on a bounded sample →
broadcast weights → distributed batched-Viterbi inference.

Mirrors the reference train→predict workflow
(/root/reference/webstruct/crfsuite.py:49-97,
/root/reference/webstruct/wapiti.py:178-246): the labeled sample is
what the reference would load from annotated trees; the fit is the
averaged-perceptron CRF in :mod:`webstruct_spark.kernel.crf`; the
predict is the same flat-row mapInPandas shape as the rule tagger.

Scale notes: the TRAINING sample is bounded (``sample`` turns,
order-deterministic) — exactly the reference's posture (its CI trains
on a handful of pages).  INFERENCE is fully distributed and narrow.
The labeled-sample collect is the only driver materialization.
"""
from __future__ import annotations

import uuid
from typing import Dict, List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernel.bilou import encode_tokens
from ..kernel.crf import CRFTagger
from ..kernel.tokenize import default_segment_words
from .tagger import DEFAULT_TYPES

_CRF_CACHE: Dict[str, CRFTagger] = {}


def labeled_sequences(text: str) -> Tuple[List[str], List[str]]:
    """(clean_tokens, gold_iob2_tags) from one marker-bearing turn."""
    toks = default_segment_words(text or "")
    chars = [t[0] for t in toks]
    idx_tags = encode_tokens(chars)
    return [chars[i] for i, _ in idx_tags], [t for _, t in idx_tags]


def train_crf(
    turns: DataFrame,
    entity_types=DEFAULT_TYPES,
    sample: int = 1500,
    epochs: int = 4,
    text_col: str = "text",
    feat_hash_dim: int | None = None,
) -> CRFTagger:
    """Fit the averaged-perceptron CRF on the first ``sample`` labeled
    turns in stable (conv_id, turn_idx) order — deterministic, so a
    single-node fit on the same rows yields identical weights."""
    rows = (
        turns.select("conv_id", "turn_idx", F.col(text_col).alias("text"))
        .orderBy("conv_id", "turn_idx")
        .limit(sample)
        .collect()
    )
    seqs = [labeled_sequences(r["text"]) for r in rows]
    return CRFTagger(entity_types, feat_hash_dim=feat_hash_dim).fit(
        seqs, epochs=epochs
    )


def train_crf_local(
    texts, entity_types=DEFAULT_TYPES, sample: int = 1500, epochs: int = 4,
    feat_hash_dim: int | None = None,
) -> CRFTagger:
    """Single-node twin of :func:`train_crf` over an already-ordered
    text iterable (the gold builder path).  Must stay in lockstep."""
    seqs = [labeled_sequences(t) for t in list(texts)[:sample]]
    return CRFTagger(entity_types, feat_hash_dim=feat_hash_dim).fit(
        seqs, epochs=epochs
    )


# -- distributed training (iterated parameter mixing) -------------------


def prepare_fit_rows(
    turns: DataFrame,
    n_parts: int = 8,
    text_col: str = "text",
    tag_col: str | None = None,
):
    """Row-granularity fit inputs for :func:`train_crf_distributed`:
    an RDD of ``(pid, tag, (conv_id, turn_idx, text), seq, feats)``
    identity-partitioned by ``pid = crc32(conv_id) % n_parts`` — the
    same shard assignment the trainer uses — with tokenization, gold
    BILOU encoding, and token-feature extraction already done per row.

    Purpose: cross-validation reuse.  Tokenize/featurize are the
    expensive, ROW-LOCAL, split-invariant part of every fit; a k-fold
    caller (:func:`webstruct_spark.operators.domain_cv.
    domain_group_kfold_eval`) prepares the corpus ONCE, persists the
    result, and hands each fold's training cut to the trainer via
    ``prepared=`` + ``prepared_keep=`` — k-1 redundant featurization
    passes collapse into one, and the fold filter runs executor-side
    on the per-row ``tag`` (no driver-held id sets).  Byte-identity
    with the non-prepared path is guaranteed because the trainer
    re-applies the identical per-shard full-triple sort before
    grouping (pytest-gated in test_trained_crf).

    ``tag_col`` names an int/str column carried per row (e.g. the CV
    fold) for ``prepared_keep`` to filter on; None stores 0.

    The caller owns persistence: ``rdd.persist(...)`` before the
    first fit, ``unpersist()`` after the last.
    """
    from pyspark.sql import functions as F

    from ..kernel.crf import token_features

    cols = ["conv_id", "turn_idx", F.col(text_col).alias("text")]
    if tag_col is not None:
        cols.append(F.col(tag_col).alias("_tag"))
    src = turns.select(*cols).withColumn(
        "pid",
        (F.crc32(F.col("conv_id").cast("binary")) % n_parts).cast("int"),
    )
    has_tag = tag_col is not None

    def _featurize(kv):
        pid, (key, tag) = kv
        seq = labeled_sequences(key[2])
        toks = seq[0]
        feats = [token_features(toks, i) for i in range(len(toks))]
        return pid, tag, key, seq, feats

    return (
        src.rdd.map(
            lambda r, _t=has_tag: (
                int(r["pid"]),
                (
                    (r["conv_id"], int(r["turn_idx"]), r["text"]),
                    r["_tag"] if _t else 0,
                ),
            )
        )
        .partitionBy(n_parts, lambda pid: pid)
        .map(_featurize, preservesPartitioning=True)
    )


def train_crf_distributed(
    turns: DataFrame | None,
    entity_types=DEFAULT_TYPES,
    n_parts: int = 8,
    rounds: int = 4,
    sample: int | None = None,
    text_col: str = "text",
    min_feat_df: int | None = 2,
    feat_hash_dim: int | None = None,
    prepared=None,
    prepared_keep=None,
) -> CRFTagger:
    """Distributed CRF training over the FULL labeled corpus (or an
    optional bounded head) via iterated parameter mixing (McDonald,
    Hall & Mann, NAACL 2010): each mixing round broadcasts the current
    weights, every partition runs one deterministic averaged-perceptron
    epoch from them over its own shard (sorted (conv_id, turn_idx,
    text) triples), and the per-feature parameter average is computed
    EXECUTOR-SIDE in ascending pid order.

    This closes the reference workflow gap left by :func:`train_crf`
    (which, like the reference CI — /root/reference/webstruct/
    tests/test_crfsuite.py:31-60 — trains on a small sorted head): the
    reference's ``WapitiCRF.fit`` (/root/reference/webstruct/
    wapiti.py:178-246) trains on the whole annotated corpus, and so
    does this, without ever collecting the corpus to the driver.

    Determinism (load-bearing for the driver hash oracle vs the
    single-node twin :func:`train_crf_mixed_local`): the shard
    assignment is ``crc32(conv_id) % n_parts`` (bit-identical JVM-side
    and in :mod:`zlib`), every shard fit is input-order deterministic
    with no RNG, and every per-feature average sums its shard vectors
    in ascending pid order from a zero accumulator — the float-op
    sequence of :meth:`CRFTagger.average_exports` exactly, so the
    mixed weights are byte-identical to the twin's.

    Model-size bound: ``min_feat_df`` prunes every feature whose
    document frequency (number of training sequences containing it)
    is below the threshold BEFORE any fitting — the reference's own
    min_df posture (/root/reference/webstruct/
    feature_extraction.py:147-163 prunes rare features the same way)
    applied to the perceptron feature space.  On natural-language
    corpora the ``w=``/``p=``/``n=`` lexical features are Zipf-
    distributed, so df>=2 alone removes the hapax-legomena majority of
    the vocabulary; the per-round weight blobs, the per-round shuffle,
    and the final broadcast model all scale with the SHARED vocabulary
    instead of the raw token vocabulary.  ``min_feat_df=None`` (or 1)
    disables pruning.  ``feat_hash_dim`` additionally hashes every
    feature into a FIXED number of buckets (the hashing trick,
    Weinberger et al. 2009) — a hard corpus-INDEPENDENT bound on
    model size for corpora whose shared vocabulary is itself huge;
    the model owns the map, so broadcast inference applies it
    transparently.  Both knobs compose (prune on raw names, then
    hash) and both stay byte-identical to the twin.

    100 TB shape: ONE corpus shuffle total (an identity
    ``partitionBy`` that pins exactly one shard per partition — a
    hash-partitioned ``groupBy(pid)`` co-locates 2-3 shards per task
    by balls-in-bins and every round then waits on the heaviest task),
    tokenization + gold encoding + feature extraction run once
    (round-invariant, cached with the partition; MEMORY_AND_DISK, so
    it spills rather than OOMs).  Each mixing round is a shuffle-free
    ``mapPartitions`` fit followed by a small per-feature
    ``groupByKey`` (n_parts bounded vectors per key) whose averaged
    output — exactly ONE model — is what the driver collects and
    broadcasts; the driver never holds n_parts simultaneous weight
    blobs (the round-3 scale caveat).

    ``prepared``/``prepared_keep``: reuse path for k-fold callers.
    ``prepared`` is a :func:`prepare_fit_rows` RDD (already
    featurized, identity-partitioned with the same crc32 shards);
    ``prepared_keep`` is an executor-side predicate over each row's
    tag (e.g. ``lambda fold: fold != held_out``).  The trainer then
    skips the corpus shuffle AND the featurization — only the fold
    filter, the per-shard sort, and the fit rounds run — and stays
    byte-identical to the ``turns=`` path (pytest
    test_prepared_rows_byte_identical).  ``turns`` may be None in
    this mode; ``sample=`` is rejected.
    """
    from itertools import chain
    from operator import add as _add

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    import numpy as np

    if prepared is not None:
        if sample is not None:
            raise ValueError(
                "train_crf_distributed: sample= is incompatible with "
                "prepared= (the head cut happens before featurization)"
            )
        if prepared.getNumPartitions() != n_parts:
            # shard assignment comes from the prepared RDD, so a
            # layout/n_parts mismatch would silently fit a different
            # shard count than the caller (and the twin) believe
            raise ValueError(
                "train_crf_distributed: prepared RDD has %d shards "
                "but n_parts=%d — prepare_fit_rows must be built "
                "with the same n_parts"
                % (prepared.getNumPartitions(), n_parts)
            )
        if prepared.partitioner is None:
            # count alone can't prove shard purity: a repartition()
            # or a pickle-file round-trip keeps 'n_parts partitions'
            # but mixes pids within them, and _prep_grp labels each
            # partition by its first row's pid — silent shard mixing
            raise ValueError(
                "train_crf_distributed: prepared RDD lost its "
                "partitioner (repartitioned or reloaded?) — pass the "
                "RDD exactly as prepare_fit_rows returned it"
            )
        rows_src = prepared
        keep = prepared_keep
    else:
        if turns is None:
            raise ValueError(
                "train_crf_distributed: need turns= or prepared="
            )
        if prepared_keep is not None:
            raise ValueError(
                "train_crf_distributed: prepared_keep= requires "
                "prepared= (it filters prepared rows, not turns)"
            )
        src = turns.select(
            "conv_id", "turn_idx", F.col(text_col).alias("text")
        )
        if sample is not None:
            # full-triple order: ties on (conv_id, turn_idx) would
            # otherwise truncate nondeterministically, breaking the
            # byte-identity contract with train_crf_mixed_local (which
            # sorts whole (conv_id, turn_idx, text) triples)
            src = src.orderBy("conv_id", "turn_idx", "text").limit(sample)
        rows_src = prepare_fit_rows(src, n_parts=n_parts)
        keep = None
    # broadcasts must go through the context that owns the fit rows
    # (not a thread-local "active" session, which can differ in
    # multi-session drivers)
    sc = rows_src.context

    def _prep_grp(it, _keep=keep):
        # filter on the per-row tag (e.g. CV fold — None keeps all),
        # then the per-shard FULL-TRIPLE sort: a (conv_id, turn_idx)-
        # only key would leave duplicate-key order to RDD arrival
        # order.  Both the turns= and prepared= paths group through
        # this one function, so their (pid, seqs, feats) records are
        # byte-identical BY CONSTRUCTION (and pytest-pinned vs the
        # single-node twin).
        rows = [r for r in it if _keep is None or _keep(r[1])]
        rows.sort(key=lambda r: r[2])
        if rows:
            yield (
                rows[0][0],
                [r[3] for r in rows],
                [r[4] for r in rows],
            )

    parted = rows_src.mapPartitions(
        _prep_grp, preservesPartitioning=True
    ).persist(StorageLevel.MEMORY_AND_DISK)
    bc_wl = None
    try:
        prune = min_feat_df is not None and min_feat_df > 1
        if prune:
            # global per-sequence document frequency over the cached
            # fit inputs; the whitelist collect is bounded by the
            # SHARED vocabulary (features appearing in >=2 sequences)
            wl_feats = (
                parted.flatMap(
                    lambda rec: (
                        (f, 1)
                        for sf in rec[2]
                        for f in set(chain.from_iterable(sf))
                    )
                )
                .reduceByKey(_add)
                .filter(lambda kv: kv[1] >= min_feat_df)
                .keys()
                .collect()
            )
            bc_wl = sc.broadcast(frozenset(wl_feats))
        model = CRFTagger(entity_types, feat_hash_dim=feat_hash_dim)
        if prune or feat_hash_dim:
            # one transform pass bakes BOTH round-invariant feature
            # maps into the cache: whitelist filter (on raw names)
            # then hash buckets — fit rounds reuse them as-is
            def _xform(it, _bc=bc_wl, _fx=model._fx_list, _h=feat_hash_dim):
                wl = _bc.value if _bc is not None else None
                for pid, seqs, feats in it:
                    out = []
                    for sf in feats:
                        fls = (
                            [[f for f in fl if f in wl] for fl in sf]
                            if wl is not None
                            else sf
                        )
                        out.append(
                            [_fx(fl) for fl in fls] if _h else fls
                        )
                    yield pid, seqs, out

            xformed = parted.mapPartitions(
                _xform, preservesPartitioning=True
            ).persist(StorageLevel.MEMORY_AND_DISK)
            n_live = xformed.count()  # materialize before dropping parent
            parted.unpersist()
            parted = xformed
        else:
            n_live = parted.count()
        if n_live == 0:
            raise ValueError("train_crf_distributed: no training data")
        P = float(n_live)

        tags = tuple(model.tags)
        for _round in range(rounds):
            bc = sc.broadcast(model.export())

            def fit_part(it, _bc=bc):
                for pid, seqs, feats in it:
                    m = CRFTagger.from_export(_bc.value)
                    m.fit(
                        seqs, epochs=1, feats_per_seq=feats,
                        feats_prehashed=True,
                    )
                    yield pid, m.w, m.trans, m.init

            def expand(rec):
                # sentinel keys can't collide: no feature string
                # starts with "\x00" (all are "b"/"w="/"sh="/... )
                pid, w, trans, init = rec
                yield "\x00trans", (pid, trans)
                yield "\x00init", (pid, init)
                for f, v in w.items():
                    yield f, (pid, v)

            def avg(vals, _P=P):
                # zero accumulator + ascending-pid adds + /P: the
                # identical float-op sequence as average_exports
                vl = sorted(vals, key=lambda kv: kv[0])
                acc = np.zeros_like(vl[0][1])
                for _pid, v in vl:
                    acc += v
                return acc / _P

            items = (
                parted.mapPartitions(fit_part)
                .flatMap(expand)
                .groupByKey(numPartitions=max(8, n_parts))
                .mapValues(avg)
                .collect()
            )
            bc.destroy()
            w: dict = {}
            trans = init = None
            for k, v in items:
                if k == "\x00trans":
                    trans = v
                elif k == "\x00init":
                    init = v
                else:
                    w[k] = v.tolist()
            model = CRFTagger.from_export(
                (tags, w, trans.tolist(), init.tolist(), feat_hash_dim)
            )
    finally:
        parted.unpersist()
        if bc_wl is not None:
            # safe only after the pruned RDD is unpersisted: nothing
            # can recompute it once its whitelist broadcast is gone
            bc_wl.destroy()
    return model


def train_crf_mixed_local(
    rows,
    entity_types=DEFAULT_TYPES,
    n_parts: int = 8,
    rounds: int = 4,
    sample: int | None = None,
    min_feat_df: int | None = 2,
    feat_hash_dim: int | None = None,
) -> CRFTagger:
    """Single-node twin of :func:`train_crf_distributed` over
    (conv_id, turn_idx, text) triples — identical shard assignment,
    global min-df feature pruning, per-shard fit, and ascending-pid
    mixing order, so the weights are byte-identical to the distributed
    fit (the gold-builder path).  Must stay in lockstep."""
    import zlib
    from itertools import chain

    from ..kernel.crf import token_features

    rows = sorted(rows)
    if sample is not None:
        rows = rows[:sample]
    shards: dict[int, list] = {}
    for cid, ti, tx in rows:
        pid = zlib.crc32(cid.encode("utf-8")) % n_parts
        shards.setdefault(pid, []).append((cid, ti, tx))
    # fit-ready inputs once per shard (the distributed _prep twin)
    shard_data: dict[int, tuple] = {}
    for pid in sorted(shards):
        seqs = [labeled_sequences(tx) for _cid, _ti, tx in shards[pid]]
        feats = [
            [token_features(toks, i) for i in range(len(toks))]
            for toks, _tags in seqs
        ]
        shard_data[pid] = (seqs, feats)
    if min_feat_df is not None and min_feat_df > 1:
        df_counts: dict[str, int] = {}
        for _seqs, feats in shard_data.values():
            for sf in feats:
                for f in set(chain.from_iterable(sf)):
                    df_counts[f] = df_counts.get(f, 0) + 1
        wl = frozenset(
            f for f, c in df_counts.items() if c >= min_feat_df
        )
        for pid, (seqs, feats) in shard_data.items():
            shard_data[pid] = (
                seqs,
                [[[f for f in fl if f in wl] for fl in sf] for sf in feats],
            )
    model = CRFTagger(entity_types, feat_hash_dim=feat_hash_dim)
    if feat_hash_dim:
        # hash once (round-invariant), mirroring the distributed cache
        for pid, (seqs, feats) in shard_data.items():
            shard_data[pid] = (
                seqs, [[model._fx_list(fl) for fl in sf] for sf in feats]
            )
    for _round in range(rounds):
        blob = model.export()
        blobs = []
        for pid in sorted(shard_data):
            seqs, feats = shard_data[pid]
            m = CRFTagger.from_export(blob)
            m.fit(
                seqs, epochs=1, feats_per_seq=feats, feats_prehashed=True
            )
            blobs.append(m.export())
        model = CRFTagger.average_exports(blobs)
    return model


def crf_tagged_mentions(
    turns: DataFrame,
    model: CRFTagger,
    text_col: str = "text",
) -> DataFrame:
    """Distributed inference with broadcast trained weights: flat
    mention rows (conv_id, turn_idx, mention_idx, text, entity_type,
    tok_start, tok_end) from plain (marker-stripped) token streams.
    Shares the mapInArrow/mapInPandas inference pass with the rule
    tagger (operators/tagger.py:_tagged_rows_df)."""
    from .tagger import _tagged_rows_df

    spark = turns.sparkSession
    bc = spark.sparkContext.broadcast(model.export())
    cache_key = uuid.uuid4().hex

    def get_model() -> CRFTagger:
        m = _CRF_CACHE.get(cache_key)
        if m is None:
            m = CRFTagger.from_export(bc.value)
            # small LRU, not clear-all: concurrent jobs (e.g. the CV
            # workflow's parallel folds) interleave tasks with
            # DIFFERENT models on reused worker processes — a single
            # slot would rebuild from the broadcast on every switch
            while len(_CRF_CACHE) >= 4:
                _CRF_CACHE.pop(next(iter(_CRF_CACHE)))
            _CRF_CACHE[cache_key] = m
        return m

    return _tagged_rows_df(turns, text_col, get_model)
