# -*- coding: utf-8 -*-
"""Spark tests for the training-data-pipeline operators (dedup,
similarity, text quality, tagger quality gate) at small scale."""
import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "the quick brown fox jumps over the lazy dog today"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat today"),  # near dup
        (3, "completely different text about spark query engines"),
        (4, "spark query engines and how to optimize shuffle joins"),
        (5, "THE QUICK  brown fox jumps over the lazy dog today"),  # norm dup of 0
    ]
    return spark.createDataFrame(base, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    from webstruct_spark.operators.dedup import exact_duplicate_groups

    out = {
        r["doc_id"]: r["canonical_doc_id"]
        for r in exact_duplicate_groups(docs).collect()
    }
    assert out[0] == 0 and out[1] == 0 and out[5] == 0
    assert out[2] == 2 and out[3] == 3


def test_minhash_lsh_finds_near_dups(spark, docs):
    from webstruct_spark.operators.dedup import minhash_lsh_pairs

    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.4).collect()
    }
    assert (0, 1) in pairs and (0, 5) in pairs and (1, 5) in pairs
    assert (0, 2) in pairs  # near dup
    assert (0, 3) not in pairs


def test_ngram_jaccard_matches_kernel(spark, docs):
    from webstruct_spark.kernel.dedup import jaccard, word_shingles
    from webstruct_spark.operators.dedup import ngram_jaccard_pairs

    rows = ngram_jaccard_pairs(docs, threshold=0.05).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in rows:
        expected = jaccard(
            word_shingles(texts[r["doc_a"]]), word_shingles(texts[r["doc_b"]])
        )
        assert abs(r["jaccard"] - round(expected, 6)) < 1e-9


def test_simhash_pairs(spark, docs):
    from webstruct_spark.operators.dedup import simhash_pairs

    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_pairs(docs, max_hamming=8).collect()
    }
    assert pairs.get((0, 1)) == 0
    assert pairs.get((0, 5)) == 0  # normalization collapses case/space


def test_brute_force_topk_matches_numpy(spark):
    from webstruct_spark.operators.similarity import brute_force_topk

    rng = np.random.RandomState(7)
    mat = rng.randn(200, 16).astype(np.float32)
    rows = [(i, [float(x) for x in mat[i]]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = [rows[0], rows[50]]
    got = brute_force_topk(emb, queries, k=3).collect()

    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for qid in (0, 50):
        sims = normed @ normed[qid]
        sims[qid] = -2  # exclude self
        order = np.argsort(-sims)[:3]
        mine = [r["neighbor_id"] for r in got if r["query_id"] == qid]
        assert mine == [int(i) for i in order]


def test_lsh_topk_recall(spark):
    from webstruct_spark.operators.similarity import brute_force_topk, lsh_topk

    # clustered embeddings: real near-neighbors exist (uniform random
    # vectors have none, and hyperplane LSH rightfully fails there)
    rng = np.random.RandomState(11)
    centers = rng.randn(20, 16).astype(np.float32) * 3
    mat = np.vstack(
        [centers[i % 20] + rng.randn(16).astype(np.float32) * 0.3
         for i in range(300)]
    )
    rows = [(i, [float(x) for x in mat[i]]) for i in range(300)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = rows[:5]
    exact = brute_force_topk(emb, queries, k=3).collect()
    approx = lsh_topk(emb, queries, k=3, n_planes=8, multiprobe=1).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.8


def test_text_profile_and_langid(spark, docs):
    from webstruct_spark.functions.text_quality import lang_id_udf, text_profile

    prof = {r["doc_id"]: r for r in text_profile(docs).collect()}
    assert prof[0]["n_tokens"] == 10
    assert prof[0]["fingerprint"] == prof[1]["fingerprint"] == prof[5]["fingerprint"]
    assert 0 <= prof[0]["quality_x10k"] <= 10000
    assert prof[0]["stop_x10k"] > prof[3]["stop_x10k"]
    langs = docs.select(lang_id_udf("text").alias("lang")).collect()
    assert all(r["lang"] in ("en", "es", "fr", "de") for r in langs)


def test_tagger_quality_gate(spark, corpus_dir):
    """Viterbi tagger on plain text: segment F1 vs gold well above the
    reference CI gate (>0.3); gazetteer coverage makes it high here."""
    import os

    from webstruct_spark.operators.extract import mentions
    from webstruct_spark.operators.metrics import set_prf
    from webstruct_spark.operators.tagger import tagged_mentions

    turns = spark.read.parquet(
        os.path.join(corpus_dir, "transcripts.parquet")
    ).limit(300)
    gaz = spark.read.parquet(os.path.join(corpus_dir, "gazetteer.parquet"))
    pred = tagged_mentions(turns, gaz)
    gold = mentions(turns)
    # compare on (conv, turn, text, type): spans differ (plain vs
    # marker-bearing token indices), text+type is the quality signal
    prf = set_prf(
        pred, gold, ["conv_id", "turn_idx", "text", "entity_type"]
    ).collect()[0]
    assert prf["f1_x1e6"] > 500_000, dict(prf.asDict())


def test_ivf_topk_recall_and_determinism(spark):
    from webstruct_spark.operators.similarity import brute_force_topk, ivf_topk

    rng = np.random.RandomState(23)
    centers = rng.randn(12, 16).astype(np.float32) * 3
    mat = np.vstack(
        [centers[i % 12] + rng.randn(16).astype(np.float32) * 0.3
         for i in range(360)]
    )
    rows = [(i, [float(x) for x in mat[i]]) for i in range(360)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = rows[:5]
    exact = brute_force_topk(emb, queries, k=3).collect()
    a1 = ivf_topk(emb, queries, k=3, n_centroids=12, n_probe=3).collect()
    a2 = ivf_topk(emb, queries, k=3, n_centroids=12, n_probe=3).collect()
    assert sorted(map(tuple, a1)) == sorted(map(tuple, a2))  # deterministic
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in a1}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.8


def test_minhash_two_tier_scoring(spark, docs):
    """Signature tier accepts clear pairs with the 64-slot estimate
    (verified=false, jaccard = k/64); exact tier confirms gray-zone
    pairs (verified=true, jaccard = exact shingle Jaccard)."""
    from webstruct_spark.kernel.dedup import jaccard, word_shingles
    from webstruct_spark.operators.dedup import minhash_lsh_pairs

    res = minhash_lsh_pairs(docs, threshold=0.4)
    rows = res.collect()
    res._sketch_handle.unpersist()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert rows, "expected pairs"
    for r in rows:
        exact = jaccard(
            word_shingles(texts[r["doc_a"]]), word_shingles(texts[r["doc_b"]])
        )
        if r["verified"]:
            # exact tier: reported value IS the exact jaccard >= thr
            assert abs(r["jaccard"] - round(exact, 6)) < 1e-9
            assert r["jaccard"] >= 0.4
        else:
            # signature tier: k/64 estimate >= thr + band
            assert abs(r["jaccard"] * 64 - round(r["jaccard"] * 64)) < 1e-6
            assert r["jaccard"] >= 0.6
    # identical docs land in the signature tier with estimate 1.0
    flat = {(r["doc_a"], r["doc_b"]): r for r in rows}
    assert flat[(0, 1)]["jaccard"] == 1.0 and not flat[(0, 1)]["verified"]


def test_ngram_hot_shingle_cap(spark):
    """A boilerplate shingle shared by every doc must not quadratically
    explode the self-join: with df > max_df it is dropped before the
    join, the pair set from unique content is unchanged, and the drop
    is observable."""
    from webstruct_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "all rights reserved worldwide"
    rows = [
        (i, "%s unique content piece number %d alpha beta" % (boiler, i))
        for i in range(40)
    ]
    # two true near-dups that share real content
    rows.append((100, "shared real content sentence one two three four"))
    rows.append((101, "shared real content sentence one two three four"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = ngram_jaccard_pairs(docs, threshold=0.5, max_df=10)
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in capped.collect()}
    # the true dup pair survives; no pair is created by boilerplate alone
    assert (100, 101) in pairs and pairs[(100, 101)] == 1.0
    assert all(a == 100 for a, _b in pairs if a != 101), pairs
    # the hot shingles were dropped and are observable
    dropped = {r["shingle"] for r in capped._dropped_shingles.collect()}
    assert any(boiler.split()[0] in s for s in dropped), dropped
    # with the default (high) cap nothing drops and boilerplate-only
    # pairs appear with their (low) exact jaccard -- same math,
    # just unguarded
    uncapped = ngram_jaccard_pairs(docs, threshold=0.01)
    assert uncapped.count() > len(pairs)
