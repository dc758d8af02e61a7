# -*- coding: utf-8 -*-
"""Distributed pipeline parity + invariants at sf0.001.

Gates (BASELINE.json): per-turn text equality under stable ordering,
triple-set P/R vs the reference extractor, canonicalization
fixed-point, kill-and-resume equivalence.
"""
import os

import pytest
from pyspark.sql import functions as F


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def _gold(spark, corpus_dir, name):
    return spark.read.parquet(os.path.join(corpus_dir, name))


@pytest.fixture(scope="module")
def transcripts(spark, corpus_dir):
    return spark.read.parquet(os.path.join(corpus_dir, "transcripts.parquet"))


def test_mentions_match_injected_gold(spark, corpus_dir, transcripts):
    """End-to-end: Spark mention extraction == generation-time injected
    mentions (independent of the kernels) — P/R = 1.0."""
    from webstruct_spark.operators.extract import mentions

    cols = ["conv_id", "turn_idx", "mention_idx", "text", "entity_type"]
    got = _rows(mentions(transcripts), cols)
    want = _rows(_gold(spark, corpus_dir, "gold_mentions.parquet"), cols)
    assert got == want


def test_triples_match_reference_extractor(spark, corpus_dir, transcripts):
    from webstruct_spark.operators.extract import extract_rows
    from webstruct_spark.operators.grouping_op import group_entities
    from webstruct_spark.operators.triples_op import triples

    cols = ["conv_id", "group_id", "triple_idx", "subj", "pred", "obj"]
    got = _rows(triples(group_entities(extract_rows(transcripts))), cols)
    want = _rows(_gold(spark, corpus_dir, "gold_triples.parquet"), cols)
    assert got == want
    # triple-set P/R (the BASELINE metric; equality implies 1.0/1.0)
    tp = len(set(got) & set(want))
    assert tp / len(got) >= 0.95 and tp / len(want) >= 0.95


def test_per_turn_text_equality_invariant(spark, transcripts):
    """Token (position, length) offsets must slice the original turn
    text exactly (quote replacements excepted by the tokenizer
    contract: `` / '' / ... map from differing raw chars)."""
    from webstruct_spark.operators.extract import tokenize_tags_udf

    sample = transcripts.orderBy("conv_id", "turn_idx").limit(200)
    rows = sample.select(
        "text", tokenize_tags_udf("text").alias("x")
    ).collect()
    checked = 0
    for r in rows:
        text = r["text"]
        for tok in r["x"]["tokens"]:
            sliced = text[tok["position"] : tok["position"] + tok["length"]]
            if tok["chars"] in ("``", "''", "..."):
                continue
            assert sliced == tok["chars"], (sliced, tok)
            checked += 1
    assert checked > 1000


def test_grouping_stable_under_ordering(spark, transcripts):
    """Shuffling input row order must not change grouping output
    (stable (conv_id, turn_idx) semantics)."""
    from webstruct_spark.operators.extract import extract_rows
    from webstruct_spark.operators.grouping_op import group_entities

    cols = ["conv_id", "group_id", "entity_idx", "text", "entity_type"]
    a = _rows(group_entities(extract_rows(transcripts)), cols)
    shuffled = transcripts.orderBy(F.md5(F.concat("conv_id", "text")))
    b = _rows(group_entities(extract_rows(shuffled)), cols)
    assert a == b


def test_canonicalization_matches_gold_and_fixed_point(
    spark, corpus_dir, transcripts
):
    from webstruct_spark.operators.canon import canonicalize
    from webstruct_spark.operators.extract import mentions

    gaz = spark.read.parquet(os.path.join(corpus_dir, "gazetteer.parquet"))
    m = mentions(transcripts).cache()
    links, nodes = canonicalize(m, gaz)
    got = _rows(links, ["entity_type", "norm_text", "node_id"])
    want = _rows(
        _gold(spark, corpus_dir, "gold_links.parquet"),
        ["entity_type", "norm_text", "node_id"],
    )
    assert got == want
    # fixed point: re-canonicalizing the canonical surface forms maps
    # every node onto itself (no new merges, no splits)
    nodes_df = nodes.cache()
    remention = nodes_df.select(
        F.col("canonical_text").alias("text"),
        "entity_type",
    )
    links2, nodes2 = canonicalize(remention, gaz)
    n1 = nodes_df.count()
    n2 = nodes2.count()
    assert n2 == n1


def test_pipeline_resume_equivalence(spark, corpus_dir, tmp_path):
    """Kill-and-resume: interrupt after early stages; the resumed run
    must produce identical outputs and skip committed work."""
    import json

    from webstruct_spark.plans.manifest import Manifest
    from webstruct_spark.plans.pipeline import build_kg

    full_dir = str(tmp_path / "full")
    build_kg(spark, corpus_dir, full_dir)

    partial_dir = str(tmp_path / "partial")
    # simulate a kill: run everything, then delete the manifest records
    # and outputs of the last stages.  The surviving records are
    # rewritten as a LEGACY ``manifest.jsonl`` (the pre-round-5
    # appended layout) so this test also proves old builds still
    # resume under the record-file layout.
    build_kg(spark, corpus_dir, partial_dir)
    man = Manifest(partial_dir)
    committed = man.committed()
    keep = {"extracted", "mentions"}
    import shutil

    for stage in list(committed):
        if stage not in keep:
            shutil.rmtree(os.path.join(partial_dir, stage))
    shutil.rmtree(man.records_dir)  # new-layout records of the "kill"
    # old builds recorded the FULL run fingerprint on every stage
    # (pre-STAGE_IDENTITY_KEYS); reconstruct that shape so this test
    # also pins that such records still resume — is_committed must
    # compare by PROJECTION onto the stage's identity keys, not dict
    # equality, or every pre-existing build silently re-extracts
    full_fp = dict(committed["links"]["source_fp"])
    full_fp.update(committed["extracted"]["source_fp"])
    full_fp.update(committed["group_entities"]["source_fp"])
    with open(man.path, "w") as f:
        for stage, rec in committed.items():
            if stage in keep:
                rec = dict(rec, source_fp=full_fp)
                f.write(json.dumps(rec) + "\n")

    import time

    t0 = time.time()
    build_kg(spark, corpus_dir, partial_dir)  # resume
    resume_sec = time.time() - t0

    for stage in ["mentions", "triples", "nodes"]:
        a = spark.read.parquet(os.path.join(full_dir, stage))
        b = spark.read.parquet(os.path.join(partial_dir, stage))
        ca = sorted(map(tuple, a.collect()))
        cb = sorted(map(tuple, b.collect()))
        assert ca == cb, stage
    # committed stages were skipped: exactly one commit record per
    # kept stage (the legacy line), rebuilt stages got a new record
    recs = Manifest(partial_dir).records()
    assert sum(1 for r in recs if r["stage"] == "extracted") == 1
    assert sum(1 for r in recs if r["stage"] == "triples") == 1


def test_manifest_lineage_counters(spark, corpus_dir, tmp_path):
    from webstruct_spark.plans.manifest import Manifest
    from webstruct_spark.plans.pipeline import build_kg

    out = str(tmp_path / "kg")
    paths = build_kg(spark, corpus_dir, out)
    man = Manifest(out).committed()
    for stage, path in paths.items():
        rec = man[stage]
        assert rec["rows_out"] == spark.read.parquet(path).count()
        assert rec["n_files"] >= 1
        assert all(f["rows"] >= 0 for f in rec["files"])


def test_concurrent_stages_equal_sequential(spark, corpus_dir, tmp_path):
    """stage_concurrency > 1 runs independent DAG stages as concurrent
    Spark jobs; every stage table must equal the strict-sequential
    build row-for-row, and the manifest must hold exactly one commit
    per stage (completion order is free)."""
    import json

    from webstruct_spark.plans.manifest import Manifest
    from webstruct_spark.plans.pipeline import STAGES, build_kg

    seq_dir = str(tmp_path / "seq")
    con_dir = str(tmp_path / "con")
    seq = build_kg(spark, corpus_dir, seq_dir, stage_concurrency=1)
    con = build_kg(spark, corpus_dir, con_dir, stage_concurrency=4)
    assert set(seq) == set(con) == set(STAGES)
    for stage in STAGES:
        a = spark.read.parquet(seq[stage])
        b = spark.read.parquet(con[stage])
        assert _rows(a, a.columns) == _rows(b, b.columns), stage
    for d in (seq_dir, con_dir):
        counts = {}
        for r in Manifest(d).records():
            counts[r["stage"]] = counts.get(r["stage"], 0) + 1
        assert counts == {s: 1 for s in STAGES}


def _split_corpus(spark, corpus_dir, tmp_path):
    """corpus_dir split by conv_id into (corpus_a, corpus_b, union)."""
    import shutil

    t = spark.read.parquet(os.path.join(corpus_dir, "transcripts.parquet"))
    convs = sorted(r[0] for r in t.select("conv_id").distinct().collect())
    half = set(convs[: len(convs) // 2])
    out = []
    for name, pred in (
        ("corpus_a", F.col("conv_id").isin(half)),
        ("corpus_b", ~F.col("conv_id").isin(half)),
        ("corpus_u", F.lit(True)),
    ):
        d = str(tmp_path / name)
        os.makedirs(d)
        t.where(pred).write.parquet(os.path.join(d, "transcripts.parquet"))
        gaz_src = os.path.join(corpus_dir, "gazetteer.parquet")
        gaz_dst = os.path.join(d, "gazetteer.parquet")
        if os.path.isdir(gaz_src):
            shutil.copytree(gaz_src, gaz_dst)
        else:
            shutil.copy(gaz_src, gaz_dst)
        out.append(d)
    return out


def test_resume_refuses_changed_corpus(spark, corpus_dir, tmp_path):
    """resume=True against a DIFFERENT corpus must rebuild every
    stage from the new source, not serve the old corpus's committed
    outputs (source fingerprints are recorded per commit)."""
    from webstruct_spark.plans.pipeline import build_kg

    corpus_a, _corpus_b, _ = _split_corpus(spark, corpus_dir, tmp_path)
    keep = {
        r[0]
        for r in spark.read.parquet(
            os.path.join(corpus_a, "transcripts.parquet")
        ).select("conv_id").distinct().collect()
    }

    out = str(tmp_path / "kg")
    build_kg(spark, corpus_dir, out)
    stale_mentions = _rows(
        spark.read.parquet(os.path.join(out, "mentions")),
        ["conv_id", "turn_idx", "mention_idx", "text"],
    )

    paths = build_kg(spark, corpus_a, out)  # resume=True (default)
    fresh = _rows(
        spark.read.parquet(paths["mentions"]),
        ["conv_id", "turn_idx", "mention_idx", "text"],
    )
    assert fresh != stale_mentions
    assert {r[0] for r in fresh} <= keep


def test_append_kg_equals_fresh_union_build(spark, corpus_dir, tmp_path):
    """build on corpus A, append corpus B: every stage table must be
    row-identical to a fresh build over A∪B — including the GLOBAL
    tables (links/nodes/edges), where B's surfaces can merge A's
    components and relabel node ids."""
    from webstruct_spark.plans.pipeline import STAGES, append_kg, build_kg

    corpus_a, corpus_b, corpus_u = _split_corpus(spark, corpus_dir, tmp_path)

    inc_dir = str(tmp_path / "inc")
    build_kg(spark, corpus_a, inc_dir)
    inc = append_kg(spark, corpus_b, inc_dir)

    fresh_dir = str(tmp_path / "fresh")
    fresh = build_kg(spark, corpus_u, fresh_dir)

    def none_safe_rows(df):
        cols = sorted(df.columns)
        return sorted(
            repr(tuple(r[c] for c in cols))
            for r in df.select(*cols).collect()
        )

    for stage in STAGES:
        a = spark.read.parquet(inc[stage])
        b = spark.read.parquet(fresh[stage])
        assert none_safe_rows(a) == none_safe_rows(b), stage


def test_append_retry_after_precommit_crash(spark, corpus_dir, tmp_path):
    """The conv-id side table is written before any stage file, so a
    crash in between leaves orphan ids.  The retry must detect that
    NOTHING landed in the stages and proceed (previously it wedged
    forever on the overlap guard), while a true double-append still
    raises."""
    from webstruct_spark.plans.pipeline import (
        CONV_IDS, append_kg, build_kg,
    )

    corpus_a, corpus_b, corpus_u = _split_corpus(spark, corpus_dir, tmp_path)
    out = str(tmp_path / "kg")
    build_kg(spark, corpus_a, out)

    # simulate the crashed attempt: side-table write only
    delta = spark.read.parquet(
        os.path.join(corpus_b, "transcripts.parquet")
    )
    delta.select("conv_id").distinct().write.mode("append").parquet(
        os.path.join(out, CONV_IDS)
    )

    append_kg(spark, corpus_b, out)  # the retry — must recover

    fresh = build_kg(spark, corpus_u, str(tmp_path / "fresh"))
    got = spark.read.parquet(os.path.join(out, "extracted"))
    want = spark.read.parquet(fresh["extracted"])
    assert sorted(map(repr, got.collect())) == sorted(
        map(repr, want.collect())
    )
    # orphan recovery left the side table duplicate-free
    side = spark.read.parquet(os.path.join(out, CONV_IDS))
    assert side.count() == side.distinct().count()
    # re-running the SAME delta dir is the documented
    # crash-after-final-commit recovery: a provable no-op (the
    # extracted record's delta_fp matches), never a double-append
    n_before = got.count()
    append_kg(spark, corpus_b, out)
    assert spark.read.parquet(
        os.path.join(out, "extracted")
    ).count() == n_before
    # a DIFFERENT file-backed delta with the same conversations is a
    # true double-append hazard and still raises (same rows, but the
    # footer fingerprint — bytes/n_files — no longer matches what the
    # base last applied)
    import shutil

    corpus_b2 = str(tmp_path / "corpus_b2")
    os.makedirs(corpus_b2)
    delta.repartition(3).write.parquet(
        os.path.join(corpus_b2, "transcripts.parquet")
    )
    gaz_src = os.path.join(corpus_b, "gazetteer.parquet")
    gaz_dst = os.path.join(corpus_b2, "gazetteer.parquet")
    if os.path.isdir(gaz_src):
        shutil.copytree(gaz_src, gaz_dst)
    else:
        shutil.copy(gaz_src, gaz_dst)
    with pytest.raises(ValueError, match="conv_ids"):
        append_kg(spark, corpus_b2, out)


def test_append_kg_guards(spark, corpus_dir, tmp_path):
    """Overlapping conv_ids and a changed gazetteer must raise; so
    must an incomplete base build."""
    import pyarrow as pa
    import pyarrow.parquet as pq_mod

    from webstruct_spark.plans.pipeline import append_kg, build_kg

    corpus_a, corpus_b, _ = _split_corpus(spark, corpus_dir, tmp_path)
    out = str(tmp_path / "kg")
    build_kg(spark, corpus_a, out)

    # same conv_ids again -> at-least-once double-append hazard
    with pytest.raises(ValueError, match="conv_ids"):
        append_kg(spark, corpus_a, out)

    # different grouping params than the base -> delta's groups/triples
    # would not match a fresh union build
    with pytest.raises(ValueError, match="params"):
        append_kg(spark, corpus_b, out, dont_penalize={"TEL"})

    # torn base (a crashed earlier append left stages at different
    # source identities) -> refuse before appending anything.  This
    # injected tear LOOKS like a crashed plain append (stream stamps
    # agree), so the resume machinery examines it — and the delta
    # fails the fingerprint-reconstruction proof, which is the guard
    # that actually fires here; a tear that cannot be a replay at all
    # still gets the "source identity" refusal (see
    # test_plain_append_crash_resumes_on_rerun for the recoverable
    # shape)
    import json

    from webstruct_spark.plans.manifest import Manifest

    man = Manifest(out)
    rec = dict(man.committed()["groups"])
    rec["source_fp"] = dict(rec["source_fp"],
                            transcripts={"rows": 1, "bytes": 1,
                                         "n_files": 1})
    # inject the torn commit as a record file sorting AFTER every real
    # one, so the per-stage fold takes it as groups' latest state
    bad = os.path.join(
        man.records_dir, "rec-" + "9" * 20 + "-000000-0000000-groups.json"
    )
    with open(bad, "w") as f:
        f.write(json.dumps(rec))
    with pytest.raises(
        ValueError, match="source identity|does not reconstruct"
    ):
        append_kg(spark, corpus_b, out)
    # restore a consistent manifest for the gazetteer check below
    os.remove(bad)

    # changed gazetteer -> node identity would silently shift
    import shutil

    corpus_c = str(tmp_path / "corpus_c")
    shutil.copytree(corpus_b, corpus_c)
    gaz = os.path.join(corpus_c, "gazetteer.parquet")
    if os.path.isdir(gaz):
        tbl_file = sorted(
            f for f in os.listdir(gaz) if f.endswith(".parquet")
        )[0]
        tbl_path = os.path.join(gaz, tbl_file)
    else:
        tbl_path = gaz
    tbl = pq_mod.read_table(tbl_path)
    pq_mod.write_table(tbl.slice(0, max(1, tbl.num_rows - 1)), tbl_path)
    with pytest.raises(ValueError, match="gazetteer"):
        append_kg(spark, corpus_c, out)


def test_table_fingerprint_raises_on_empty_dir(tmp_path):
    """An all-zero fingerprint would compare equal across every
    unsupported layout — fail loudly instead."""
    from webstruct_spark.plans.manifest import table_fingerprint

    d = str(tmp_path / "empty")
    os.makedirs(d)
    with pytest.raises(ValueError, match="no .parquet files"):
        table_fingerprint(d)


def test_gazetteer_refresh_resume_keeps_corpus_stages(
    spark, corpus_dir, tmp_path
):
    """Per-stage source identity: after ONLY the gazetteer changes, a
    resume must keep the corpus-scale stages (extracted..triples) and
    rebuild just the canonicalization family (links/nodes/edges) —
    re-linking against a refreshed gazetteer must not re-extract the
    history."""
    import json
    import shutil

    import pyarrow.parquet as pq_mod

    from webstruct_spark.plans.manifest import Manifest
    from webstruct_spark.plans.pipeline import build_kg

    corpus = str(tmp_path / "corpus")
    shutil.copytree(corpus_dir, corpus)
    out = str(tmp_path / "kg")
    build_kg(spark, corpus, out)

    # refresh the gazetteer (drop one row)
    gaz = os.path.join(corpus, "gazetteer.parquet")
    if os.path.isdir(gaz):
        part = sorted(
            f for f in os.listdir(gaz) if f.endswith(".parquet")
        )[0]
        gaz_file = os.path.join(gaz, part)
    else:
        gaz_file = gaz
    tbl = pq_mod.read_table(gaz_file)
    pq_mod.write_table(tbl.slice(0, tbl.num_rows - 1), gaz_file)

    build_kg(spark, corpus, out)  # resume
    recs = Manifest(out).records()
    counts = {}
    for r in recs:
        counts[r["stage"]] = counts.get(r["stage"], 0) + 1
    for stage in ("extracted", "mentions", "group_entities",
                  "groups", "triples"):
        assert counts[stage] == 1, stage  # resumed, not rebuilt
    for stage in ("links", "nodes", "edges"):
        assert counts[stage] == 2, stage  # rebuilt with the new gaz
