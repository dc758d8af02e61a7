# -*- coding: utf-8 -*-
"""Single-node reference extractor → gold tables.

This is the re-expression of the reference extraction chain
(`NER.extract` / `extract_groups`, /root/reference/webstruct/model.py:40-50,
139-160) run eagerly on one node over the synthetic corpus.  Its
outputs are the parity targets the distributed Spark pipeline is
graded against (triple P/R ≥ 0.95 per BASELINE.json — by construction
the Spark pipeline should hit 1.0):

* ``gold_extracted_mentions.parquet`` — tokenize → IOB2 encode →
  decode → smart_join per turn,
* ``gold_groups.parquet`` / ``gold_triples.parquet`` — per-conversation
  gap-threshold grouping + triple assembly,
* ``gold_nodes.parquet`` / ``gold_links.parquet`` — gazetteer linking +
  connected-component canonicalization.

The kernels it calls are pinned by the reference's own doctest goldens
(tests/test_kernel_*.py), and the *injected* ``gold_mentions.parquet``
from generation is independent of all of this — the chain
injected == extracted == Spark output closes the loop end-to-end.
"""
from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import pyarrow as pa
import pyarrow.parquet as pq

from collections import Counter

from ..kernel.bilou import decode_mentions, encode_tokens
from ..kernel.features import shape_py
from ..kernel.canon import (
    connected_components,
    link_edges,
    norm_text,
    surface_key,
)
from ..kernel.grouping import best_clustering, block_positions
from ..kernel.smartjoin import smart_join
from ..kernel.tokenize import default_segment_words
from ..kernel.triples import assemble_triples_typed

# the ONE grouping-default definition (kernel/grouping.py — the
# pyspark-free home, so importing it here keeps this gold builder's
# import chain pandas/pyspark-free) — a local copy would let the gold
# twin and the Spark grouping silently drift the moment either changed
from ..kernel.grouping import DEFAULT_DONT_PENALIZE as DONT_PENALIZE


def extract_turn(text: str) -> List[Tuple[str, str]]:
    """(token, iob2_tag) pairs for one marker-bearing turn — the
    per-turn unit of encoding (state never crosses turns)."""
    chars = [t[0] for t in default_segment_words(text or "")]
    return [(chars[i], tag) for i, tag in encode_tokens(chars)]


def wapiti_feature_dicts(r) -> List[Tuple[dict, str]]:
    """Per-token (feature_dict, gold_tag) pairs for one transcript row
    — the single-node twin of operators/wapiti_io.basic_feature_struct;
    the two MUST stay field-for-field in lockstep (shared by the gold
    builder and tests/test_wapiti_format.py)."""
    pairs = extract_turn(r["text"])
    n = len(pairs)
    out = []
    for k, (tok, tag) in enumerate(pairs):
        low = tok.lower()
        out.append(
            (
                dict(
                    token=tok,
                    lower=low,
                    shape=shape_py(tok),
                    prefix3=low[:3],
                    suffix3=low[-3:],
                    length=len(tok),
                    at_block_start=k == 0,
                    block_length="1" if n == 1 else (
                        "short" if n <= 10 else (
                            "medium" if n <= 20 else "large"
                        )
                    ),
                    role=r["role"],
                    tool=r["tool"],
                ),
                tag,
            )
        )
    return out


def extract_mentions_for_turn(text: str) -> List[Tuple[str, str]]:
    """[(mention_text, entity_type)] in document order for one turn."""
    pairs = extract_turn(text)
    toks = [p[0] for p in pairs]
    tags = [p[1] for p in pairs]
    return [(smart_join(items), t) for items, t in decode_mentions(toks, tags)]


GOLD_VERSION = "13-refreshed-nodes"  # bump when gold tables/semantics change


def build_gold(corpus_dir: str, force: bool = False) -> str:
    """Run the single-node extractor over ``corpus_dir`` and write the
    gold parquet tables next to the inputs. Idempotent per version."""
    done = os.path.join(corpus_dir, "_GOLD_DONE")
    if not force and os.path.exists(done):
        with open(done) as f:
            if f.read().strip() == GOLD_VERSION:
                return corpus_dir

    tbl = pq.read_table(os.path.join(corpus_dir, "transcripts.parquet"))
    rows = tbl.to_pylist()
    rows.sort(key=lambda r: (r["conv_id"], r["turn_idx"]))

    gaz = pq.read_table(os.path.join(corpus_dir, "gazetteer.parquet")).to_pylist()

    mention_rows: List[dict] = []
    per_conv: Dict[str, List[Tuple[str, int]]] = defaultdict(list)  # (tok, turn)
    per_conv_tags: Dict[str, List[str]] = defaultdict(list)
    shape_counts: Counter = Counter()

    for r in rows:
        pairs = extract_turn(r["text"])
        toks = [p[0] for p in pairs]
        tags = [p[1] for p in pairs]
        shape_counts.update(shape_py(t) for t in toks)
        for mi, (items, etype) in enumerate(decode_mentions(toks, tags)):
            mention_rows.append(
                dict(
                    conv_id=r["conv_id"],
                    turn_idx=r["turn_idx"],
                    mention_idx=mi,
                    text=smart_join(items),
                    entity_type=etype,
                )
            )
        per_conv[r["conv_id"]].extend((t, r["turn_idx"]) for t in toks)
        per_conv_tags[r["conv_id"]].extend(tags)

    group_rows: List[dict] = []
    triple_rows: List[dict] = []
    for conv_id in sorted(per_conv):
        infos = per_conv[conv_id]
        tags = per_conv_tags[conv_id]
        elems = [turn for _tok, turn in infos]
        positions = block_positions(elems, elems)
        _thr, _score, clusters = best_clustering(
            infos, tags, positions, dont_penalize=DONT_PENALIZE
        )
        for gi, cluster in enumerate(clusters):
            entities = [
                (smart_join([tok for tok, _turn in item_infos]), etype)
                for item_infos, etype, _dist in cluster
            ]
            entities = [(t, e) for t, e in entities if t]
            if not entities:
                continue
            group_id = "%s:g%04d" % (conv_id, gi)
            group_rows.append(
                dict(
                    conv_id=conv_id,
                    group_id=group_id,
                    threshold=int(_thr),
                    n_entities=len(entities),
                    first_turn=int(cluster[0][0][0][1]),
                )
            )
            for si, (s, p, o, st, ot) in enumerate(
                assemble_triples_typed(entities)
            ):
                triple_rows.append(
                    dict(
                        conv_id=conv_id,
                        group_id=group_id,
                        triple_idx=si,
                        subj=s,
                        pred=p,
                        obj=o,
                        subj_type=st,
                        obj_type=ot,
                    )
                )

    # linking + canonicalization
    surfaces = sorted({(m["entity_type"], norm_text(m["text"])) for m in mention_rows})
    mention_counts: Dict[Tuple[str, str], int] = defaultdict(int)
    for m in mention_rows:
        mention_counts[(m["entity_type"], norm_text(m["text"]))] += 1

    def _link_canon_rows(gaz_rows):
        """Single-node twin of operators/canon.py:canonicalize for a
        given gazetteer — shared by the base gold and the
        gazetteer-REFRESH gold (same surfaces/counts, shrunk gaz)."""
        edges = link_edges(
            surfaces,
            [(g["alias"], g["canonical_id"], g["entity_type"])
             for g in gaz_rows],
        )
        nodes = [surface_key(t, x) for t, x in surfaces]
        comp = connected_components(nodes, edges)
        lrows: List[dict] = []
        node_members: Dict[str, List[Tuple[str, str]]] = defaultdict(list)
        for (etype, ntext) in surfaces:
            skey = surface_key(etype, ntext)
            node_id = comp[skey]
            lrows.append(
                dict(entity_type=etype, norm_text=ntext, node_id=node_id)
            )
            node_members[node_id].append((etype, ntext))
        nrows: List[dict] = []
        for node_id in sorted(node_members):
            members = sorted(node_members[node_id])
            nrows.append(
                dict(
                    node_id=node_id,
                    entity_type=members[0][0],
                    canonical_text=min(t for _e, t in members),
                    n_surfaces=len(members),
                    n_mentions=sum(mention_counts[m] for m in members),
                )
            )
        return lrows, nrows

    link_rows, node_rows = _link_canon_rows(gaz)
    # gazetteer-refresh gold: the SAME corpus re-linked against the
    # deterministically shrunk gazetteer (canonical ids ending in an
    # even digit) — the kg_refreshed_nodes driver query runs the full
    # persistent build+refresh machinery and must land exactly here
    from .gazshrink import keep_alias

    refreshed_gaz = [g for g in gaz if keep_alias(g["canonical_id"])]
    _refreshed_links, refreshed_node_rows = _link_canon_rows(refreshed_gaz)

    def write(name: str, rows2: List[dict], schema: pa.Schema) -> None:
        cols = {f.name: [r.get(f.name) for r in rows2] for f in schema}
        pq.write_table(
            pa.Table.from_pydict(cols, schema=schema),
            os.path.join(corpus_dir, name),
        )

    write(
        "gold_extracted_mentions.parquet",
        mention_rows,
        pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("mention_idx", pa.int32()),
                ("text", pa.string()),
                ("entity_type", pa.string()),
            ]
        ),
    )
    write(
        "gold_groups.parquet",
        group_rows,
        pa.schema(
            [
                ("conv_id", pa.string()),
                ("group_id", pa.string()),
                ("threshold", pa.int32()),
                ("n_entities", pa.int32()),
                ("first_turn", pa.int32()),
            ]
        ),
    )
    write(
        "gold_triples.parquet",
        triple_rows,
        pa.schema(
            [
                ("conv_id", pa.string()),
                ("group_id", pa.string()),
                ("triple_idx", pa.int32()),
                ("subj", pa.string()),
                ("pred", pa.string()),
                ("obj", pa.string()),
                ("subj_type", pa.string()),
                ("obj_type", pa.string()),
            ]
        ),
    )

    # graph materialization gold: resolve endpoints to node ids
    link_map = {(lr["entity_type"], lr["norm_text"]): lr["node_id"]
                for lr in link_rows}
    edge_rows: List[dict] = []
    for t in triple_rows:
        sn = link_map.get((t["subj_type"], norm_text(t["subj"])))
        on = link_map.get((t["obj_type"], norm_text(t["obj"])))
        if sn is None or on is None:
            continue  # lossless in practice: every mention surface links
        edge_rows.append(
            dict(
                subj_node=sn, pred=t["pred"], obj_node=on,
                subj=t["subj"], obj=t["obj"], conv_id=t["conv_id"],
                group_id=t["group_id"], triple_idx=t["triple_idx"],
            )
        )
    write(
        "gold_edges.parquet",
        edge_rows,
        pa.schema(
            [
                ("subj_node", pa.string()),
                ("pred", pa.string()),
                ("obj_node", pa.string()),
                ("subj", pa.string()),
                ("obj", pa.string()),
                ("conv_id", pa.string()),
                ("group_id", pa.string()),
                ("triple_idx", pa.int32()),
            ]
        ),
    )
    write(
        "gold_links.parquet",
        link_rows,
        pa.schema(
            [
                ("entity_type", pa.string()),
                ("norm_text", pa.string()),
                ("node_id", pa.string()),
            ]
        ),
    )
    write(
        "gold_nodes.parquet",
        node_rows,
        pa.schema(
            [
                ("node_id", pa.string()),
                ("entity_type", pa.string()),
                ("canonical_text", pa.string()),
                ("n_surfaces", pa.int32()),
                ("n_mentions", pa.int64()),
            ]
        ),
    )
    write(
        "gold_refreshed_nodes.parquet",
        refreshed_node_rows,
        pa.schema(
            [
                ("node_id", pa.string()),
                ("entity_type", pa.string()),
                ("canonical_text", pa.string()),
                ("n_surfaces", pa.int32()),
                ("n_mentions", pa.int64()),
            ]
        ),
    )
    write(
        "gold_token_shapes.parquet",
        [dict(shape=s, n_tokens=c) for s, c in sorted(shape_counts.items())],
        pa.schema([("shape", pa.string()), ("n_tokens", pa.int64())]),
    )

    # single-node run of the Viterbi rule tagger over plain text — the
    # distributed tagger (operators/tagger.py) must match it exactly
    from ..kernel.viterbi import RuleModel
    from ..operators.tagger import DEFAULT_TYPES, plain_tokens

    alias_map: Dict[str, str] = {}
    for e in gaz:
        a = e["alias"]
        if a not in alias_map or e["entity_type"] < alias_map[a]:
            alias_map[a] = e["entity_type"]
    model = RuleModel(alias_map, DEFAULT_TYPES)
    tagged_rows: List[dict] = []
    confusion: Counter = Counter()
    for r in rows:
        toks = plain_tokens(r["text"])
        tags = model.predict(toks)
        # token-level confusion vs marker-derived gold tags (M8)
        pairs = extract_turn(r["text"])
        gold_tags = [p[1] for p in pairs]
        confusion.update(zip(gold_tags, tags))
        mi = 0
        for items, etype in decode_mentions(list(range(len(toks))), tags):
            tagged_rows.append(
                dict(
                    conv_id=r["conv_id"],
                    turn_idx=r["turn_idx"],
                    mention_idx=mi,
                    text=smart_join(toks[i] for i in items),
                    entity_type=etype,
                )
            )
            mi += 1
    write(
        "gold_tagged_mentions.parquet",
        tagged_rows,
        pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("mention_idx", pa.int32()),
                ("text", pa.string()),
                ("entity_type", pa.string()),
            ]
        ),
    )

    # single-node run of the TRAINED model (M1 path): fit the averaged-
    # perceptron CRF on the first N turns in (conv_id, turn_idx) order
    # — the identical deterministic fit the distributed train_crf
    # performs — then predict over every turn.  The distributed
    # crf_tagged_mentions must match this exactly.
    from ..operators.trained import train_crf_local

    all_toks = [plain_tokens(r["text"]) for r in rows]
    mention_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("mention_idx", pa.int32()),
            ("text", pa.string()),
            ("entity_type", pa.string()),
        ]
    )

    def write_trained_gold(model, out_name: str) -> None:
        """Predict every turn with ``model`` and write the decoded
        mention rows — the ONE fit-agnostic predict→decode→write
        sequence shared by all trained-model gold tables."""
        out_rows: List[dict] = []
        tags_all = model.predict_batch(all_toks)
        for r, toks, tags in zip(rows, all_toks, tags_all):
            mi = 0
            for items, etype in decode_mentions(
                list(range(len(toks))), tags
            ):
                out_rows.append(
                    dict(
                        conv_id=r["conv_id"],
                        turn_idx=r["turn_idx"],
                        mention_idx=mi,
                        text=smart_join(toks[i] for i in items),
                        entity_type=etype,
                    )
                )
                mi += 1
        write(out_name, out_rows, mention_schema)

    crf = train_crf_local(r["text"] for r in rows)
    write_trained_gold(crf, "gold_trained_mentions.parquet")

    # single-node run of the DISTRIBUTED training procedure (iterated
    # parameter mixing over crc32(conv_id)%8 shards, 4 mixing rounds,
    # global min_feat_df=2 feature pruning, full corpus):
    # train_crf_mixed_local is the exact twin of the Spark-side
    # train_crf_distributed — weights are byte-identical, so
    # distributed inference must match these rows exactly.
    from ..operators.trained import train_crf_mixed_local

    triples_in = [(r["conv_id"], r["turn_idx"], r["text"]) for r in rows]
    dist_crf = train_crf_mixed_local(triples_in)
    write_trained_gold(dist_crf, "gold_dist_trained_mentions.parquet")

    # the FEATURE-HASHED distributed training procedure (same IPM, the
    # hashing trick bounding the model to 4096 buckets regardless of
    # corpus vocabulary): twin fit must stay byte-identical to the
    # Spark-side train_crf_distributed(feat_hash_dim=4096).
    hashed_crf = train_crf_mixed_local(triples_in, feat_hash_dim=4096)
    write_trained_gold(hashed_crf, "gold_hashed_trained_mentions.parquet")

    write(
        "gold_token_confusion.parquet",
        [
            dict(tag_gold=g, tag_pred=p, n_tokens=c)
            for (g, p), c in sorted(confusion.items())
        ],
        pa.schema(
            [
                ("tag_gold", pa.string()),
                ("tag_pred", pa.string()),
                ("n_tokens", pa.int64()),
            ]
        ),
    )

    # single-node wapiti train-file lines (K3/M3 twin): feature dicts
    # through kernel/wapiti_format.WapitiFeatureEncoder — the Spark
    # operators/wapiti_io.py line assembly must match byte-for-byte
    from ..kernel.wapiti_format import WapitiFeatureEncoder

    enc = WapitiFeatureEncoder(move_to_front=("token",))
    per_turn = [(r, wapiti_feature_dicts(r)) for r in rows]
    enc.fit([[d for d, _t in dicts] for _r, dicts in per_turn])
    wapiti_rows: List[dict] = []
    for r, dicts in per_turn:
        lines = enc.transform_single([d for d, _t in dicts])
        for k, (line, (_d, tag)) in enumerate(zip(lines, dicts)):
            wapiti_rows.append(
                dict(
                    conv_id=r["conv_id"],
                    turn_idx=r["turn_idx"],
                    tok_idx=k,
                    line="%s %s" % (line, tag),
                )
            )
    write(
        "gold_wapiti_lines.parquet",
        wapiti_rows,
        pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("tok_idx", pa.int32()),
                ("line", pa.string()),
            ]
        ),
    )

    # annotation-verifier gold (functions/annotation_qa.py twin): a
    # deterministic corruption (ORG markers retagged PER on
    # crc32(conv_id)%7==0 conversations) diffed against the original
    # with the SAME stream_diff kernel the distributed
    # verify_annotations runs — the gate pins the Spark plumbing
    # (corruption expr lockstep, batch iteration, row filtering),
    # like the shared-kernel twins elsewhere (lloyd_centroids,
    # _pair_cosine).
    import re as _re
    import zlib as _zlib

    from ..functions.annotation_qa import stream_diff

    verify_rows: List[dict] = []
    for r in rows:
        if _zlib.crc32(r["conv_id"].encode("utf-8")) % 7 != 0:
            continue
        corrupted = _re.sub(
            r"__(START|END)_ORG__", r"__\1_PER__", r["text"] or ""
        )
        d = stream_diff(r["text"], corrupted)
        if d is not None:
            verify_rows.append(
                dict(
                    conv_id=r["conv_id"],
                    turn_idx=r["turn_idx"],
                    diff_idx=d["idx"],
                    reason=d["reason"],
                    left=d["left"],
                    right=d["right"],
                )
            )
    write(
        "gold_annotation_diffs.parquet",
        verify_rows,
        pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("diff_idx", pa.int32()),
                ("reason", pa.string()),
                ("left", pa.string()),
                ("right", pa.string()),
            ]
        ),
    )

    # domain-grouped k-fold CV gold (operators/domain_cv.py twin):
    # per-fold P/R/F1 of the GroupKFold-by-domain training workflow
    # (reference example/ner/train.py's GroupKFold evaluation).  The
    # conv→domain pairing reuses the SAME single-node twins that
    # already gate the Spark side: page domains come from
    # infer_domain's lockstep oracle SQL (run here through DuckDB),
    # and the rank pairing is i-th conv (ascending conv_id) → page
    # i % n_pages — identical to conv_domains_from_pages.
    import duckdb

    from ..operators.domain_cv import domain_group_kfold_local
    from ..operators.domains import infer_domain_oracle_sql
    from .html_pages import default_n_pages, ensure_html_pages, sf_of_dir

    pages_path = ensure_html_pages(
        corpus_dir, n_pages=default_n_pages(sf_of_dir(corpus_dir))
    )
    page_rows = duckdb.sql(infer_domain_oracle_sql(pages_path)).fetchall()
    page_rows.sort(key=lambda pr: pr[0])
    page_domains = [pr[1] for pr in page_rows]
    conv_ids = sorted({r["conv_id"] for r in rows})
    domains = {
        cid: page_domains[i % len(page_domains)]
        for i, cid in enumerate(conv_ids)
    }
    cv_rows = domain_group_kfold_local(
        [(r["conv_id"], r["turn_idx"], r["text"]) for r in rows],
        domains, k=3, n_parts=8, rounds=4, min_feat_df=2,
    )
    write(
        "gold_domain_cv.parquet",
        [
            dict(
                fold=f, n_convs=n, tp=tp, n_pred=np_, n_gold=ng,
                precision_x1e6=p, recall_x1e6=rc, f1_x1e6=f1,
            )
            for f, n, tp, np_, ng, p, rc, f1 in cv_rows
        ],
        pa.schema(
            [
                ("fold", pa.int32()),
                ("n_convs", pa.int64()),
                ("tp", pa.int64()),
                ("n_pred", pa.int64()),
                ("n_gold", pa.int64()),
                ("precision_x1e6", pa.int64()),
                ("recall_x1e6", pa.int64()),
                ("f1_x1e6", pa.int64()),
            ]
        ),
    )

    with open(done, "w") as f:
        f.write(GOLD_VERSION + "\n")
    return corpus_dir
