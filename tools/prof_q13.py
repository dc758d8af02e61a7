# -*- coding: utf-8 -*-
"""Phase-isolated profile of q13 (domain-grouped k-fold CV) at sf0.1:
folds table / prepare+persist / per-fold fit / per-fold inference+prf,
sequential vs concurrent.  Guide §1.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    import __spark_entry__ as entry
    from pyspark import StorageLevel
    from pyspark.sql import functions as F
    from webstruct_spark.operators.domain_cv import (
        conv_domains_from_pages,
        domain_group_kfold_eval,
        with_fold,
    )
    from webstruct_spark.operators.extract import mentions
    from webstruct_spark.operators.metrics import set_prf
    from webstruct_spark.operators.trained import (
        crf_tagged_mentions,
        prepare_fit_rows,
        train_crf_distributed,
    )
    from webstruct_spark.sources.html_pages import (
        default_n_pages,
        ensure_html_pages,
    )
    from webstruct_spark.session import get_spark

    sf = entry._sf_of(sf_dir)
    corpus = entry._corpus_for(sf)
    spark = get_spark("prof_q13", cores=cpus)
    sc = spark.sparkContext
    t = spark.read.parquet(os.path.join(corpus, "transcripts.parquet"))
    t.cache()
    t.count()
    mentions(t).count()  # warm python workers

    def timed(name, fn):
        t0 = time.time()
        r = fn()
        print("%-40s %7.3f s" % (name, time.time() - t0), flush=True)
        return r

    pages = spark.read.parquet(
        ensure_html_pages(corpus, n_pages=default_n_pages(sf))
    )

    sc.setJobDescription("q13: conv_domains + folds table")
    cd = timed(
        "folds: conv_domains_from_pages",
        lambda: conv_domains_from_pages(t, pages),
    )
    folds = timed(
        "folds: with_fold + localCheckpoint",
        lambda: with_fold(
            cd.groupBy("conv_id").agg(F.min("domain").alias("domain")), 3
        )
        .select("conv_id", "fold")
        .localCheckpoint(eager=True),
    )

    sc.setJobDescription("q13: prepare_fit_rows")
    tagged = t.join(F.broadcast(folds), "conv_id")
    prepared = timed(
        "prepare_fit_rows + persist + count",
        lambda: prepare_fit_rows(
            tagged, n_parts=cpus, tag_col="fold"
        ).persist(StorageLevel.MEMORY_AND_DISK),
    )
    timed("  (count to materialize)", prepared.count)

    models = {}
    for fold in (0, 1, 2):
        sc.setJobDescription("q13: fit fold %d" % fold)
        models[fold] = timed(
            "fit fold %d" % fold,
            lambda f=fold: train_crf_distributed(
                None, n_parts=cpus, rounds=4, min_feat_df=2,
                prepared=prepared,
                prepared_keep=lambda t, _f=f: t != _f,
            ),
        )

    for fold in (0, 1, 2):
        sc.setJobDescription("q13: infer+prf fold %d" % fold)

        def infer(f=fold):
            test_ids = F.broadcast(
                folds.where(F.col("fold") == f).select("conv_id")
            )
            test_turns = t.join(test_ids, "conv_id", "left_semi")
            pred = crf_tagged_mentions(test_turns, models[f]).persist()
            gold = mentions(test_turns).persist()
            row = set_prf(
                pred, gold, ["conv_id", "turn_idx", "text", "entity_type"]
            ).collect()[0]
            pred.unpersist()
            gold.unpersist()
            return row["f1_x1e6"]

        timed("infer+prf fold %d" % fold, infer)

    prepared.unpersist()

    # end-to-end for reference (the bench shape), twice
    pages2 = spark.read.parquet(
        ensure_html_pages(corpus, n_pages=default_n_pages(sf))
    )
    for i in range(2):
        sc.setJobDescription("q13 end-to-end rep%d" % i)
        timed(
            "q13 end-to-end rep%d" % i,
            lambda: domain_group_kfold_eval(
                t, conv_domains_from_pages(t, pages2), k=3, n_parts=cpus
            ).count(),
        )

    spark.stop()


if __name__ == "__main__":
    main()
