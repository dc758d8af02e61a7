# -*- coding: utf-8 -*-
"""Phase-isolated profile of the CURRENT (compact-record) q12 trainer
at sf0.1: featurize+persist / min-df / per-round fit+mix, for each of
the three bench variants, repeated to expose run-to-run variance.
Guide §1: decide where the time goes before touching anything.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("PROF_REPS", "3"))
    import __spark_entry__ as entry
    from pyspark import StorageLevel
    from webstruct_spark.operators.extract import mentions
    from webstruct_spark.operators.trained import (
        prepare_fit_rows,
        train_crf_distributed,
    )
    from webstruct_spark.session import get_spark

    corpus = entry._corpus_for(entry._sf_of(sf_dir))
    spark = get_spark("prof_q12b", cores=cpus)
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

    # phase A: featurize+persist alone, repeated
    for i in range(reps):
        sc.setJobDescription("prof: prepare_fit_rows rep%d" % i)

        def prep():
            rdd = prepare_fit_rows(t, n_parts=cpus).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            n = rdd.count()
            rdd.unpersist()
            return n

        timed("A featurize+persist rep%d" % i, prep)

    # phase B: full trainer per variant, repeated
    for i in range(reps):
        for name, kw in (
            ("unpruned", dict(min_feat_df=None)),
            ("pruned", dict()),
            ("hashed", dict(feat_hash_dim=4096)),
        ):
            sc.setJobDescription("prof: q12_%s rep%d" % (name, i))
            timed(
                "B q12_%s rep%d" % (name, i),
                lambda kw=kw: len(
                    train_crf_distributed(t, n_parts=cpus, **kw).w
                ),
            )

    spark.stop()


if __name__ == "__main__":
    main()
