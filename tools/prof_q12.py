# -*- coding: utf-8 -*-
"""Phase-isolated profile of train_crf_distributed (q12) at sf0.1:
featurize+shuffle / persist / min-df / per-round fit+mix — the guide
§1 decomposition that tells us whether q12 is compute- or
orchestration-bound.  Replicates the trainer's phases inline (same
code, timed); NOT a correctness path.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark import StorageLevel
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    import __spark_entry__ as entry
    from webstruct_spark.operators.extract import mentions
    from webstruct_spark.operators.trained import prepare_fit_rows
    from webstruct_spark.kernel.crf import CRFTagger
    from webstruct_spark.operators.tagger import DEFAULT_TYPES
    from webstruct_spark.session import get_spark

    corpus = entry._corpus_for(entry._sf_of(sf_dir))
    spark = get_spark("prof_q12", cores=cpus)
    sc = spark.sparkContext
    t = spark.read.parquet(os.path.join(corpus, "transcripts.parquet"))
    t.cache()
    t.count()
    mentions(t).count()  # warm python workers

    marks = {}

    def mark(name, t0):
        marks[name] = round(time.time() - t0, 3)
        print("%-28s %7.3f s" % (name, marks[name]), flush=True)

    n_parts = cpus
    t0 = time.time()
    rows_src = prepare_fit_rows(t, n_parts=n_parts)
    keep = None

    def _prep_grp(it, _keep=keep):
        rows = [r for r in it if _keep is None or _keep(r[1])]
        rows.sort(key=lambda r: r[2])
        if rows:
            yield (rows[0][0], [r[3] for r in rows], [r[4] for r in rows])

    parted = rows_src.mapPartitions(
        _prep_grp, preservesPartitioning=True
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_live = parted.count()
    mark("featurize+shuffle+persist", t0)
    P = float(n_live)

    model = CRFTagger(DEFAULT_TYPES)
    tags = tuple(model.tags)

    for rnd in range(4):
        t0 = time.time()
        bc = sc.broadcast(model.export())

        def fit_part(it, _bc=bc):
            import time as _time

            for pid, seqs, feats in it:
                t_in = _time.time()
                m = CRFTagger.from_export(_bc.value)
                t_mk = _time.time()
                m.fit(seqs, epochs=1, feats_per_seq=feats,
                      feats_prehashed=True)
                t_fit = _time.time()
                yield pid, m.w, m.trans, m.init, (
                    t_mk - t_in, t_fit - t_mk, len(seqs))

        def expand(rec):
            pid, w, trans, init, tm = rec
            yield "\x00trans", (pid, trans)
            yield "\x00init", (pid, init)
            yield "\x00tm", (pid, np.array([tm[0], tm[1], tm[2]]))
            for f, v in w.items():
                yield f, (pid, v)

        def avg(vals, _P=P):
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
        w = {}
        trans = init = None
        for k, v in items:
            if k == "\x00trans":
                trans = v
            elif k == "\x00tm":
                print(
                    "   round %d avg per-shard: from_export %.3f s, "
                    "fit %.3f s, seqs %.0f"
                    % (rnd, v[0], v[1], v[2]), flush=True,
                )
            elif k == "\x00init":
                init = v
            else:
                w[k] = v.tolist()
        model = CRFTagger.from_export(
            (tags, w, trans.tolist(), init.tolist(), None)
        )
        mark("round_%d (fit+mix+collect)" % rnd, t0)

    parted.unpersist()
    print("TOTAL %.3f s" % sum(marks.values()), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
