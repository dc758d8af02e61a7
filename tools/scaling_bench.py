#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Two-parallelism scaling benchmark (BASELINE.json north rule proxy):
run the SAME KG job on the SAME corpus at local[N] and local[4N],
report turns/sec at both and scaling efficiency
= (throughput_4N / throughput_N) / 4.

Each measurement runs in its own subprocess (fresh JVM) so the two
parallelism levels don't share executor state.

Usage: python tools/scaling_bench.py [--conversations 2000] [--n 8]
       python tools/scaling_bench.py --single-run --cores 8 --corpus D
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def single_run(cores: int, corpus: str) -> None:
    from pyspark.sql import functions as F

    from webstruct_spark.operators.extract import extract_rows
    from webstruct_spark.operators.grouping_op import group_entities
    from webstruct_spark.operators.triples_op import triples
    from webstruct_spark.session import get_spark

    spark = get_spark("scaling_bench", cores=cores,
                      shuffle_partitions=max(8, cores))
    turns = spark.read.parquet(os.path.join(corpus, "transcripts.parquet"))
    turns = turns.repartition(cores * 2).cache()
    n_turns = turns.count()

    # cold run doubles as the warmup: it spins up every python worker
    # (a full pass over all partitions). The warm run is the steady
    # state a long job sees and is what efficiency is computed from;
    # both are reported.
    results = []
    for run in ("cold", "warm"):
        t0 = time.time()
        ext = extract_rows(turns)
        n_triples = triples(group_entities(ext)).count()
        wall = time.time() - t0
        results.append((run, wall, n_triples))
    spark.stop()
    for run, wall, n_triples in results:
        print(json.dumps(dict(
            cores=cores, run=run, turns=n_turns, wall_sec=round(wall, 3),
            turns_per_sec=round(n_turns / wall, 1), triples=n_triples)))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--conversations", type=int, default=2000)
    p.add_argument("--n", type=int, default=8, help="small parallelism N")
    p.add_argument("--single-run", action="store_true")
    p.add_argument("--cores", type=int)
    p.add_argument("--corpus")
    args = p.parse_args()

    if args.single_run:
        single_run(args.cores, args.corpus)
        return

    from webstruct_spark.sources.transcripts import (
        default_corpus_dir,
        materialize_corpus,
    )

    corpus = materialize_corpus(
        default_corpus_dir("bench%d" % args.conversations),
        args.conversations,
    )

    results = {}
    for cores in (args.n, args.n * 4):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single-run",
             "--cores", str(cores), "--corpus", corpus],
            capture_output=True, text=True, check=True,
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        for line in lines:
            print(line)
        results[cores] = json.loads(lines[-1])  # warm run

    n, n4 = args.n, args.n * 4
    eff = (results[n4]["turns_per_sec"] / results[n]["turns_per_sec"]) / 4
    print(json.dumps(dict(
        metric="scaling_efficiency", n=n, n4=n4,
        turns=results[n]["turns"],
        turns_per_sec_n=results[n]["turns_per_sec"],
        turns_per_sec_4n=results[n4]["turns_per_sec"],
        efficiency=round(eff, 3),
    )))


if __name__ == "__main__":
    main()
