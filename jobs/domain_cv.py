#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""spark-submit CLI for the domain-grouped cross-validation workflow
(webstruct_spark/operators/domain_cv.py — see its docstring for the
composition and the reference citations).

Usage:
    spark-submit --py-files /tmp/ws.zip jobs/domain_cv.py \
        --corpus-dir data/transcripts/sf0.001 --k 3
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webstruct_spark.operators.domain_cv import (  # noqa: F401  (re-exports)
    conv_domains_from_pages,
    domain_group_kfold_eval,
    domain_group_kfold_local,
    with_fold,
)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--corpus-dir", required=True)
    p.add_argument("--k", type=int, default=3)
    p.add_argument("--n-parts", type=int, default=8)
    p.add_argument("--rounds", type=int, default=4)
    p.add_argument("--fold-concurrency", type=int, default=4,
                   help="concurrent fold jobs (1 = sequential; lower "
                        "it on memory-tight clusters — each in-flight "
                        "fold caches its own training cut)")
    p.add_argument("--cores", type=int,
                   default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = p.parse_args()

    from webstruct_spark.session import get_spark
    from webstruct_spark.sources.html_pages import (
        default_n_pages,
        ensure_html_pages,
        sf_of_dir,
    )

    spark = get_spark("domain_cv", cores=args.cores)
    turns = spark.read.parquet(
        os.path.join(args.corpus_dir, "transcripts.parquet")
    )
    pages_path = ensure_html_pages(
        args.corpus_dir, n_pages=default_n_pages(sf_of_dir(args.corpus_dir))
    )
    pages = spark.read.parquet(pages_path)
    cd = conv_domains_from_pages(turns, pages)
    res = domain_group_kfold_eval(
        turns, cd, k=args.k, n_parts=args.n_parts, rounds=args.rounds,
        fold_concurrency=args.fold_concurrency,
    )
    res.show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
