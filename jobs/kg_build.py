#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""spark-submit entry point for the full KG build.

Usage:
    zip -qr /tmp/ws.zip webstruct_spark
    spark-submit --py-files /tmp/ws.zip jobs/kg_build.py \
        --corpus-dir data/transcripts/sf0.001 --out /tmp/kgout

Re-running with the same --out resumes at the first uncommitted stage
(see webstruct_spark/plans/manifest.py); --force restarts from scratch.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--corpus-dir", required=True,
                   help="dir with transcripts.parquet + gazetteer.parquet")
    p.add_argument("--out", required=True, help="output dir for KG tables")
    p.add_argument("--cores", type=int,
                   default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    p.add_argument("--force", action="store_true",
                   help="ignore committed stages and rebuild everything")
    p.add_argument("--stage-concurrency", type=int, default=4,
                   help="independent DAG stages run as this many "
                        "concurrent Spark jobs (1 = strict sequential)")
    p.add_argument("--append", action="store_true",
                   help="treat --corpus-dir as a DELTA of new "
                        "conversations appended to the existing build "
                        "at --out (per-conversation stages file-append; "
                        "links/nodes/edges recompute over the union)")
    args = p.parse_args()
    if args.append and args.force:
        p.error("--append and --force are mutually exclusive")

    from webstruct_spark.plans.pipeline import append_kg, build_kg
    from webstruct_spark.session import get_spark

    spark = get_spark("kg_build", cores=args.cores)
    try:
        if args.force:
            # fsio routes URI out dirs (hdfs://, s3a://, file:) through
            # the JVM Hadoop FS — a driver-local rmtree would silently
            # miss them and the build would RESUME instead of force
            from webstruct_spark.plans import fsio

            fsio.delete(spark, args.out)
        if args.append:
            paths = append_kg(spark, args.corpus_dir, args.out,
                              stage_concurrency=args.stage_concurrency)
        else:
            paths = build_kg(spark, args.corpus_dir, args.out,
                             resume=not args.force,
                             stage_concurrency=args.stage_concurrency)
        summary = {
            stage: spark.read.parquet(path).count()
            for stage, path in paths.items()
        }
        print(json.dumps({"out": args.out, "rows": summary}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
