# -*- coding: utf-8 -*-
"""Capture .explain('formatted') for declared queries into
plans/r06/<query>_<tag>.txt.  Usage:
  python tools/capture_plans.py <tag> <query> [query ...]
Special names (bench-only paths): bench_q3_canonicalize,
bench_q12_fit (prepared-RDD path has no DF plan; skipped),
bench_q6c_probe.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    tag = sys.argv[1]
    names = sys.argv[2:]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r06",
    )
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry
    from webstruct_spark.session import get_spark

    spark = get_spark("capture_plans", cores=8)
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        p = os.path.join(out_dir, "%s_%s.txt" % (name, tag))
        with open(p, "w") as fh:
            fh.write(buf.getvalue())
        print("wrote", p)
    spark.stop()


if __name__ == "__main__":
    main()
