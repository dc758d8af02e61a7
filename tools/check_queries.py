#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Driver-simulation harness: run every __spark_entry__ query at a
given sf_dir and its DuckDB oracle side-by-side, compare row count,
schema (column names) and an order-insensitive value hash.

Usage: python tools/check_queries.py [sf_dir] [query ...]

MEANINGFUL ONLY AT sf0.01 for the gold-backed queries: oracle_sql()
takes no sf parameter (the driver contract), so its gold-table paths
are pinned to the driver's gate scale — running this harness at any
other sf_dir reports guaranteed hash mismatches for lang_id, the
dedup/ANN family, and kg_refreshed_nodes.  That is the harness
contract, not a correctness failure.
"""
from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(df) -> str:
    """Order-insensitive hash: sort columns by name, stringify rows,
    sort, md5."""
    cols = sorted(df.columns)
    rows = [
        "|".join(_norm(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def _norm(v) -> str:
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return "%.6g" % v
    return str(v)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] in ("-h", "--help"):
        # without this, "--help" was taken as the sf_dir and the full
        # ~10-min 42-query suite ran instead of printing usage
        print(__doc__)
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if not os.path.isdir(sf_dir):
        sys.exit(
            "check_queries: sf_dir %r does not exist (usage: "
            "python tools/check_queries.py [sf_dir] [query ...])"
            % sf_dir
        )
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry
    from webstruct_spark.session import get_spark

    spark = get_spark("check_queries", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows={len(sdf)} (rows-only, no oracle) "
                  f"spark={t_spark:.1f}s")
            continue
        t0 = time.time()
        odf = con.sql(oracles[name]).df()
        t_duck = time.time() - t0
        ok_rows = len(sdf) == len(odf)
        ok_schema = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = ok_schema and value_hash(sdf) == value_hash(odf)
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name}: {status} rows={len(sdf)}/{len(odf)} "
            f"schema={'=' if ok_schema else sorted(sdf.columns)} "
            f"hash={'=' if ok_hash else 'MISMATCH'} "
            f"spark={t_spark:.1f}s duck={t_duck:.1f}s"
        )
        if not ok_hash and ok_schema:
            cols = sorted(sdf.columns)
            a = {
                "|".join(_norm(v) for v in r)
                for r in sdf[cols].itertuples(index=False, name=None)
            }
            b = {
                "|".join(_norm(v) for v in r)
                for r in odf[cols].itertuples(index=False, name=None)
            }
            for x in list(a - b)[:3]:
                print("   spark-only:", x)
            for x in list(b - a)[:3]:
                print("   oracle-only:", x)
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
