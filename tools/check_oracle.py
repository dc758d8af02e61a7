# -*- coding: utf-8 -*-
"""Driver-style correctness check: run declared queries() against the
DuckDB oracle_sql() at sf0.01 and compare row multisets + column
names.  Usage: python tools/check_oracle.py [query ...] (default all).
"""
from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    only = set(sys.argv[1:])
    import duckdb

    import __spark_entry__ as entry
    from webstruct_spark.session import get_spark

    spark = get_spark("check_oracle", cores=cpus)
    qs = entry.queries()
    oracles = entry.oracle_sql()
    con = duckdb.connect()
    for tbl in ("documents", "events", "orders"):
        p = os.path.join(sf_dir, tbl + ".parquet")
        if os.path.exists(p):
            con.execute(
                "CREATE VIEW %s AS SELECT * FROM read_parquet('%s')"
                % (tbl, p)
            )
    failures = 0
    for name in qs:
        if only and name not in only:
            continue
        if name not in oracles:
            print("%-28s NO ORACLE" % name)
            continue
        try:
            df = qs[name](spark, sf_dir)
            srows = sorted(
                tuple(_norm(v) for v in r) for r in df.collect()
            )
            scols = [f.lower() for f in df.columns]
            res = con.execute(oracles[name])
            ocols = [d[0].lower() for d in res.description]
            orows = sorted(
                tuple(_norm(v) for v in r) for r in res.fetchall()
            )
            ok_schema = scols == ocols
            ok_rows = srows == orows
            if ok_schema and ok_rows:
                print("%-28s OK (%d rows)" % (name, len(srows)))
            else:
                failures += 1
                print(
                    "%-28s FAIL schema=%s rows=%s (%d vs %d)"
                    % (name, ok_schema, ok_rows, len(srows), len(orows))
                )
                if not ok_schema:
                    print("   spark cols:  %s" % scols)
                    print("   oracle cols: %s" % ocols)
                if not ok_rows:
                    sset = set(srows)
                    oset = set(orows)
                    for r in list(sset - oset)[:3]:
                        print("   spark-only:  %s" % (r,))
                    for r in list(oset - sset)[:3]:
                        print("   oracle-only: %s" % (r,))
        except Exception as exc:  # noqa: BLE001
            failures += 1
            print("%-28s ERROR %s" % (name, exc))
    print("failures:", failures)
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
