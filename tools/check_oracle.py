"""Local emulation of the driver's correctness gate.

Runs every registry query on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compares row count, column names, and an
order-insensitive exact value comparison (rows sorted after sorting
columns by name — the driver's documented procedure). Usage:

    python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def norm_cell(v):
    import datetime
    import decimal
    import math

    if v is None:
        return ("", "")
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, bool):
        return ("b", str(v))
    if isinstance(v, int):
        return ("i", str(v))
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(norm_cell(x) for x in v))
    return ("s", str(v))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

    from gipspark import get_spark
    from gipspark.queries import REGISTRY

    spark = get_spark("oracle-check", extra={"spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, (fn, sql) in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            print(f"FAIL {name}: spark error {e!r}"[:500])
            failures.append(name)
            continue
        if sql is None:
            print(f"rows-only {name}: {len(srows)} rows, cols={scols} ({time.time()-t0:.1f}s)")
            if len(srows) == 0:
                print(f"  WARN {name}: zero rows")
            continue
        try:
            rel = con.sql(sql)
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e!r}"[:500])
            failures.append(name)
            continue
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            ok = False
        if ok:
            order = sorted(scols)
            s_idx = [scols.index(c) for c in order]
            d_idx = [dcols.index(c) for c in order]
            s_set = sorted(tuple(norm_cell(r[i]) for i in s_idx) for r in srows)
            d_set = sorted(tuple(norm_cell(r[i]) for i in d_idx) for r in drows)
            if s_set != d_set:
                bad = [(a, b) for a, b in zip(s_set, d_set) if a != b][:3]
                print(f"FAIL {name}: value mismatch, first diffs: {bad}")
                ok = False
        if ok:
            print(f"OK   {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)
    print("\n==", "ALL PASS" if not failures else f"FAILURES: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
