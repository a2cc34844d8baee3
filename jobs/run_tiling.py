"""spark-submit entry point for the tiling pipeline.

north_star deployment contract: "Runs via spark-submit --py-files on
multi-executor clusters" (BASELINE.json:6). Package and launch:

    cd /root/repo && zip -qr /tmp/gipspark.zip gipspark
    spark-submit --py-files /tmp/gipspark.zip \
        --conf spark.sql.execution.arrow.maxRecordsPerBatch=16384 \
        jobs/run_tiling.py \
        --input  /path/to/docs_parquet_or_iceberg_table \
        --ckpt   /path/to/checkpoints --run-id crawl42 \
        --output /path/to/assignments

On a cluster, add --master yarn/k8s and executor sizing; the job code
is identical (local-mode testing is the sandbox surrogate). The run is
resumable: re-submitting with the same --ckpt/--run-id skips completed
stages (gipspark.sources.checkpoint).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="gipspark tiling pipeline")
    ap.add_argument("--input", required=True, help="docs table (parquet dir or catalog table)")
    ap.add_argument("--ckpt", required=True, help="checkpoint root directory")
    ap.add_argument("--run-id", default="run0")
    ap.add_argument("--output", default=None, help="final assignments dir (default: ckpt stage)")
    ap.add_argument("--polygons", type=int, default=50, help="fixture polygon count (or use --polygons-json)")
    ap.add_argument("--polygons-json", default=None, help="JSON file: [{poly_id, rings}]")
    ap.add_argument("--local-cores", type=int, default=None, help="local[N] fallback when no master set")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        # under spark-submit the master/conf come from the launcher;
        # bare `python jobs/run_tiling.py` gets the tuned local session
        from gipspark.session import get_spark

        spark = get_spark("gipspark-tiling", parallelism=args.local_cores)

    from gipspark.plans.pipeline import run_pipeline
    from gipspark.sources.catalog import read_table
    from gipspark.sources.fixtures import polygons as fixture_polygons

    if args.polygons_json:
        with open(args.polygons_json) as f:
            polys = json.load(f)
    else:
        polys = fixture_polygons(args.polygons)

    docs = read_table(spark, args.input)
    t0 = time.time()
    final, run = run_pipeline(spark, docs, polys, args.ckpt, args.run_id)
    n = final.count()
    if args.output:
        final.write.mode("overwrite").parquet(args.output)
    summary = {
        "run_id": args.run_id,
        "rows": n,
        "executed": run.executed,
        "skipped": run.skipped,
        "wall_s": round(time.time() - t0, 2),
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
