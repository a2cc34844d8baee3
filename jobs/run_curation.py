"""spark-submit entry point for the curation pipeline.

The webtext twin of jobs/run_tiling.py — same deployment contract
(BASELINE.json:6 "spark-submit --py-files", resumable checkpoints):

    cd /root/repo && zip -qr /tmp/gipspark.zip gipspark
    spark-submit --py-files /tmp/gipspark.zip \
        jobs/run_curation.py \
        --input  /path/to/docs_parquet \
        --ckpt   /path/to/checkpoints --run-id crawl42 \
        --output /path/to/packed

Re-submitting with the same --ckpt/--run-id resumes: completed stages
(c1_fingerprint … c4_pack) are read back from their parquet
checkpoints, not recomputed. The job prints one JSON line with stage
status + row counts for orchestrator consumption.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="gipspark curation pipeline")
    ap.add_argument("--input", required=True, help="documents table (parquet dir)")
    ap.add_argument("--ckpt", required=True, help="checkpoint root directory")
    ap.add_argument("--run-id", default="run0")
    ap.add_argument("--output", default=None, help="final packed dir (default: ckpt stage)")
    ap.add_argument("--local-cores", type=int, default=None, help="local[N] fallback when no master set")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from gipspark.session import get_spark

        spark = get_spark("gipspark-curation", parallelism=args.local_cores)

    from gipspark.plans.curation import run_curation

    t0 = time.time()
    docs = spark.read.parquet(args.input)
    packed, run = run_curation(spark, docs, args.ckpt, args.run_id)
    if args.output:
        packed.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
    else:
        n = packed.count()
    print(
        json.dumps(
            {
                "job": "curation",
                "run_id": args.run_id,
                "rows_packed": n,
                "executed": run.executed,
                "skipped": run.skipped,
                "wall_s": round(time.time() - t0, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
