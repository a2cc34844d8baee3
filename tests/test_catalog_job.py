"""Catalog shim + tiling job entry point."""

import json
import subprocess
import sys

from gipspark.sources.catalog import read_table, write_table


def test_catalog_shim_parquet_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    df = spark.range(100).withColumnRenamed("id", "k").withColumn("b", F.col("k") % 5)
    p = str(tmp_path / "t")
    write_table(df, p, partition_by=["b"])
    back = read_table(spark, p)
    assert back.count() == 100
    # catalog-style name without a configured catalog → treated as path
    # (and a slash always means path)
    assert sorted(read_table(spark, p).columns) == ["b", "k"]


def test_tiling_job_cli(spark, tmp_path):
    from gipspark.sources.fixtures import docs_df

    docs_df(spark, 500).write.mode("overwrite").parquet(str(tmp_path / "docs"))
    # run the job in-process against the session fixture (spark-submit
    # path exercised manually; getActiveSession branch covers it here)
    sys.argv_backup = None
    from jobs.run_tiling import main

    rc = main(
        [
            "--input", str(tmp_path / "docs"),
            "--ckpt", str(tmp_path / "ckpt"),
            "--run-id", "t1",
            "--output", str(tmp_path / "out"),
        ]
    )
    assert rc == 0
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() > 0
    # resume: second invocation skips all stages
    rc = main(
        ["--input", str(tmp_path / "docs"), "--ckpt", str(tmp_path / "ckpt"), "--run-id", "t1"]
    )
    assert rc == 0
