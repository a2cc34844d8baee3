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


def test_spark_submit_pyfiles_deploy(spark, tmp_path):
    """The north_rule deployment contract, actually executed: package
    gipspark as a zip, spark-submit with --py-files from a neutral cwd
    (repo root NOT on the path — the import must resolve from the zip),
    then re-submit and assert checkpoint resume skipped every stage."""
    import os
    import shutil

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    zpath = str(tmp_path / "gipspark.zip")
    subprocess.run(["zip", "-qr", zpath, "gipspark"], cwd=repo, check=True)

    from gipspark.sources.fixtures import docs_df

    docs_df(spark, 400).write.mode("overwrite").parquet(str(tmp_path / "docs"))

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    args = [
        spark_submit,
        "--master", "local[4]",
        "--py-files", zpath,
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        os.path.join(repo, "jobs", "run_tiling.py"),
        "--input", str(tmp_path / "docs"),
        "--ckpt", str(tmp_path / "ckpt"),
        "--run-id", "sub1",
        "--output", str(tmp_path / "out"),
        "--polygons", "10",
    ]
    p = subprocess.run(args, cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=420)
    assert p.returncode == 0, p.stderr[-2000:]
    summary = json.loads([ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1])
    assert summary["rows"] > 0 and summary["executed"], summary
    assert spark.read.parquet(str(tmp_path / "out")).count() == summary["rows"]

    p2 = subprocess.run(args[:-2], cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=420)
    assert p2.returncode == 0, p2.stderr[-2000:]
    s2 = json.loads([ln for ln in p2.stdout.splitlines() if ln.startswith("{")][-1])
    assert s2["executed"] == [] and len(s2["skipped"]) >= 3, s2
    assert s2["rows"] == summary["rows"]
