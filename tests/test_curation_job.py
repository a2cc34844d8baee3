"""Curation pipeline: end-to-end run, resume semantics, and parity
with a direct (uncheckpointed) recompute."""

import os
import shutil

from pyspark.sql import functions as F


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_curation_run_and_resume(spark, sf_dir, tmp_path):
    from gipspark.plans.curation import run_curation

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    ck = str(tmp_path / "ck")

    packed, run = run_curation(spark, docs, ck, "runA")
    first = _rows(packed)
    assert run.executed == ["c1_fingerprint", "c2_neardup", "c3_filter", "c4_pack"]
    assert run.skipped == []
    assert len(first) > 0

    # packing invariant: no sequence exceeds the budget unless singleton
    over = (
        packed.groupBy("bucket", "seq_id")
        .agg(F.sum("tok").alias("t"), F.count("*").alias("k"))
        .filter((F.col("t") > 512) & (F.col("k") > 1))
        .count()
    )
    assert over == 0

    # lineage rows exist for every stage
    lin = run.lineage()
    stages = {r.stage for r in lin.select("stage").distinct().collect()}
    assert stages == {"c1_fingerprint", "c2_neardup", "c3_filter", "c4_pack"}

    # resume: kill the last two stages; first two must be skipped
    shutil.rmtree(os.path.join(ck, "runA", "c3_filter"))
    shutil.rmtree(os.path.join(ck, "runA", "c4_pack"))
    packed2, run2 = run_curation(spark, docs, ck, "runA")
    assert run2.skipped == ["c1_fingerprint", "c2_neardup"]
    assert run2.executed == ["c3_filter", "c4_pack"]
    assert _rows(packed2) == first

    # full re-run: everything skipped, same rows
    packed3, run3 = run_curation(spark, docs, ck, "runA")
    assert run3.executed == []
    assert _rows(packed3) == first


def test_curation_job_main(spark, sf_dir, tmp_path):
    from jobs.run_curation import main

    rc = main(
        [
            "--input", os.path.join(sf_dir, "documents.parquet"),
            "--ckpt", str(tmp_path / "ck2"),
            "--run-id", "jobrun",
            "--output", str(tmp_path / "out"),
        ]
    )
    assert rc == 0
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() > 0
    assert set(out.columns) == {"doc_id", "bucket", "tok", "seq_id", "offset"}
