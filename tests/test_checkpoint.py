"""Checkpoint/resume semantics: skip-completed, atomic commit, lineage."""

import shutil

from pyspark.sql import functions as F

from gipspark.plans.pipeline import run_pipeline
from gipspark.sources.checkpoint import CheckpointedRun
from gipspark.sources.fixtures import docs_df, polygons


def test_stage_runs_once_and_resumes(spark, tmp_path):
    root = str(tmp_path / "ck")
    run = CheckpointedRun(spark, root, "r1")
    calls = []

    def build():
        calls.append(1)
        return spark.range(100).withColumn("v", F.col("id") * 2)

    a = run.stage("s1", build, key_col="id")
    assert a.count() == 100 and calls == [1]
    b = run.stage("s1", build, key_col="id")
    assert b.count() == 100 and calls == [1]  # not rebuilt

    run2 = CheckpointedRun(spark, root, "r1")
    c = run2.stage("s1", build, key_col="id")
    assert c.count() == 100 and calls == [1]
    assert run2.skipped == ["s1"]
    lin = run2.lineage()
    assert lin is not None and lin.filter("stage = 's1'").count() > 0
    tot = lin.filter("stage = 's1'").agg(F.sum("rows")).collect()[0][0]
    assert tot == 100


def test_pipeline_resume_mid_tiling(spark, tmp_path):
    root = str(tmp_path / "pk")
    docs = docs_df(spark, 500)
    polys = polygons(10)
    final, run = run_pipeline(spark, docs, polys, root, "runX")
    got = sorted(tuple(r) for r in final.select("url", "poly_id").collect())
    assert run.executed == ["s1_enrich", "s2_pip", "s3_cluster"]

    # kill "mid-tiling": later stages lost, earlier checkpoints intact
    shutil.rmtree(f"{root}/runX/s2_pip")
    shutil.rmtree(f"{root}/runX/s3_cluster")
    final2, run2 = run_pipeline(spark, docs, polys, root, "runX")
    assert run2.skipped == ["s1_enrich"]
    assert run2.executed == ["s2_pip", "s3_cluster"]
    got2 = sorted(tuple(r) for r in final2.select("url", "poly_id").collect())
    assert got == got2 and len(got2) > 0
