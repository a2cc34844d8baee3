"""Streaming contact join: emitted pairs across micro-batches equal the
batch colocation operator exactly (cross-batch slot state)."""

import pyspark.sql.functions as F
from pyspark.sql.window import Window

from gipspark.functions.cells import derived_lat, derived_lon
from gipspark.operators.colocation import colocation_pairs
from gipspark.streaming import events as sev
from gipspark.streaming.colocation import colocation_stream


def _pts(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        "ts",
        derived_lat(F.col("event_id")).alias("lat"),
        derived_lon(F.col("event_id")).alias("lon"),
    )


def test_colocation_stream_equals_batch(spark, sf_dir, tmp_path):
    pts = _pts(spark, sf_dir)
    # time-ordered arrival in 4 chunks: slot state must span micro-batches
    # for every 6 h bucket that straddles a chunk boundary
    d = str(tmp_path / "chunks")
    chunked = pts.withColumn("__c", F.ntile(4).over(Window.orderBy("ts", "user_id")))
    for c in range(1, 5):
        chunked.filter(F.col("__c") == c).drop("__c").coalesce(1).write.mode(
            "append"
        ).parquet(d)
    ddl = "user_id long, ts timestamp, lat double, lon double"
    st = spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(d)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    sev.run_to_table(colocation_stream(st, grid_deg=30.0), out, ck)

    emitted = spark.read.parquet(out)
    # a pair may never be emitted twice for the same slot
    assert emitted.count() == emitted.distinct().count()
    got = {
        (r.id_a, r.id_b, r.n_shared)
        for r in emitted.groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .collect()
    }
    want = {
        (r.id_a, r.id_b, r.n_shared)
        for r in colocation_pairs(
            spark.read.schema(ddl).parquet(d), grid_deg=30.0, bucket_sec=21600
        ).collect()
    }
    assert got == want and len(got) > 0
    with open(f"{ck}/batch_metrics.txt") as f:
        assert len(f.readlines()) >= 4
