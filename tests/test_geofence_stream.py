"""Streaming geofence: transitions with cross-batch state equal batch."""

import pyspark.sql.functions as F
from pyspark.sql.window import Window

from gipspark.functions.cells import derived_lat, derived_lon
from gipspark.queries import ORACLE_POLYGONS
from gipspark.streaming import events as sev
from gipspark.streaming.geofence import fence_flags, geofence_batch, geofence_stream


def _pts(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_id",
            "user_id",
            "ts",
            derived_lat(F.col("event_id")).alias("lat"),
            derived_lon(F.col("event_id")).alias("lon"),
        )
    )


def test_fence_flags_match_pip_join(spark, sf_dir):
    from gipspark.operators.pip import pip_join

    pts = _pts(spark, sf_dir).limit(800)
    flagged = fence_flags(pts, ORACLE_POLYGONS)
    got = {
        (r["event_id"], r["poly_id"])
        for r in flagged.filter("inside = 1").collect()
    }
    want = {
        (r["event_id"], r["poly_id"])
        for r in pip_join(pts, ORACLE_POLYGONS, level=7).collect()
    }
    assert got == want and len(got) > 0


def test_geofence_stream_equals_batch(spark, sf_dir, tmp_path):
    pts = _pts(spark, sf_dir)
    # time-ordered arrival: nothing is late, so stream must EQUAL batch
    d = str(tmp_path / "chunks")
    chunked = pts.withColumn("__c", F.ntile(4).over(Window.orderBy("ts", "event_id")))
    for c in range(1, 5):
        chunked.filter(F.col("__c") == c).drop("__c").coalesce(1).write.mode(
            "append"
        ).parquet(d)
    ddl = "event_id long, user_id long, ts timestamp, lat double, lon double"
    st = spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(d)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    sev.run_to_table(
        geofence_stream(st, ORACLE_POLYGONS, watermark="3650 days"), out, ck
    )
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    want = {
        tuple(r)
        for r in geofence_batch(spark.read.schema(ddl).parquet(d), ORACLE_POLYGONS).collect()
    }
    assert got == want and len(got) > 0
    # the stream really ran as several micro-batches (state had to span them)
    with open(f"{ck}/batch_metrics.txt") as f:
        assert len(f.readlines()) >= 4
