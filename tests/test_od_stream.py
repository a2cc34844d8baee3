"""Streaming OD tracking: closed (user, day) rows equal the batch
first/last exactly; the open tail is withheld by the watermark."""

import pyspark.sql.functions as F
from pyspark.sql.window import Window

from gipspark.functions.cells import derived_lat, derived_lon
from gipspark.streaming import events as sev
from gipspark.streaming.od import od_stream


def _pts(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        "event_id",
        "ts",
        derived_lat(F.col("event_id")).alias("lat"),
        derived_lon(F.col("event_id")).alias("lon"),
    )


def test_od_stream_matches_batch_for_closed_days(spark, sf_dir, tmp_path):
    pts = _pts(spark, sf_dir)
    d = str(tmp_path / "chunks")
    chunked = pts.withColumn("__c", F.ntile(4).over(Window.orderBy("ts", "event_id")))
    for c in range(1, 5):
        chunked.filter(F.col("__c") == c).drop("__c").coalesce(1).write.mode(
            "append"
        ).parquet(d)
    ddl = "user_id long, event_id long, ts timestamp, lat double, lon double"
    st = spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(d)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    sev.run_to_table(od_stream(st, grid_deg=10.0), out, ck)

    emitted = spark.read.parquet(out)
    got = {(r.user_id, r.day_s): (r.origin, r.dest) for r in emitted.collect()}
    assert len(got) == emitted.count(), "duplicate (user, day) emissions"
    assert got, "stream emitted nothing"

    # batch twin: first/last cell per (user, day) via the same windows
    batch = _pts(spark, sf_dir)
    cell = (
        F.floor((F.col("lon") + F.lit(180.0)) / F.lit(10.0)).cast("int") * 100
        + F.floor((F.lit(90.0) - F.col("lat")) / F.lit(10.0)).cast("int")
    )
    day_s = F.unix_timestamp(F.col("ts").cast("date").cast("timestamp")).cast("long")
    p = batch.select("user_id", "event_id", "ts", day_s.alias("day_s"), cell.alias("cell"))
    wa = Window.partitionBy("user_id", "day_s").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id", "day_s").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = p.select(
        "user_id", "day_s", "cell",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wd).alias("rd"),
    )
    first = {(r.user_id, r.day_s): r.cell for r in ranked.filter("ra = 1").collect()}
    last = {(r.user_id, r.day_s): r.cell for r in ranked.filter("rd = 1").collect()}

    for k, (o, dd) in got.items():
        assert (first[k], last[k]) == (o, dd)
    # the open tail (last day) must be withheld
    max_day = max(day for _, day in first)
    assert all(day < max_day for _, day in got)
    # and most closed days must have emitted
    closed = {k for k in first if k[1] < max_day}
    assert len(got) >= 0.9 * len(closed)
