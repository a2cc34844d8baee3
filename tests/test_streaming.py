"""Streaming facet: windowed counts subset-of-batch, stateful dedup,
session windows — all driven with availableNow triggers (deterministic
termination, no wall-clock flakiness)."""

import shutil

from pyspark.sql import functions as F

from gipspark.streaming import events as sev


def _chunks(spark, sf_dir, tmp_path, n=3):
    d = str(tmp_path / "chunks")
    sev.stage_stream_chunks(spark, sf_dir, d, n)
    return d


def test_windowed_counts_subset_of_batch(spark, sf_dir, tmp_path):
    chunks = _chunks(spark, sf_dir, tmp_path)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    st = sev.read_events_stream(spark, chunks)
    sev.run_to_table(sev.windowed_counts(st), out, ck)
    got = {
        (r.win_start_s, r.event_type): r.n
        for r in spark.read.parquet(out)
        .select(F.unix_timestamp("win_start").cast("long").alias("win_start_s"), "event_type", "n")
        .collect()
    }
    assert got, "stream emitted nothing"
    batch = {
        (r.win_start_s, r.event_type): r.n
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("win_start_s"),
            "event_type",
            "n",
        )
        .collect()
    }
    # watermark semantics: every emitted window that closed cleanly must
    # match the batch aggregate exactly; no extra windows may appear
    for k, v in got.items():
        assert k in batch
        assert v <= batch[k]
    exact = sum(1 for k, v in got.items() if batch[k] == v)
    assert exact >= len(got) * 0.5


def test_stream_dedup_drops_replayed_ids(spark, sf_dir, tmp_path):
    chunks = str(tmp_path / "dup_chunks")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(200)
    ev.write.mode("overwrite").parquet(chunks)
    ev.write.mode("append").parquet(chunks)  # full replay → duplicates
    st = sev.read_events_stream(spark, chunks)
    out = str(tmp_path / "dd_out")
    ck = str(tmp_path / "dd_ck")
    sev.run_to_table(sev.dedup_stream(st, watermark="100 days"), out, ck)
    res = spark.read.parquet(out)
    assert res.count() == res.select("event_id").distinct().count() == 200


def test_session_windows_run(spark, sf_dir, tmp_path):
    chunks = _chunks(spark, sf_dir, tmp_path, 2)
    st = sev.read_events_stream(spark, chunks)
    out = str(tmp_path / "sess_out")
    ck = str(tmp_path / "sess_ck")
    sev.run_to_table(sev.session_windows(st), out, ck)
    res = spark.read.parquet(out)
    assert res.count() > 0
    assert set(res.columns) >= {"user_id", "n_events", "value_sum"}


def test_streaming_tile_counts_match_batch_plan(spark, sf_dir, tmp_path):
    chunks = _chunks(spark, sf_dir, tmp_path, 1)  # single chunk: no late data
    st = sev.read_events_stream(spark, chunks)
    out = str(tmp_path / "tc_out")
    ck = str(tmp_path / "tc_ck")
    sev.run_to_table(sev.streaming_cell_counts(st), out, ck)
    got = spark.read.parquet(out).agg(F.sum("n")).collect()[0][0]
    # single-batch availableNow: the final watermark still withholds the
    # tail windows, so emitted counts are a prefix of the batch total
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert got is None or got <= total


def test_streaming_polygon_counts_subset_of_batch(spark, sf_dir, tmp_path):
    """Streaming PIP emits a subset of the batch aggregate's windows
    (watermark holds back open/late windows) with identical values."""
    from pyspark.sql import functions as F

    from gipspark.functions.cells import derived_lat, derived_lon
    from gipspark.operators.pip import pip_join
    from gipspark.queries import ORACLE_POLYGONS
    from gipspark.streaming.events import (
        read_events_stream,
        run_to_table,
        stage_stream_chunks,
        streaming_polygon_counts,
    )

    chunks = str(tmp_path / "chunks")
    stage_stream_chunks(spark, sf_dir, chunks, n_chunks=3)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    stream = read_events_stream(spark, chunks)
    run_to_table(streaming_polygon_counts(stream, ORACLE_POLYGONS), out, ck)
    got = {tuple(r) for r in spark.read.parquet(out).collect()}

    ev = spark.read.parquet(chunks)
    tagged = ev.withColumn("lat", derived_lat(F.col("event_id") + F.lit(1))).withColumn(
        "lon", derived_lon(F.col("event_id") + F.lit(1))
    )
    batch = (
        pip_join(tagged, ORACLE_POLYGONS, level=7)
        .groupBy(F.window("ts", "15 minutes").alias("win"), "poly_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"), "poly_id", "n")
    )
    want = {tuple(r) for r in batch.collect()}
    assert got <= want and len(got) > 0


def test_stream_stream_join_equals_batch(spark, sf_dir, tmp_path):
    # time-ordered chunks: with arrival in event-time order nothing is
    # ever late, so the watermarked stream-stream join must EQUAL the
    # batch interval join (not just a subset)
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    d = str(tmp_path / "ts_chunks")
    chunked = ev.withColumn("__c", F.ntile(4).over(Window.orderBy("ts")))
    for c in range(1, 5):
        chunked.filter(F.col("__c") == c).drop("__c").coalesce(1).write.mode(
            "append"
        ).parquet(d)
    clicks = sev.read_events_stream(spark, d).filter(F.col("event_type") == "click")
    purchases = sev.read_events_stream(spark, d).filter(
        F.col("event_type") == "purchase"
    )
    out = str(tmp_path / "ss_out")
    ck = str(tmp_path / "ss_ck")
    sev.run_to_table(sev.stream_stream_attribution(clicks, purchases), out, ck)
    got = {
        (r.purchase_id, r.click_id) for r in spark.read.parquet(out).collect()
    }
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    exp = {
        (r.purchase_id, r.click_id)
        for r in p.join(
            c,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 24 hours")),
        ).collect()
    }
    assert got == exp and len(exp) > 0


def test_streaming_nearest_edge_equals_batch(spark, sf_dir, tmp_path):
    """nearest_edge is a stateless narrow Column fold, so under
    readStream it must emit EXACTLY the batch result (append mode, no
    watermark, no state) — the property that lets the distance gate run
    inline in an ingest stream."""
    from gipspark.functions.cells import derived_lat, derived_lon
    from gipspark.operators.distance import nearest_edge
    from gipspark.queries import ORACLE_POLYGONS

    def pts(df):
        return df.select(
            "event_id",
            derived_lat(F.col("event_id")).alias("lat"),
            derived_lon(F.col("event_id")).alias("lon"),
        )

    chunks = _chunks(spark, sf_dir, tmp_path)
    st = sev.read_events_stream(spark, chunks)
    out = str(tmp_path / "ne_out")
    ck = str(tmp_path / "ne_ck")
    sev.run_to_table(
        nearest_edge(pts(st), ORACLE_POLYGONS).select("event_id", "nearest_poly", "d2_ticks"),
        out,
        ck,
    )
    got = {(r.event_id, r.nearest_poly, r.d2_ticks) for r in spark.read.parquet(out).collect()}
    batch = {
        (r.event_id, r.nearest_poly, r.d2_ticks)
        for r in nearest_edge(
            pts(spark.read.parquet(f"{sf_dir}/events.parquet")), ORACLE_POLYGONS
        ).collect()
    }
    assert got == batch and got
