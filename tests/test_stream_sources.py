"""Source-adapter tests: every backend yields the same canonical
schema, the file backend drains to the same totals as a batch read,
and the kafka backend fails with an actionable error when the
connector jar is absent (the sandbox case)."""

import pytest
from pyspark.sql import functions as F

from gipspark.streaming.events import run_to_table, stage_stream_chunks, windowed_counts
from gipspark.streaming.sources import open_source


def test_unknown_backend_rejected(spark):
    with pytest.raises(ValueError, match="unknown stream source"):
        open_source(spark, "pulsar")


def test_rate_source_schema_matches_file_source(spark, sf_dir, tmp_path):
    chunks = str(tmp_path / "chunks")
    stage_stream_chunks(spark, sf_dir, chunks, n_chunks=2)
    file_df = open_source(spark, "file", path=chunks)
    rate_df = open_source(spark, "rate", rows_per_second=10)
    assert file_df.isStreaming and rate_df.isStreaming
    assert [(f.name, f.dataType) for f in rate_df.schema.fields] == [
        (f.name, f.dataType) for f in file_df.schema.fields
    ]


def test_file_source_drains_to_batch_totals(spark, sf_dir, tmp_path):
    chunks = str(tmp_path / "chunks")
    stage_stream_chunks(spark, sf_dir, chunks, n_chunks=3)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    stream = open_source(spark, "file", path=chunks)
    run_to_table(windowed_counts(stream), out, ck, mode="append")
    got = spark.read.parquet(out)
    batch = windowed_counts_batch(spark, chunks)
    # watermark closes only windows older than the max seen ts; emitted
    # windows must be a subset of the batch aggregate with equal values.
    # Counts compare exactly; value_sum is a double aggregate, and the
    # incremental (streaming) vs parallel (batch) summation orders may
    # differ by an ulp — compare with a relative tolerance.
    import math

    b = {(r["win_start"], r["win_end"], r["event_type"]): r for r in batch.collect()}
    g = {(r["win_start"], r["win_end"], r["event_type"]): r for r in got.collect()}
    assert set(g) <= set(b) and len(g) > 0
    for k, r in g.items():
        assert r["n"] == b[k]["n"]
        assert math.isclose(r["value_sum"], b[k]["value_sum"], rel_tol=1e-9)


def windowed_counts_batch(spark, chunk_dir):
    ev = spark.read.parquet(chunk_dir)
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("value_sum"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def test_kafka_gated_with_actionable_error(spark):
    try:
        spark._jvm.java.lang.Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
        pytest.skip("kafka connector present; gate not exercisable")
    except Exception:
        pass
    with pytest.raises(RuntimeError, match="--packages"):
        open_source(spark, "kafka", bootstrap_servers="b:9092", topic="events")


def test_stage_chunks_are_time_ordered_by_mtime(spark, sf_dir, tmp_path):
    # the determinism contract: file-source replay order (mtime) must
    # equal event-time order, else append-mode watermark output depends
    # on a directory-listing coin flip
    import glob
    import os

    d = str(tmp_path / "chunks")
    stage_stream_chunks(spark, sf_dir, d, n_chunks=4)
    files = [p for p in glob.glob(d + "/part*") if os.path.getsize(p) > 0]
    by_mtime = sorted(files, key=os.path.getmtime)
    assert len(set(round(os.path.getmtime(p), 6) for p in files)) == len(files)
    prev_hi = None
    for p in by_mtime:
        df = spark.read.parquet(p)
        lo, hi = df.agg(F.min("ts"), F.max("ts")).collect()[0]
        if prev_hi is not None and lo is not None:
            assert lo > prev_hi
        if hi is not None:
            prev_hi = hi
