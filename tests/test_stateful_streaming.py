"""applyInPandasWithState visit tracker: state accumulates across
micro-batches and the final emission equals the batch aggregate."""

from pyspark.sql import functions as F

from gipspark.streaming import events as sev
from gipspark.streaming.stateful import visit_tracker


def test_visit_tracker_accumulates_across_batches(spark, sf_dir, tmp_path):
    chunks = str(tmp_path / "chunks")
    sev.stage_stream_chunks(spark, sf_dir, chunks, n_chunks=4)
    st = sev.read_events_stream(spark, chunks)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    # chunks interleave timestamps (event_id % 4), so a tight watermark
    # would legitimately drop "late" chunks; use a huge one to assert
    # exact accumulation (watermark semantics themselves are covered by
    # test_streaming.py)
    tracked = visit_tracker(st, watermark="3650 days")
    sev.run_to_table(tracked, out, ck, mode="update")

    res = spark.read.parquet(out)
    # last emission per user = final accumulated state
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n").desc())
    final = (
        res.withColumn("rk", F.row_number().over(w)).filter("rk = 1").select("user_id", "n", "value_sum")
    )
    want = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("value_sum"))
    )
    got = {r.user_id: (r.n, round(r.value_sum, 6)) for r in final.collect()}
    exp = {r.user_id: (r.n, round(r.value_sum, 6)) for r in want.collect()}
    assert got == exp
    # state really did span batches: some user must have been emitted
    # more than once with growing counts
    multi = res.groupBy("user_id").count().filter("count > 1").count()
    assert multi > 0
