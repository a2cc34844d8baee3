"""Streaming CMS == batch CMS (6th stream==batch parity family).

The CMS is linear, so per-batch partial sketches merged by sum must
equal the one-shot batch sketch bit-exactly — no watermark subsetting,
the strongest parity statement of the streaming families. Also checks
the downstream contract: point estimates from the merged sketch equal
the batch ones, and every estimate upper-bounds the true count.
"""

from pyspark.sql import functions as F

from gipspark.operators.sketch import cms_build, cms_estimate
from gipspark.streaming import events as sev
from gipspark.streaming.sketch import cms_merge_partials, run_cms_stream

D, W = 3, 256


def test_stream_cms_equals_batch(spark, sf_dir, tmp_path):
    chunks = str(tmp_path / "chunks")
    sev.stage_stream_chunks(spark, sf_dir, chunks, 3)
    st = sev.read_events_stream(spark, chunks)
    out = str(tmp_path / "cms_out")
    ck = str(tmp_path / "cms_ck")
    run_cms_stream(st, "user_id", out, ck, d=D, w=W)

    # more than one partial actually merged (it was a real stream)
    n_batches = spark.read.parquet(out).select("batch_id").distinct().count()
    assert n_batches >= 2

    merged = {
        (r.r, r.c): r.cnt for r in cms_merge_partials(spark, out).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch = {(r.r, r.c): r.cnt for r in cms_build(ev, "user_id", d=D, w=W).collect()}
    assert merged == batch  # bit-exact: CMS is linear

    # downstream estimates agree, and CMS never underestimates
    items = ev.select("user_id").distinct().limit(50)
    got = {
        r.item: r.est
        for r in cms_estimate(
            cms_merge_partials(spark, out), items, "user_id", d=D, w=W
        ).collect()
    }
    want = {
        r.item: r.est
        for r in cms_estimate(
            cms_build(ev, "user_id", d=D, w=W), items, "user_id", d=D, w=W
        ).collect()
    }
    assert got == want
    true = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    for item, est in got.items():
        assert est >= true[item]
