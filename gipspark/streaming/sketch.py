"""Streaming count-min sketch: per-micro-batch partial sketches merged
additively (the 6th stream==batch parity family).

The CMS is a linear sketch — cell counts are plain sums — so the
streaming twin needs NO custom state: each micro-batch builds its own
partial d×w sketch (operators/sketch.cms_build on the batch slice) and
appends it; the final sketch is one groupBy(r, c) sum over the
partials. With availableNow triggers every row is seen exactly once,
so the merged stream sketch equals the batch sketch BIT-EXACTLY — the
strongest parity of the six families (no watermark subsetting).

This is precisely how a 100 TB streaming frequency monitor works:
executors fold rows into bounded partial summaries (≤ d·w rows per
batch, whatever the item domain), and only summaries ever move. The
merge is associative and commutative, so partials can also roll up
across days/sites the way hll_pyramid_contract rolls up HLLs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gipspark.operators.sketch import cms_build


def run_cms_stream(
    st: DataFrame,
    item_col: str,
    out_dir: str,
    ck_dir: str,
    d: int = 3,
    w: int = 1024,
    fail_after_batch: int | None = None,
) -> None:
    """Drive the stream to completion (availableNow), appending one
    partial sketch per micro-batch to ``out_dir``.

    ``fail_after_batch`` is the soak tests' crash injection: raise
    AFTER batch N's partial is written but BEFORE its offset commits —
    the worst-case crash window, in which a restart replays the batch
    and appends its partial a second time. cms_merge_partials below is
    replay-idempotent, so the merged sketch is still exact."""

    def _fb(batch_df: DataFrame, batch_id: int) -> None:
        (
            cms_build(batch_df, item_col, d=d, w=w)
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .coalesce(1)  # ≤ d·w rows — one small file per batch
            .write.mode("append")
            .parquet(out_dir)
        )
        if fail_after_batch is not None and batch_id == fail_after_batch:
            raise RuntimeError(f"injected crash after batch {batch_id}")

    q = (
        st.writeStream.foreachBatch(_fb)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def cms_merge_partials(spark: SparkSession, out_dir: str) -> DataFrame:
    """Merge per-batch partial sketches into the final sketch(r, c, cnt).

    Replay-idempotent (exactly-once despite an at-least-once sink): a
    crash between the foreachBatch append and the offset commit makes
    the restart replay that batch — with availableNow the batch's file
    set is pinned in the offset WAL before processing, so the replayed
    partial is IDENTICAL, and collapsing per (batch_id, r, c) with max
    (≡ any) before the additive merge removes the duplicate without
    touching genuine per-batch partials."""
    return (
        spark.read.parquet(out_dir)
        .groupBy("batch_id", "r", "c")
        .agg(F.max("cnt").alias("cnt"))
        .groupBy("r", "c")
        .agg(F.sum("cnt").alias("cnt"))
    )
