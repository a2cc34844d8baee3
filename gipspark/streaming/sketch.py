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
) -> None:
    """Drive the stream to completion (availableNow), appending one
    partial sketch per micro-batch to ``out_dir``."""

    def _fb(batch_df: DataFrame, batch_id: int) -> None:
        (
            cms_build(batch_df, item_col, d=d, w=w)
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .coalesce(1)  # ≤ d·w rows — one small file per batch
            .write.mode("append")
            .parquet(out_dir)
        )

    q = (
        st.writeStream.foreachBatch(_fb)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def cms_merge_partials(spark: SparkSession, out_dir: str) -> DataFrame:
    """Merge per-batch partial sketches into the final sketch(r, c, cnt)."""
    return (
        spark.read.parquet(out_dir)
        .groupBy("r", "c")
        .agg(F.sum("cnt").alias("cnt"))
    )
