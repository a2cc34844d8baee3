"""Streaming incremental near-dup dedup: new crawl docs arrive as a
stream and are checked against the EXISTING corpus's persisted MinHash
band index (operators/dedup.minhash_index written to parquet) — the
streaming twin of operators/dedup.incremental_neardup.

Spark-first shape: signature + banding are deterministic Column ops
(stream-safe); the band match is a STREAM–STATIC equi-join, which
Structured Streaming executes statelessly (the static side is the
index); the lane-agreement verify is a per-row filter; the only
stateful operator is dropDuplicatesWithinWatermark on (new_id, old_id),
whose state evicts with the event-time watermark. At 10^12 stored docs
the stream side only ever shuffles its own micro-batch bands against
the index partitions — old text is never read, old signatures never
recomputed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gipspark.operators.dedup import incremental_neardup_pairs, minhash_index


def incremental_neardup_stream(
    new_docs: DataFrame,
    old_index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 2,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming (new_id, old_id, ts) verified near-dup verdicts.

    Emits one row per (new doc, stored doc) verified pair — the
    keep/drop rollup composes downstream (batch incremental_neardup
    does it with one aggregate); emitting pairs keeps the streaming
    query to a single stateful operator.
    """
    idx = minhash_index(
        new_docs.withWatermark(ts_col, watermark),
        text_col,
        id_col,
        n_hashes,
        bands,
        shingle_n,
        carry=(ts_col,),
    )
    pairs = incremental_neardup_pairs(idx, old_index, n_hashes)
    return pairs.dropDuplicatesWithinWatermark(["new_id", "old_id"])
