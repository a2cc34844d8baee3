"""Streaming token-ingest meter: windowed learned-BPE token counts.

The tokens/sec gauge every training-data ingest pipeline runs next to
its crawl tail: per event-time window, how many pre-tokens arrived and
how many LEARNED-BPE subword tokens they tokenize into (the committed
merge table, gipspark/functions/bpe.py) — the number that actually
prices downstream training compute. Spark-first shape: the pre-token
explode and the Arrow-vectorized ``bpe_token_count`` UDF are stateless
per-row ops (stream-safe, run inside the micro-batch before the
stateful operator); the only stateful operator is the watermarked
tumbling-window aggregate, whose state evicts with event time. This is
also the registry's standing proof that a pandas UDF composes with a
watermarked streaming aggregation — the pattern a real tokenizer
service needs.

Scale shape: per micro-batch work is explode + one Arrow pass +
partial aggregation; state is one row per open window. At a 10^12-doc
crawl the stream side never touches history — the window store holds
only the watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_token_counts(
    docs_stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    from gipspark.functions.bpe import bpe_token_count
    from gipspark.queries._shared import BPE_PATTERN

    toks = docs_stream.withWatermark(ts_col, watermark).select(
        ts_col,
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), 0)
        ).alias("tok"),
    )
    return (
        toks.groupBy(F.window(ts_col, window).alias("w"))
        .agg(
            F.count("*").cast("long").alias("n_pretokens"),
            F.sum(bpe_token_count(F.col("tok"))).cast("long").alias("n_bpe_tokens"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n_pretokens",
            "n_bpe_tokens",
        )
    )
