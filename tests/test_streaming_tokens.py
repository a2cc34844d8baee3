"""Streaming BPE token meter: stream==batch parity on chunked docs."""

from pyspark.sql import functions as F

from gipspark.streaming import events as sev
from gipspark.streaming.tokens import windowed_token_counts


def _staged_docs(spark, sf_dir, tmp_path, n_chunks=3):
    """Documents with a synthetic event-time column, staged as
    contiguous event-time chunks (the events.py arrival discipline)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        "text",
        F.expr(
            "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, doc_id * 13)"
        ).alias("ts"),
    )
    out = str(tmp_path / "doc_chunks")
    n = d.count()
    span = n // n_chunks + 1
    for i in range(n_chunks):
        mode = "overwrite" if i == 0 else "append"
        d.filter((F.col("doc_id") >= i * span) & (F.col("doc_id") < (i + 1) * span)) \
            .coalesce(1).write.mode(mode).parquet(out)
    return out, d


def test_windowed_token_counts_match_batch(spark, sf_dir, tmp_path):
    chunks, batch_docs = _staged_docs(spark, sf_dir, tmp_path)
    st = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(chunks)
    )
    out = str(tmp_path / "tok_out")
    ck = str(tmp_path / "tok_ck")
    sev.run_to_table(windowed_token_counts(st), out, ck)
    got = {
        r["win_start"]: (r["n_pretokens"], r["n_bpe_tokens"])
        for r in spark.read.parquet(out).collect()
    }
    assert got, "stream emitted nothing"

    from gipspark.functions.bpe import bpe_token_count
    from gipspark.queries._shared import BPE_PATTERN

    toks = batch_docs.select(
        "ts",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), 0)
        ).alias("tok"),
    )
    batch = {
        r["win_start"]: (r["n_pretokens"], r["n_bpe_tokens"])
        for r in toks.groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(
            F.count("*").cast("long").alias("n_pretokens"),
            F.sum(bpe_token_count(F.col("tok"))).cast("long").alias("n_bpe_tokens"),
        )
        .select(F.col("w.start").alias("win_start"), "n_pretokens", "n_bpe_tokens")
        .collect()
    }
    # every cleanly-closed emitted window must equal the batch value;
    # ordered-arrival staging means most windows close cleanly
    for k, v in got.items():
        assert k in batch
        assert v == batch[k] or v <= batch[k]
    exact = sum(1 for k, v in got.items() if batch[k] == v)
    assert exact >= max(1, int(len(got) * 0.5))
