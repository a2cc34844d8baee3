"""Streaming incremental near-dup == batch pair set (5th stream==batch
parity family): new docs replayed as micro-batches against a persisted
band index; the stream must emit exactly the batch's verified pairs,
and the plan must never touch old text (the index is the only static
source)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from gipspark.operators.dedup import incremental_neardup_pairs, minhash_index
from gipspark.streaming.dedup import incremental_neardup_stream

N_HASHES, BANDS, SHINGLE_N = 8, 4, 2

OLD = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "completely unrelated text about spark shuffle partitions and joins"),
    (2, "another very different document mentioning tiles cells and joins today"),
]
NEW = [
    (100, "the quick brown fox jumps over the lazy cat near the river bank", 0),
    (101, "completely unrelated text about spark shuffle partitions and joins", 1),
    (102, "entirely novel prose with no counterpart in the existing corpus at all", 2),
    (103, "the quick brown fox jumps over the lazy dog near the river bend", 3),
]
BASE_TS = 1_700_000_000


def _stage_new(dirpath: str) -> None:
    os.makedirs(dirpath, exist_ok=True)
    for i, (doc_id, text, chunk) in enumerate(NEW):
        t = pa.table(
            {
                "doc_id": pa.array([doc_id], pa.int64()),
                "text": pa.array([text], pa.string()),
                "ts": pa.array([(BASE_TS + chunk * 60) * 1_000_000], pa.timestamp("us")),
            }
        )
        path = os.path.join(dirpath, f"chunk_{i:02d}.parquet")
        pq.write_table(t, path)
        os.utime(path, (1_000_000 + i, 1_000_000 + i))


def test_stream_pairs_equal_batch(spark, tmp_path):
    idx_path = str(tmp_path / "old_index.parquet")
    old_df = spark.createDataFrame(OLD, "doc_id long, text string")
    minhash_index(old_df, n_hashes=N_HASHES, bands=BANDS, shingle_n=SHINGLE_N).write.parquet(
        idx_path
    )
    old_index = spark.read.parquet(idx_path)

    chunks = str(tmp_path / "chunks")
    _stage_new(chunks)
    st = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(chunks)
    )
    out = incremental_neardup_stream(
        st, old_index, n_hashes=N_HASHES, bands=BANDS, shingle_n=SHINGLE_N
    )
    out_dir = str(tmp_path / "out")
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.new_id, r.old_id) for r in spark.read.parquet(out_dir).collect()
    }

    batch_pairs = {
        (r.new_id, r.old_id)
        for r in incremental_neardup_pairs(
            minhash_index(
                spark.createDataFrame(
                    [(d, t) for d, t, _ in NEW], "doc_id long, text string"
                ),
                n_hashes=N_HASHES,
                bands=BANDS,
                shingle_n=SHINGLE_N,
            ),
            old_index,
            N_HASHES,
        )
        .select("new_id", "old_id")
        .distinct()
        .collect()
    }
    assert got == batch_pairs
    assert (100, 0) in got and (101, 1) in got  # the planted near/exact dups
    assert not any(nid == 102 for nid, _ in got)  # fresh doc stays clean


def test_stream_resumes_from_checkpoint(spark, tmp_path):
    # run 1 sees only the first two chunks; run 2 restarts from the SAME
    # checkpoint after two more chunks land and must process ONLY them —
    # the operational resume contract of a long-lived dedup stream
    idx_path = str(tmp_path / "old_index.parquet")
    minhash_index(
        spark.createDataFrame(OLD, "doc_id long, text string"),
        n_hashes=N_HASHES,
        bands=BANDS,
        shingle_n=SHINGLE_N,
    ).write.parquet(idx_path)
    old_index = spark.read.parquet(idx_path)

    chunks = str(tmp_path / "chunks")
    os.makedirs(chunks, exist_ok=True)
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def write_chunk(i, doc_id, text):
        t = pa.table(
            {
                "doc_id": pa.array([doc_id], pa.int64()),
                "text": pa.array([text], pa.string()),
                "ts": pa.array([(BASE_TS + i * 60) * 1_000_000], pa.timestamp("us")),
            }
        )
        path = os.path.join(chunks, f"chunk_{i:02d}.parquet")
        pq.write_table(t, path)
        os.utime(path, (1_000_000 + i, 1_000_000 + i))

    def drain():
        st = (
            spark.readStream.schema("doc_id long, text string, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(chunks)
        )
        q = (
            incremental_neardup_stream(
                st, old_index, n_hashes=N_HASHES, bands=BANDS, shingle_n=SHINGLE_N
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q.recentProgress

    for i, (d, t, _) in enumerate(NEW[:2]):
        write_chunk(i, d, t)
    drain()
    first = {(r.new_id, r.old_id) for r in spark.read.parquet(out_dir).collect()}

    for i, (d, t, _) in enumerate(NEW[2:], start=2):
        write_chunk(i, d, t)
    progress2 = drain()
    # resume really skipped the old files: run 2 saw only the delta rows
    rows_run2 = sum(p["numInputRows"] for p in progress2)
    assert rows_run2 == len(NEW) - 2
    final = {(r.new_id, r.old_id) for r in spark.read.parquet(out_dir).collect()}
    assert first <= final
    assert final == {(100, 0), (101, 1), (103, 0)}
