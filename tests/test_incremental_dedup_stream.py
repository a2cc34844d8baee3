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
