"""Snapshot log: time travel, incremental reads, atomic publish, and
the composition with incremental dedup (delta docs only)."""

import json
import os

import pytest

from gipspark.sources.snapshots import (
    commit_snapshot,
    current_snapshot_id,
    read_incremental,
    read_snapshot,
)


def _docs(spark, ids):
    return spark.createDataFrame([(i, f"text {i}") for i in ids], "doc_id long, text string")


def test_time_travel_reads_exact_history(spark, tmp_path):
    t = str(tmp_path / "tbl")
    s1 = commit_snapshot(_docs(spark, [1, 2]), t)
    s2 = commit_snapshot(_docs(spark, [3]), t, operation="append")
    s3 = commit_snapshot(_docs(spark, [9]), t, operation="overwrite")
    assert (s1, s2, s3) == (1, 2, 3)
    assert current_snapshot_id(t) == 3
    assert {r.doc_id for r in read_snapshot(spark, t, 1).collect()} == {1, 2}
    assert {r.doc_id for r in read_snapshot(spark, t, 2).collect()} == {1, 2, 3}
    assert {r.doc_id for r in read_snapshot(spark, t).collect()} == {9}


def test_incremental_reads_exact_delta(spark, tmp_path):
    t = str(tmp_path / "tbl")
    commit_snapshot(_docs(spark, [1, 2]), t)
    commit_snapshot(_docs(spark, [3, 4]), t, operation="append")
    commit_snapshot(_docs(spark, [5]), t, operation="append")
    assert {r.doc_id for r in read_incremental(spark, t, 1).collect()} == {3, 4, 5}
    assert {r.doc_id for r in read_incremental(spark, t, 1, 2).collect()} == {3, 4}
    assert read_incremental(spark, t, 3).count() == 0


def test_incremental_refuses_to_cross_overwrite(spark, tmp_path):
    t = str(tmp_path / "tbl")
    commit_snapshot(_docs(spark, [1]), t)
    commit_snapshot(_docs(spark, [2]), t, operation="overwrite")
    with pytest.raises(ValueError, match="non-append"):
        read_incremental(spark, t, 1)


def test_torn_commit_is_invisible(spark, tmp_path):
    # a crash AFTER data files but BEFORE the manifest rename must leave
    # the table at the parent snapshot — simulate by writing data with
    # no manifest/current update
    t = str(tmp_path / "tbl")
    commit_snapshot(_docs(spark, [1]), t)
    orphan = os.path.join(t, "data", "snap-9999-orphan")
    _docs(spark, [99]).write.parquet(orphan)
    assert current_snapshot_id(t) == 1
    assert {r.doc_id for r in read_snapshot(spark, t).collect()} == {1}
    # manifests only ever list fully-written files
    m = json.load(open(os.path.join(t, "manifests", "snap-000000000001.json")))
    assert all(os.path.exists(f) for f in m["files"])


def test_composes_with_incremental_dedup(spark, tmp_path):
    # the changelog read is the input contract of incremental_neardup:
    # only the delta snapshot's docs are hashed
    from gipspark.operators.dedup import incremental_neardup, minhash_index

    t = str(tmp_path / "tbl")
    commit_snapshot(
        spark.createDataFrame(
            [(0, "the quick brown fox jumps over the lazy dog")], "doc_id long, text string"
        ),
        t,
    )
    commit_snapshot(
        spark.createDataFrame(
            [
                (10, "the quick brown fox jumps over the lazy cat"),
                (11, "completely different content here"),
            ],
            "doc_id long, text string",
        ),
        t,
        operation="append",
    )
    old_index = minhash_index(read_snapshot(spark, t, 1), n_hashes=8, bands=4, shingle_n=2)
    new_docs = read_incremental(spark, t, 1)
    out = {
        r.doc_id: r.keep
        for r in incremental_neardup(
            new_docs, old_index, n_hashes=8, bands=4, shingle_n=2
        ).collect()
    }
    assert out == {10: False, 11: True}


def test_compaction_preserves_rows_and_shrinks_files(spark, tmp_path):
    from gipspark.sources.snapshots import compact_snapshots, _load_manifest

    t = str(tmp_path / "tbl")
    for batch in ([1, 2], [3], [4, 5], [6]):
        commit_snapshot(_docs(spark, batch).repartition(4), t, operation="append")
    before = _load_manifest(t, current_snapshot_id(t))
    sid = compact_snapshots(spark, t, target_files=2)
    after = _load_manifest(t, sid)
    assert len(after["files"]) < len(before["files"])
    assert {r.doc_id for r in read_snapshot(spark, t).collect()} == {1, 2, 3, 4, 5, 6}
    # time travel to the pre-compaction snapshot still works
    assert {r.doc_id for r in read_snapshot(spark, t, sid - 1).collect()} == {1, 2, 3, 4, 5, 6}
