"""Snapshot log over parquet directories — the Iceberg core mechanics
(snapshot isolation, time travel, incremental reads) on the sandbox's
parquet surrogate.

The north_rule targets Iceberg tables with snapshot lineage; the
runtime jar is absent here (SURVEY §10), so this module implements the
part of Iceberg the ENGINE actually depends on, file-format-agnostic:

- every commit writes its data files under an immutable per-snapshot
  directory, then publishes a JSON manifest (file list + parent id +
  operation) with an atomic rename — readers never observe a partial
  commit;
- ``read_snapshot`` reads any historical snapshot by id (time travel);
- ``read_incremental`` reads exactly the files ADDED between two
  snapshots — the input contract of incremental_neardup / crawl diff
  (process only the new crawl's files, never rescan the corpus);
- snapshot ids are parent+1 (no wall clock anywhere: replays and tests
  stay deterministic).

On a real Iceberg catalog the same call sites map to
``spark.table(name)``, ``VERSION AS OF`` and the changelog read —
sources/catalog.py documents the configuration-only swap.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "manifests"
_DATA_DIR = "data"
_CURRENT = "current.json"


def _manifest_path(table_dir: str, snapshot_id: int) -> str:
    return os.path.join(table_dir, _MANIFEST_DIR, f"snap-{snapshot_id:012d}.json")


def current_snapshot_id(table_dir: str) -> int | None:
    cur = os.path.join(table_dir, _CURRENT)
    if not os.path.exists(cur):
        return None
    with open(cur) as f:
        return int(json.load(f)["snapshot_id"])


def _load_manifest(table_dir: str, snapshot_id: int) -> dict:
    with open(_manifest_path(table_dir, snapshot_id)) as f:
        return json.load(f)


def commit_snapshot(df: DataFrame, table_dir: str, operation: str = "append") -> int:
    """Write ``df`` as a new snapshot; returns the new snapshot id.

    ``operation``: "append" (new files add to the parent's) or
    "overwrite" (new files replace the table contents). The manifest
    and the current pointer are published with atomic renames AFTER the
    data files are fully written — a reader (or a crashed retry) sees
    either the parent snapshot or the complete child, never a torn one.
    """
    if operation not in ("append", "overwrite"):
        raise ValueError(f"unknown operation {operation!r}")
    os.makedirs(os.path.join(table_dir, _MANIFEST_DIR), exist_ok=True)
    parent = current_snapshot_id(table_dir)
    snapshot_id = 1 if parent is None else parent + 1
    data_dir = os.path.join(table_dir, _DATA_DIR, f"snap-{snapshot_id:012d}-{uuid.uuid4().hex[:8]}")
    df.write.mode("overwrite").parquet(data_dir)
    new_files = sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    if operation == "append" and parent is not None:
        files = _load_manifest(table_dir, parent)["files"] + new_files
    else:
        files = new_files
    manifest = {
        "snapshot_id": snapshot_id,
        "parent_id": parent,
        "operation": operation,
        "files": files,
        "added_files": new_files,
    }
    tmp = _manifest_path(table_dir, snapshot_id) + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.rename(tmp, _manifest_path(table_dir, snapshot_id))
    cur_tmp = os.path.join(table_dir, _CURRENT + f".tmp-{uuid.uuid4().hex[:8]}")
    with open(cur_tmp, "w") as f:
        json.dump({"snapshot_id": snapshot_id}, f)
    os.rename(cur_tmp, os.path.join(table_dir, _CURRENT))
    return snapshot_id


def read_snapshot(
    spark: SparkSession, table_dir: str, snapshot_id: int | None = None
) -> DataFrame:
    """Time travel: the table exactly as of ``snapshot_id`` (default:
    current). Maps to Iceberg ``VERSION AS OF``."""
    sid = snapshot_id if snapshot_id is not None else current_snapshot_id(table_dir)
    if sid is None:
        raise FileNotFoundError(f"no snapshots at {table_dir}")
    files = _load_manifest(table_dir, sid)["files"]
    if not files:
        raise FileNotFoundError(f"snapshot {sid} at {table_dir} has no files")
    return spark.read.parquet(*files)


def read_incremental(
    spark: SparkSession, table_dir: str, from_id: int, to_id: int | None = None
) -> DataFrame:
    """Exactly the rows ADDED by snapshots (from_id, to_id] — the
    changelog read incremental dedup consumes. Raises if the range
    crosses an overwrite (an overwrite invalidates append lineage, as
    Iceberg's incremental scan does)."""
    sid = to_id if to_id is not None else current_snapshot_id(table_dir)
    if sid is None or sid < from_id:
        raise ValueError(f"bad incremental range ({from_id}, {to_id}] at {table_dir}")
    added: list[str] = []
    cur = sid
    while cur > from_id:
        m = _load_manifest(table_dir, cur)
        if m["operation"] != "append":
            raise ValueError(
                f"snapshot {cur} is {m['operation']!r}; incremental reads cannot "
                "cross a non-append snapshot"
            )
        added = m["added_files"] + added
        cur = m["parent_id"]
        if cur is None:
            raise ValueError(f"range start {from_id} predates table history")
    if not added:
        return read_snapshot(spark, table_dir, sid).limit(0)
    return spark.read.parquet(*added)


def compact_snapshots(
    spark: SparkSession, table_dir: str, target_files: int = 4
) -> int:
    """Small-files compaction: rewrite the CURRENT snapshot's contents
    into ``target_files`` files and commit the result as an overwrite
    snapshot. Readers pinned to older ids keep working (their files are
    immutable); the new current reads the same rows from fewer files —
    the lake-maintenance op that keeps 10^12-row tables scannable after
    many small appends. Returns the new snapshot id."""
    cur = read_snapshot(spark, table_dir)
    return commit_snapshot(cur.coalesce(target_files), table_dir, operation="overwrite")
