"""State-store soak (VERDICT r2 #9): ≥50 micro-batches through each of
the four applyInPandasWithState operators, asserting live state stays
BOUNDED by event-time eviction — the 100×-scale risk for custom
stateful streaming is state that only ever grows.

Fixture: 50 one-file chunks, 6 h apart in event time, each with a
DISJOINT user cohort (keys never recur), so without eviction
numRowsTotal would climb to ~#chunks·cohort; with eviction it must
plateau at the few chunks the operator's timeout keeps live.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from gipspark.streaming.colocation import colocation_stream
from gipspark.streaming.geofence import geofence_stream
from gipspark.streaming.od import od_stream
from gipspark.streaming.stateful import visit_tracker

N_CHUNKS = 50
USERS_PER_CHUNK = 10
CHUNK_SPACING_S = 6 * 3600
BASE_TS = 1_700_000_000  # fixed epoch anchor (no wall-clock dependence)

SQUARE = {
    "poly_id": 7,
    "rings": [[[10.0, 10.0], [10.0, 20.0], [20.0, 20.0], [20.0, 10.0], [10.0, 10.0]]],
}
INSIDE = (15.0, 15.0)
OUTSIDE = (50.0, 50.0)

SCHEMA = "event_id long, ts timestamp, user_id long, lat double, lon double, value double"


def _stage(dirpath: str) -> None:
    os.makedirs(dirpath, exist_ok=True)
    eid = 0
    for i in range(N_CHUNKS):
        t0 = BASE_TS + i * CHUNK_SPACING_S
        rows = {"event_id": [], "ts": [], "user_id": [], "lat": [], "lon": [], "value": []}
        for j in range(USERS_PER_CHUNK):
            uid = i * 1000 + j
            # inside → outside → inside: two geofence transitions per user
            for k, (lat, lon) in enumerate([INSIDE, OUTSIDE, INSIDE]):
                rows["event_id"].append(eid)
                rows["ts"].append((t0 + 60 * k) * 1_000_000)  # µs
                rows["user_id"].append(uid)
                rows["lat"].append(lat)
                rows["lon"].append(lon)
                rows["value"].append(float(j))
                eid += 1
        t = pa.table(
            {
                "event_id": pa.array(rows["event_id"], pa.int64()),
                "ts": pa.array(rows["ts"], pa.timestamp("us")),
                "user_id": pa.array(rows["user_id"], pa.int64()),
                "lat": pa.array(rows["lat"], pa.float64()),
                "lon": pa.array(rows["lon"], pa.float64()),
                "value": pa.array(rows["value"], pa.float64()),
            }
        )
        path = os.path.join(dirpath, f"chunk_{i:03d}.parquet")
        pq.write_table(t, path)
        # strictly increasing mtimes -> oldest-first replay order
        os.utime(path, (1_000_000 + i, 1_000_000 + i))


def _soak(spark, chunk_dir: str, ck_dir: str, build, mode: str):
    st = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(chunk_dir)
    )
    out = build(st)
    q = (
        out.writeStream.outputMode(mode)
        .format("noop")
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sizes = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in q.recentProgress
        if p.get("stateOperators")
    ]
    return sizes


TOTAL_KEYS = N_CHUNKS * USERS_PER_CHUNK  # what no-eviction would approach


CASES = {
    # (builder, bound on max live state rows, sink output mode)
    # visit_tracker evicts 1 h after a key's last event; at 6 h spacing
    # at most ~2 cohorts are ever live
    "visit_tracker": (
        lambda st: visit_tracker(st, watermark="1 hour"),
        4 * USERS_PER_CHUNK,
        "update",
    ),
    # geofence state evicts 24 h after last activity -> ≤ ~5 cohorts of
    # (user, fence) keys live (one fence)
    "geofence": (
        lambda st: geofence_stream(st, [SQUARE], watermark="1 hour"),
        8 * USERS_PER_CHUNK,
        "append",
    ),
    # colocation keys are (cell, 6 h bucket): 2 cells/chunk, evicted at
    # slot end once the watermark passes
    "colocation": (
        lambda st: colocation_stream(st, watermark="1 hour"),
        12,
        "append",
    ),
    # od keys are (user, day): 4 cohorts/day, emitted+evicted when the
    # watermark passes the day end -> ≤ ~2 days of keys
    "od": (
        lambda st: od_stream(st, watermark="1 hour"),
        12 * USERS_PER_CHUNK,
        "append",
    ),
}


@pytest.fixture(scope="module")
def chunk_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("soak_chunks"))
    _stage(d)
    return d


@pytest.mark.parametrize("name", sorted(CASES))
def test_state_bounded_over_50_batches(spark, chunk_dir, tmp_path, name):
    build, bound, mode = CASES[name]
    sizes = _soak(spark, chunk_dir, str(tmp_path / f"ck_{name}"), build, mode)
    assert len(sizes) >= N_CHUNKS, f"only {len(sizes)} micro-batches with state metrics"
    peak = max(sizes)
    assert peak > 0, "operator kept no state at all — soak not exercising it"
    assert peak <= bound, (
        f"{name}: state peaked at {peak} rows (bound {bound}); "
        f"eviction is not keeping up — would grow to ~{TOTAL_KEYS} at scale"
    )
    # eviction really happened: the end state is far below the total
    # key population the run pushed through
    assert sizes[-1] < TOTAL_KEYS // 4


# ---------------------------------------------------------------------------
# round-4 soaks (VERDICT r3 next-round #8): stream-stream attribution
# state bound + streaming CMS crash/restart exactness
# ---------------------------------------------------------------------------


def test_attribution_state_bounded_over_50_batches(spark, chunk_dir, tmp_path):
    """Stream-stream join state must plateau: with a 1 h watermark and a
    2 h horizon, only ~1–2 of the 6 h-spaced cohorts are ever buffered;
    without the horizon-derived eviction both sides would retain all
    ~1,500 rows."""
    from gipspark.streaming.events import stream_stream_attribution

    st = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(chunk_dir)
    )
    out = stream_stream_attribution(
        st.filter(F.col("event_id") % 2 == 0),
        st.filter(F.col("event_id") % 2 == 1),
        horizon="2 hours",
        watermark="1 hour",
    )
    q = (
        out.writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", str(tmp_path / "ck_attr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sizes = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in q.recentProgress
        if p.get("stateOperators")
    ]
    assert len(sizes) >= N_CHUNKS
    total_rows = N_CHUNKS * USERS_PER_CHUNK * 3
    peak = max(sizes)
    assert peak > 0
    assert peak <= 6 * USERS_PER_CHUNK * 3, (
        f"join state peaked at {peak} buffered rows; horizon eviction is "
        f"not keeping up — would grow toward ~{total_rows} at scale"
    )
    assert sizes[-1] < total_rows // 4


def test_cms_crash_replay_restart_is_exact(spark, chunk_dir, tmp_path):
    """Kill the CMS stream in the worst window (partial written, offset
    uncommitted), restart from the same checkpoint, and require the
    merged sketch to equal the batch sketch BIT-EXACTLY — the replayed
    batch must not double-count."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from gipspark.operators.sketch import cms_build
    from gipspark.streaming.sketch import cms_merge_partials, run_cms_stream

    out = str(tmp_path / "cms_out")
    ck = str(tmp_path / "cms_ck")

    def _stream():
        return (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(chunk_dir)
        )

    with pytest.raises(StreamingQueryException, match="injected crash"):
        run_cms_stream(_stream(), "user_id", out, ck, d=3, w=256, fail_after_batch=10)
    # restart: the uncommitted batch replays, then the rest drains
    run_cms_stream(_stream(), "user_id", out, ck, d=3, w=256)

    parts = spark.read.parquet(out)
    b10 = parts.filter(F.col("batch_id") == 10)
    assert b10.count() == 2 * b10.select("r", "c").distinct().count(), (
        "crash injection did not produce a replayed (duplicated) partial — "
        "the test is not exercising the at-least-once window"
    )
    merged = {(r.r, r.c): r.cnt for r in cms_merge_partials(spark, out).collect()}
    ev = spark.read.parquet(chunk_dir)
    batch = {(r.r, r.c): r.cnt for r in cms_build(ev, "user_id", d=3, w=256).collect()}
    assert merged == batch
