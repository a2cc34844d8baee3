"""Streaming origin–destination tracking (the incremental twin of the
od_matrix_daily registry query).

State is keyed by (user, day) and carries the argmin/argmax-by-time
fixes seen so far — first cell = origin, last cell = destination. Each
micro-batch folds its rows into the state (commutative min/max on the
(ts, event_id) order key, so any arrival order within the day gives
the same result); the finished (user, day) row is emitted exactly once
when the event-time watermark passes the day boundary, which is also
when state evicts — live state is bounded by active (user, day) keys,
not history.

The last open day never emits (nothing advances the watermark past
it) — standard append-mode semantics, same as windowed_counts; tests
assert emitted days match the batch first/last exactly and that the
open tail is withheld.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OD_OUT_SCHEMA = "user_id long, day_s long, origin int, dest int"
# (first_us, first_eid, origin, last_us, last_eid, dest)
OD_STATE_SCHEMA = (
    "first_us long, first_eid long, origin int, last_us long, last_eid long, dest int"
)

_DAY_MS = 86_400_000


def _track_od(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    user_id, day_s = key
    if state.hasTimedOut:
        f_us, f_eid, origin, l_us, l_eid, dest = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": pd.array([int(user_id)], dtype="int64"),
                "day_s": pd.array([int(day_s)], dtype="int64"),
                "origin": pd.array([int(origin)], dtype="int32"),
                "dest": pd.array([int(dest)], dtype="int32"),
            }
        )
        return
    pdf = pd.concat(list(pdfs), ignore_index=True)
    ts_us = pdf["ts"].astype("int64") // 1000  # ns → µs
    eid = pdf["event_id"].astype("int64")
    cell = pdf["cell"].astype("int64")
    order = pd.DataFrame({"us": ts_us, "eid": eid, "cell": cell}).sort_values(
        ["us", "eid"], kind="mergesort"
    )
    b_first = order.iloc[0]
    b_last = order.iloc[-1]
    if state.exists:
        f_us, f_eid, origin, l_us, l_eid, dest = state.get
        if (int(b_first.us), int(b_first.eid)) < (f_us, f_eid):
            f_us, f_eid, origin = int(b_first.us), int(b_first.eid), int(b_first.cell)
        if (int(b_last.us), int(b_last.eid)) > (l_us, l_eid):
            l_us, l_eid, dest = int(b_last.us), int(b_last.eid), int(b_last.cell)
    else:
        f_us, f_eid, origin = int(b_first.us), int(b_first.eid), int(b_first.cell)
        l_us, l_eid, dest = int(b_last.us), int(b_last.eid), int(b_last.cell)
    state.update((f_us, f_eid, origin, l_us, l_eid, dest))
    # emit (and evict) once the watermark passes the end of the day
    state.setTimeoutTimestamp(int(day_s) * 1000 + _DAY_MS)


def od_stream(
    events: DataFrame,
    *,
    id_col: str = "user_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    ts_col: str = "ts",
    grid_deg: float = 10.0,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming events → one (user_id, day_s, origin, dest) row per
    closed (user, day); quantization textually matches
    queries.od_matrix_daily."""
    cell = (
        F.floor((F.col(lon_col) + F.lit(180.0)) / F.lit(grid_deg)).cast("int") * 100
        + F.floor((F.lit(90.0) - F.col(lat_col)) / F.lit(grid_deg)).cast("int")
    ).alias("cell")
    day_s = (F.unix_timestamp(F.col(ts_col).cast("date").cast("timestamp"))).cast("long").alias(
        "day_s"
    )
    occ = events.withWatermark(ts_col, watermark).select(
        F.col(id_col).alias("user_id"),
        day_s,
        F.col("event_id"),
        cell,
        F.col(ts_col).alias("ts"),
    )
    return occ.groupBy("user_id", "day_s").applyInPandasWithState(
        _track_od,
        outputStructType=OD_OUT_SCHEMA,
        stateStructType=OD_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
