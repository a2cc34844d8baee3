"""Custom stateful streaming operator via applyInPandasWithState.

SURVEY.md §2.10 / task brief: "applyInPandasWithState for custom
stateful operators". The operator here is a *visit tracker* with
engine-relevant semantics: per key (user or cell) it maintains
(total_events, total_value, first_ts, last_ts) across micro-batches and
emits one updated row per key per batch — the streaming analogue of the
inventory matrix, with state that outlives any single batch.

State is a GroupState holding a single tuple; idle keys evict via
EVENT-time timeout one hour past their last event (bounded state at
10^12-doc scale — the unbounded alternative OOMs the state store).

Spark 4.1.2 note (found by driving this, BENCH.md method): the
ProcessingTimeTimeout + trigger(availableNow) combination dies with an
internal planner NPE ("SparkPlan.session() is null"); EventTimeTimeout
with a watermark plans and runs fine, and is the semantically better
choice for replayable sources anyway (eviction keyed to data time, not
wall clock).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

VISIT_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("first_us", LongType()),
        StructField("last_us", LongType()),
    ]
)

VISIT_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("first_us", LongType()),
        StructField("last_us", LongType()),
        StructField("batch_rows", LongType()),
    ]
)


def _track(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()  # idle key evicted — emit nothing
        return
    if state.exists:
        n, vsum, first_us, last_us = state.get
    else:
        n, vsum, first_us, last_us = 0, 0.0, None, None
    batch_rows = 0
    for pdf in pdfs:
        batch_rows += len(pdf)
        n += len(pdf)
        vsum += float(pdf["value"].sum())
        ts_us = (pdf["ts"].astype("int64")).to_numpy() // 1000  # ns → µs
        lo, hi = int(ts_us.min()), int(ts_us.max())
        first_us = lo if first_us is None else min(first_us, lo)
        last_us = hi if last_us is None else max(last_us, hi)
    state.update((n, vsum, first_us, last_us))
    if last_us is not None:
        # evict 1h of event time after the key's last activity
        state.setTimeoutTimestamp(last_us // 1000 + 3_600_000)
    yield pd.DataFrame(
        [
            {
                "user_id": user_id,
                "n": n,
                "value_sum": vsum,
                "first_us": first_us,
                "last_us": last_us,
                "batch_rows": batch_rows,
            }
        ]
    )


def visit_tracker(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Running per-user visit state across micro-batches."""
    return (
        stream.withWatermark("ts", watermark)
        .select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _track,
            outputStructType=VISIT_OUT_SCHEMA,
            stateStructType=VISIT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
