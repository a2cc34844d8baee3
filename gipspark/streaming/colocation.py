"""Streaming spatio-temporal contact join (the incremental twin of
operators/colocation.py).

State is keyed by the (cell, bucket) slot and holds the ids already
seen there; each micro-batch emits exactly the NEW pairs — (new ×
already-seen) ∪ (new × new) — so the union of emissions over any
arrival order equals the batch pair set per slot, and per-pair slot
counts match ``colocation_pairs`` exactly (ids are deduped per slot on
both paths). State evicts via event-time timeout once the watermark
passes the slot's bucket end: slot state is bounded by live-bucket
occupancy, not by history.

Scale shape: the only shuffle is the groupBy on (cell, bucket) — the
same key the batch self-join shuffles on; per-slot emission is
quadratic in slot occupancy exactly like the batch operator's
candidate output (that is the operator's semantics, not a plan
artifact). A megacity slot concentrates one state key; shrinking
bucket_sec or grid_deg splits it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

COLOC_OUT_SCHEMA = "id_a long, id_b long, cell int, bucket long"
COLOC_STATE_SCHEMA = "seen array<long>"


def _slot_pairs(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    cell, bucket = key
    if state.hasTimedOut:
        state.remove()
        return
    pdf = pd.concat(list(pdfs), ignore_index=True)
    seen: list[int] = list(state.get[0]) if state.exists else []
    seen_set = set(seen)
    new = sorted({int(i) for i in pdf["id"]} - seen_set)
    out_a: list[int] = []
    out_b: list[int] = []
    for j, n in enumerate(new):
        for s in seen:
            a, b = (s, n) if s < n else (n, s)
            out_a.append(a)
            out_b.append(b)
        for m in new[:j]:  # new × new, m < n by sort order
            out_a.append(m)
            out_b.append(n)
    state.update((seen + new,))
    # evict once the watermark passes the slot's end (ms epoch)
    state.setTimeoutTimestamp(int(bucket + 1) * 21600 * 1000)
    if out_a:
        yield pd.DataFrame(
            {
                "id_a": pd.array(out_a, dtype="int64"),
                "id_b": pd.array(out_b, dtype="int64"),
                "cell": pd.array([int(cell)] * len(out_a), dtype="int32"),
                "bucket": pd.array([int(bucket)] * len(out_a), dtype="int64"),
            }
        )


def colocation_stream(
    events: DataFrame,
    *,
    id_col: str = "user_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    ts_col: str = "ts",
    grid_deg: float = 10.0,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming events → (id_a, id_b, cell, bucket) contact rows.

    Quantization is textually identical to the batch operator
    (operators/colocation.py), so grouping the emitted rows by pair and
    counting distinct slots reproduces ``colocation_pairs`` bit-exactly
    under any time-ordered replay. bucket_sec is fixed at 21600 (the
    timeout math above bakes it); parameterize both together if needed.
    """
    cell = (
        F.floor((F.col(lon_col) + F.lit(180.0)) / F.lit(grid_deg)).cast("int") * 100
        + F.floor((F.lit(90.0) - F.col(lat_col)) / F.lit(grid_deg)).cast("int")
    ).alias("cell")
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(21600)).cast("long").alias("bucket")
    )
    occ = events.withWatermark(ts_col, watermark).select(
        F.col(id_col).alias("id"), cell, bucket, F.col(ts_col)
    )
    return occ.groupBy("cell", "bucket").applyInPandasWithState(
        _slot_pairs,
        outputStructType=COLOC_OUT_SCHEMA,
        stateStructType=COLOC_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
