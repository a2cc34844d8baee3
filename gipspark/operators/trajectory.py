"""Polyline simplification over per-entity trajectories (ST_Simplify).

The geospatial engines this rebuild mirrors all ship Douglas-Peucker
polyline simplification (PostGIS ``ST_Simplify``, the GIPS trajectory
tooling per SURVEY.md §1) — keep the endpoints, recursively keep the
vertex farthest from the current chord while that distance exceeds a
tolerance. Spark has no built-in, so this is the documented custom-op
path (SURVEY.md §2.6): ``applyInPandas`` per entity.

Scale shape at 10^12 rows: the only shuffle is the groupBy on the
entity key — exactly the partitioning every other per-user op here
already uses. Each group is one user's trajectory (bounded by the
per-user event cap, thousands not billions), and the kernel is
NumPy-vectorized per chord split, so the Python stage is Arrow-batched
with no per-row Python beyond the O(kept) recursion stack. Entity skew
is the same story as sessionization: the hottest user bounds the task,
not the table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def rdp_keep_mask(x: np.ndarray, y: np.ndarray, eps: float) -> np.ndarray:
    """Douglas-Peucker keep-mask for an ordered polyline (planar coords).

    Iterative stack form (no Python recursion limit); the distance of
    every interior point to the current chord is computed vectorized.
    Degenerate chords (coincident endpoints) fall back to point
    distance from the shared endpoint. Endpoints are always kept.
    """
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        xs = x[a + 1 : b]
        ys = y[a + 1 : b]
        dx = x[b] - x[a]
        dy = y[b] - y[a]
        norm = np.hypot(dx, dy)
        if norm == 0.0:
            d = np.hypot(xs - x[a], ys - y[a])
        else:
            d = np.abs(dx * (ys - y[a]) - dy * (xs - x[a])) / norm
        i = int(np.argmax(d))
        if d[i] > eps:
            split = a + 1 + i
            keep[split] = True
            stack.append((a, split))
            stack.append((split, b))
    return keep


def simplify_trajectories(
    points: DataFrame,
    eps: float,
    entity_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Per-entity Douglas-Peucker summary: each entity's points ordered
    by ``order_cols`` form a polyline; returns one row per entity with
    the retained-vertex count. ``eps`` is in coordinate degrees (the
    planar approximation every ST_Simplify default uses; callers
    needing metric tolerance pre-project).

    Output: (entity, n_points, n_kept, endpoints_kept).
    """
    schema = StructType(
        [
            StructField(entity_col, LongType()),
            StructField("n_points", LongType()),
            StructField("n_kept", LongType()),
            StructField("endpoints_kept", BooleanType()),
        ]
    )

    cols = [entity_col, *order_cols, lat_col, lon_col]

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order_cols), kind="mergesort")
        x = pdf[lon_col].to_numpy(np.float64)
        y = pdf[lat_col].to_numpy(np.float64)
        keep = rdp_keep_mask(x, y, eps)
        n = len(pdf)
        return pd.DataFrame(
            {
                entity_col: [int(pdf[entity_col].iloc[0])],
                "n_points": [n],
                "n_kept": [int(keep.sum())],
                "endpoints_kept": [bool(n == 0 or (keep[0] and keep[-1]))],
            }
        )

    return points.select(*cols).groupBy(entity_col).applyInPandas(_one, schema)


def simplify_trajectory_points(
    points: DataFrame,
    eps: float,
    entity_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Row-level variant: the retained vertices themselves, with their
    0-based position in the entity's ordered polyline. Same plan shape
    (one shuffle on the entity key); use when the simplified lines are
    the product rather than the reduction stats."""
    schema = StructType(
        [
            StructField(entity_col, LongType()),
            StructField("seq", LongType()),
            StructField(lat_col, DoubleType()),
            StructField(lon_col, DoubleType()),
        ]
    )

    cols = [entity_col, *order_cols, lat_col, lon_col]

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order_cols), kind="mergesort").reset_index(drop=True)
        x = pdf[lon_col].to_numpy(np.float64)
        y = pdf[lat_col].to_numpy(np.float64)
        keep = rdp_keep_mask(x, y, eps)
        idx = np.flatnonzero(keep)
        return pd.DataFrame(
            {
                entity_col: pdf[entity_col].to_numpy(np.int64)[idx],
                "seq": idx.astype(np.int64),
                lat_col: y[idx],
                lon_col: x[idx],
            }
        )

    return points.select(*cols).groupBy(entity_col).applyInPandas(_one, schema)


def hausdorff_pairs(
    pts: "DataFrame",
    block_w: int,
    user_col: str = "user_id",
    id_col: str = "event_id",
    lat_col: str = "la",
    lon_col: str = "lo",
) -> "DataFrame":
    """Discrete (symmetric) Hausdorff distance between every blocked
    pair of per-user point sets:

        d_ab = max over a-points of min over b-points of d²
        d_h  = greatest(d_ab, d_ba)

    ``pts`` must already be CAPPED per user (the caller's documented
    trajectory bound — e.g. the K earliest fixes by (ts, id)); with cap
    K the per-pair cross product is ≤ K², so the join is
    candidate-bounded, never |points|². Candidate pairs are users
    sharing at least one ``block_w``-wide cell — the blocking that
    keeps the pair count ∝ spatial co-occurrence rather than |users|²
    at corpus scale. Coordinates are exact integer ticks, so d² values,
    maxima and minima are all exact bigints.

    Returns (user_a, user_b, d2_ab, d2_ba, d2_hausdorff).
    """
    from pyspark.sql import functions as F

    u, la, lo = F.col(user_col), F.col(lat_col), F.col(lon_col)
    p = pts.select(
        u.alias("u"),
        F.col(id_col).alias("pid"),
        la.cast("long").alias("la"),
        lo.cast("long").alias("lo"),
    )
    cells = p.select(
        "u",
        F.floor(F.col("la") / F.lit(float(block_w))).cast("long").alias("cx"),
        F.floor(F.col("lo") / F.lit(float(block_w))).cast("long").alias("cy"),
    ).distinct()
    cand = (
        cells.join(
            cells.select(F.col("u").alias("ub"), "cx", "cy"), ["cx", "cy"]
        )
        .filter(F.col("u") < F.col("ub"))
        .select(F.col("u").alias("ua"), "ub")
        .distinct()
    )
    pa = p.select(F.col("u").alias("ua"), F.col("pid").alias("ea"),
                  F.col("la").alias("la_a"), F.col("lo").alias("lo_a"))
    pb = p.select(F.col("u").alias("ub"), F.col("pid").alias("eb"),
                  F.col("la").alias("la_b"), F.col("lo").alias("lo_b"))
    j = cand.join(pa, "ua").join(pb, "ub").select(
        "ua", "ub", "ea", "eb",
        (
            (F.col("la_a") - F.col("la_b")) * (F.col("la_a") - F.col("la_b"))
            + (F.col("lo_a") - F.col("lo_b")) * (F.col("lo_a") - F.col("lo_b"))
        ).alias("d2"),
    )
    dab = (
        j.groupBy("ua", "ub", "ea").agg(F.min("d2").alias("mind"))
        .groupBy("ua", "ub").agg(F.max("mind").cast("long").alias("d2_ab"))
    )
    dba = (
        j.groupBy("ua", "ub", "eb").agg(F.min("d2").alias("mind"))
        .groupBy("ua", "ub").agg(F.max("mind").cast("long").alias("d2_ba"))
    )
    return (
        dab.join(dba, ["ua", "ub"])
        .select(
            F.col("ua").alias("user_a"),
            F.col("ub").alias("user_b"),
            "d2_ab",
            "d2_ba",
            F.greatest("d2_ab", "d2_ba").alias("d2_hausdorff"),
        )
    )


def frechet_pairs(
    pts: "DataFrame",
    block_w: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lat_col: str = "la",
    lon_col: str = "lo",
) -> "DataFrame":
    """Discrete Fréchet distance between every blocked pair of per-user
    trajectories — the ORDER-AWARE similarity Hausdorff cannot express
    (two routes through the same streets in opposite directions are
    Hausdorff-identical but Fréchet-far):

        dF(A, B) = min over monotone couplings of max coupled d²

    computed by the classic K×K dynamic program
    dp[i,j] = max(d²[i,j], min(dp[i-1,j], dp[i,j-1], dp[i-1,j-1])).

    ``pts`` must be CAPPED per user (same contract as hausdorff_pairs);
    candidate pairs are users sharing a ``block_w``-wide cell. The DP
    runs inside ONE mapInPandas stage vectorized ACROSS the pair batch:
    trajectories are padded into (batch, K) tick tensors and the K²
    cell updates are NumPy ops over the whole batch — no per-pair
    Python loop (the multimodal r1 #8 batching lesson applied up
    front). Ticks are integers, so every d², min and max is exact.

    Returns (user_a, user_b, n_a, n_b, d2_frechet). Non-SQL-expressible
    (DP recurrence) → rows-only in the driver harness; correctness is
    pinned by the brute-force-DP pytest plus the dF ≥ Hausdorff
    cross-operator bound.
    """
    from pyspark.sql import functions as F

    u = F.col(user_col)
    p = pts.select(
        u.alias("u"),
        F.struct(
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("pid"),
            F.col(lat_col).cast("long").alias("la"),
            F.col(lon_col).cast("long").alias("lo"),
        ).alias("s"),
    )
    # ordered trajectory arrays (sort by (ts, id) inside the struct sort)
    traj = p.groupBy("u").agg(F.array_sort(F.collect_list("s")).alias("tr"))
    cells = pts.select(
        u.alias("u"),
        F.floor(F.col(lat_col).cast("long") / F.lit(float(block_w))).cast("long").alias("cx"),
        F.floor(F.col(lon_col).cast("long") / F.lit(float(block_w))).cast("long").alias("cy"),
    ).distinct()
    cand = (
        cells.join(cells.select(F.col("u").alias("ub"), "cx", "cy"), ["cx", "cy"])
        .filter(F.col("u") < F.col("ub"))
        .select(F.col("u").alias("ua"), "ub")
        .distinct()
    )
    ta = traj.select(F.col("u").alias("ua"), F.col("tr").alias("tr_a"))
    tb = traj.select(F.col("u").alias("ub"), F.col("tr").alias("tr_b"))
    j = (
        cand.join(ta, "ua")
        .join(tb, "ub")
        .select(
            "ua",
            "ub",
            F.col("tr_a.la").alias("xa"),
            F.col("tr_a.lo").alias("ya"),
            F.col("tr_b.la").alias("xb"),
            F.col("tr_b.lo").alias("yb"),
        )
    )

    import pandas as pd  # noqa: F811 — local alias for the worker closure

    def dp_batches(it):
        BIG = np.int64(1) << 62
        for pdf in it:
            if pdf.empty:
                continue
            b = len(pdf)
            na = pdf["xa"].map(len).to_numpy(np.int64)
            nb = pdf["xb"].map(len).to_numpy(np.int64)
            ka, kb = int(na.max()), int(nb.max())
            xa = np.zeros((b, ka), np.int64)
            ya = np.zeros((b, ka), np.int64)
            xb = np.zeros((b, kb), np.int64)
            yb = np.zeros((b, kb), np.int64)
            for r in range(b):  # pack: O(batch) rows, not O(batch·K²)
                xa[r, : na[r]] = pdf["xa"].iloc[r]
                ya[r, : na[r]] = pdf["ya"].iloc[r]
                xb[r, : nb[r]] = pdf["xb"].iloc[r]
                yb[r, : nb[r]] = pdf["yb"].iloc[r]
            dx = xa[:, :, None] - xb[:, None, :]
            dy = ya[:, :, None] - yb[:, None, :]
            d2 = dx * dx + dy * dy  # (b, ka, kb) exact int64
            # mask padded cells so they never win a min
            ia = np.arange(ka)[None, :] >= na[:, None]
            ib = np.arange(kb)[None, :] >= nb[:, None]
            d2[ia[:, :, None] | ib[:, None, :]] = BIG
            dp = np.full((b, ka, kb), BIG, np.int64)
            for i in range(ka):  # K² vectorized-over-batch updates
                for jj in range(kb):
                    if i == 0 and jj == 0:
                        prev = np.zeros(b, np.int64)
                    elif i == 0:
                        prev = dp[:, 0, jj - 1]
                    elif jj == 0:
                        prev = dp[:, i - 1, 0]
                    else:
                        prev = np.minimum(
                            dp[:, i - 1, jj],
                            np.minimum(dp[:, i, jj - 1], dp[:, i - 1, jj - 1]),
                        )
                    dp[:, i, jj] = np.maximum(d2[:, i, jj], prev)
            out = dp[np.arange(b), na - 1, nb - 1]
            yield pd.DataFrame(
                {
                    "user_a": pdf["ua"].to_numpy(),
                    "user_b": pdf["ub"].to_numpy(),
                    "n_a": na,
                    "n_b": nb,
                    "d2_frechet": out,
                }
            )

    schema = "user_a long, user_b long, n_a long, n_b long, d2_frechet long"
    return j.mapInPandas(dp_batches, schema)
