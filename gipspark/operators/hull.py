"""Per-group convex hull (Andrew's monotone chain) — ST_ConvexHull.

Groups shuffle once on the group key; each group's hull is computed in
one Arrow batch by a NumPy monotone chain (O(n log n) sort + linear
scan — no Python-level loop over points, the chain scan is the only
loop and it runs over hull candidates, not the full group). Vertices
come back in a canonical order (counter-clockwise, starting from the
lexicographically smallest vertex), so results are deterministic under
any partitioning.

At 100 TB the per-group point set is the scale bound — a planetary
group should be pre-reduced (e.g. one representative per fine S2 cell,
which never moves the hull outward by more than the cell diagonal)
before the exact chain; that reduction is a plain cell groupBy
upstream of this operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def _chain(pts: np.ndarray) -> np.ndarray:
    """Monotone-chain hull of (n,2) [x,y]; returns hull vertices CCW
    starting at the lexicographic minimum. Collinear boundary points
    are dropped (strict turns only)."""
    pts = np.unique(pts, axis=0)  # sorts lexicographically (x, then y)
    if len(pts) <= 2:
        return pts

    def half(p):
        out: list[np.ndarray] = []
        for q in p:
            while (
                len(out) >= 2
                and (out[-1][0] - out[-2][0]) * (q[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (q[0] - out[-2][0])
                <= 0
            ):
                out.pop()
            out.append(q)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def convex_hull(
    df: DataFrame,
    group_col: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """→ (group, vertex_idx, lon, lat): hull vertices per group, CCW
    from the lexicographic minimum vertex."""
    gtype = dict(df.dtypes)[group_col]
    schema = StructType(
        [
            StructField(group_col, LongType() if gtype == "bigint" else IntegerType()),
            StructField("vertex_idx", IntegerType()),
            StructField("lon", DoubleType()),
            StructField("lat", DoubleType()),
        ]
    )

    def hull_of(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[group_col].iloc[0]
        h = _chain(pdf[[lon_col, lat_col]].to_numpy(np.float64))
        return pd.DataFrame(
            {
                group_col: key,
                "vertex_idx": np.arange(len(h), dtype=np.int32),
                "lon": h[:, 0],
                "lat": h[:, 1],
            }
        )

    return (
        df.select(group_col, F.col(lon_col).alias(lon_col), F.col(lat_col).alias(lat_col))
        .groupBy(group_col)
        .applyInPandas(hull_of, schema)
    )


def diameter_pairs(
    df: DataFrame,
    group_col: str,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Per-group diameter: the farthest point pair, exact.

    Coordinates must be integer ticks (e.g. milli-degrees): cross
    products and squared distances on tick-scale ints stay below 2^53,
    so the float64 NumPy arithmetic is EXACT and a DuckDB all-pairs
    oracle matches bit-for-bit. The diameter's endpoints are always
    strict hull vertices (a point interior to a hull edge is strictly
    closer to the far point than one of the edge's endpoints, except
    the all-collinear case where the hull IS the two endpoints), so the
    pair search runs over hull vertices only — the classic hull
    reduction that turns an O(n²) per-group scan into O(n log n + h²).
    Ties: max d², then lexicographically smallest (id_a, id_b);
    coordinate-duplicate points collapse to their smallest id (which is
    exactly the id the oracle's tie-break would pick). Groups with one
    distinct point emit nothing (no pair exists).

    At 100 TB the group shuffles once on its key and the per-group
    bound is the same as convex_hull's: pre-reduce planetary groups to
    one min-id representative per fine cell before the exact pass.
    """
    gtype = dict(df.dtypes)[group_col]
    schema = StructType(
        [
            StructField(group_col, LongType() if gtype == "bigint" else IntegerType()),
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("d2", LongType()),
            StructField("n_pts", LongType()),
        ]
    )

    def diam_of(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[group_col].iloc[0]
        n_pts = len(pdf)
        # one representative (min id) per distinct coordinate
        rep = pdf.groupby([x_col, y_col], as_index=False)[id_col].min()
        if len(rep) < 2:
            if n_pts >= 2:  # all points coincide: the d2=0 pair of the two smallest ids
                two = sorted(pdf[id_col].astype("int64").tolist())[:2]
                return pd.DataFrame(
                    {group_col: [key], "id_a": [two[0]], "id_b": [two[1]], "d2": [0], "n_pts": [n_pts]}
                )
            return pd.DataFrame(
                {group_col: [], "id_a": [], "id_b": [], "d2": [], "n_pts": []}
            ).astype({group_col: "int64", "id_a": "int64", "id_b": "int64", "d2": "int64", "n_pts": "int64"})
        pts = rep[[x_col, y_col]].to_numpy(np.float64)
        ids = rep[id_col].to_numpy(np.int64)
        h = _chain(pts)
        # map hull vertices back to their (unique-coordinate) ids
        coord_to_id = {(float(x), float(y)): int(i) for x, y, i in zip(pts[:, 0], pts[:, 1], ids)}
        hid = np.array([coord_to_id[(float(x), float(y))] for x, y in h], dtype=np.int64)
        dx = h[:, 0][:, None] - h[:, 0][None, :]
        dy = h[:, 1][:, None] - h[:, 1][None, :]
        d2 = dx * dx + dy * dy
        best = d2.max()
        ii, jj = np.nonzero(d2 == best)
        cands = [
            (min(int(hid[i]), int(hid[j])), max(int(hid[i]), int(hid[j])))
            for i, j in zip(ii, jj)
            if i < j
        ]
        id_a, id_b = min(cands)
        return pd.DataFrame(
            {
                group_col: [key],
                "id_a": [id_a],
                "id_b": [id_b],
                "d2": [int(best)],
                "n_pts": [n_pts],
            }
        )

    return (
        df.select(group_col, id_col, x_col, y_col)
        .groupBy(group_col)
        .applyInPandas(diam_of, schema)
    )
