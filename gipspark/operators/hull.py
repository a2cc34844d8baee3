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
