"""Point-in-polygon join — cell-prefilter then exact ray-cast refine.

The north_star's signature operator (BASELINE.json:6: "point-in-polygon
joins (cell-prefilter then exact ray-casting refine against
Shapely-prepared polygon partitions)"). Spark-first shape:

1. **Prefilter** (JVM, no Python): polygons' S2 level-``level`` cell
   covers are computed driver-side (polygon sets are small dims) and
   exploded into a ``(cell, poly_id)`` table that is *broadcast* — the
   big point side equi-joins on its already-computed cell id, so the
   10^12-row scan never shuffles for this join and Catalyst pushes the
   cell computation/pruning into the scan stage.
2. **Refine** (Arrow batch → NumPy): candidate (point, poly) pairs run
   the exact even-odd ray cast (gipspark.geo.pip) in a vectorized
   pandas UDF; polygon edge arrays ride to executors inside the UDF
   closure (same role as the reference's Shapely *prepared* polygons —
   preprocessed once, reused per batch).

Scale notes: the broadcast cover is |polys|·|cover| rows (thousands) —
tiny; refine cost is proportional to candidates only, and candidates
are bounded by cover cell area / point density, not |points|×|polys|.
Skew (a megacity cell matching many polygons) is handled upstream by
the salted hybrid join (gipspark.operators.skew) when needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType, LongType, StringType, StructField, StructType

from gipspark.functions.cells import s2_cell
from gipspark.geo import pip as pipgeo

COVER_SCHEMA = StructType(
    [StructField("__cell", LongType(), False), StructField("poly_id", LongType(), False)]
)


def polygon_covers(polys: list[dict], level: int = 12) -> pd.DataFrame:
    """Driver-side (cell, poly_id) cover table for a small polygon dim."""
    rows_cell, rows_pid = [], []
    for p in polys:
        rings = [np.asarray(r, dtype=np.float64) for r in p["rings"]]
        cells = pipgeo.polygon_cover(rings, level=level)
        rows_cell.append(cells)
        rows_pid.append(np.full(len(cells), p["poly_id"], dtype=np.int64))
    return pd.DataFrame(
        {"__cell": np.concatenate(rows_cell), "poly_id": np.concatenate(rows_pid)}
    )


def _edges_by_pid(polys: list[dict]) -> dict[int, np.ndarray]:
    return {
        p["poly_id"]: pipgeo.rings_to_edges([np.asarray(r, dtype=np.float64) for r in p["rings"]])
        for p in polys
    }


def pip_join(
    points: DataFrame,
    polys: list[dict],
    lat_col: str = "lat",
    lon_col: str = "lon",
    level: int = 12,
    cell_col: str | None = None,
    keep_all_points: bool = False,
) -> DataFrame:
    """points ⋈ polygons → points' columns + ``poly_id``.

    ``polys``: list of {poly_id, rings} dicts (rings = [[lon,lat]...]).
    If ``cell_col`` names an existing S2 cell column it is reused
    (encode-once pipelines); otherwise cells are computed here.
    ``keep_all_points``: left join semantics (unmatched → poly_id null).
    """
    spark = points.sparkSession
    cover = spark.createDataFrame(polygon_covers(polys, level), COVER_SCHEMA)
    edges = _edges_by_pid(polys)

    pts = points
    if cell_col is None:
        pts = pts.withColumn("__cell", s2_cell(F.col(lat_col), F.col(lon_col), level))
        cell_ref = "__cell"
    else:
        cell_ref = cell_col
        cover = cover.withColumnRenamed("__cell", cell_ref)

    cand = pts.join(F.broadcast(cover), on=cell_ref, how="inner")

    @pandas_udf(BooleanType())
    def _refine(lon: pd.Series, lat: pd.Series, pid: pd.Series) -> pd.Series:
        out = np.zeros(len(lon), dtype=bool)
        lo = lon.to_numpy(np.float64)
        la = lat.to_numpy(np.float64)
        pids = pid.to_numpy(np.int64)
        for p in np.unique(pids):
            m = pids == p
            out[m] = pipgeo.points_in_polygon_batched(lo[m], la[m], edges[int(p)])
        return pd.Series(out)

    matched = cand.filter(_refine(F.col(lon_col), F.col(lat_col), F.col("poly_id")))
    matched = matched.drop("__cell") if cell_col is None else matched
    if not keep_all_points:
        return matched
    return points.join(
        matched.select(*points.columns, "poly_id"), on=points.columns, how="left"
    )
