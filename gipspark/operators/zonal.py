"""Raster↔vector zonal aggregation (upstream gips_stats semantics).

north_star: "raster↔vector zonal aggregation over GIPS-style fixed tile
grids" (BASELINE.json:6). The raster is a long-format table of pixel
centroids (tile_id, ix, iy, lon, lat, value) — the layout that
distributes: each tile's pixels are one parquet partition, so the zonal
join prunes to the tiles whose bbox intersects each polygon before any
exact work happens.

Shape: PIP-join pixel centroids → polygons (broadcast cell-prefilter +
exact refine, gipspark.operators.pip), then a plain hash aggregate per
(poly, stat). Catalyst performs the partial/final split; no Python in
the aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gipspark.operators.pip import pip_join


def zonal_stats(
    raster: DataFrame,
    polys: list[dict],
    value_col: str = "value",
    lat_col: str = "lat",
    lon_col: str = "lon",
    level: int = 10,
) -> DataFrame:
    """Per-polygon stats of raster pixels inside the zone.

    Coarser prefilter level (10) than point indexing: raster pixels are
    dense, so bigger cover cells mean a smaller broadcast table at the
    cost of a few more refine candidates — the refine is vectorized and
    cheap relative to shuffle volume.
    """
    matched = pip_join(raster, polys, lat_col=lat_col, lon_col=lon_col, level=level)
    v = F.col(value_col)
    return matched.groupBy("poly_id").agg(
        F.count("*").alias("px_count"),
        F.min(v).alias("v_min"),
        F.max(v).alias("v_max"),
        F.avg(v).alias("v_avg"),
        F.stddev_samp(v).alias("v_std"),
        F.sum(v).alias("v_sum"),
    )
