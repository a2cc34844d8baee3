"""Grid-based density clustering (DBSCAN-on-a-grid).

Bucket points into fixed-degree integer cells, keep cells with at
least ``min_points`` members, connect 8-neighbor dense cells, and
label each dense cell with its connected component's minimum cell id.

Scale shape (the reason this survives 100 TB of points):

- the raw point table collapses to dense cells in ONE map-side
  combinable hash aggregate — points never shuffle individually;
- adjacency is an 8-offset explode + equi-join on cell ids (hash
  join over the *dense-cell* table, which is orders of magnitude
  smaller than the points);
- components run pointer-jumping (operators/components.py,
  O(log diameter) rounds, lineage cut per round).

No antimeridian wrap at this grid — production spherical adjacency
goes through the S2 k-ring (operators/knn.py). cell_id = gx*1000+gy
(the heatmap_smooth convention): gy spans [0, floor(180/cell_deg)],
and the runtime check below rejects any cell_deg whose gy range could
reach the stride seam — at the old *100 encoding, cell_deg=1.8 put
lat=-90 at gy=100, silently aliasing into the next gx column
(ADVICE r2). The dy=-1 neighbor of gy=0 maps to (gx-1)*1000+999,
which the guard keeps unoccupied, so seam arithmetic never aliases
into a real cell either.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gipspark.operators.components import connected_components

_STRIDE = 1000


def grid_cluster(
    pts: DataFrame,
    cell_deg: float = 2.5,
    min_points: int = 3,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """(cell_id, cluster_id, n_points) for every dense cell."""
    # gy_max must stay below _STRIDE-1 so (a) no real gy aliases into
    # the next gx column and (b) gy=0's dy=-1 neighbor (= previous
    # column's gy=_STRIDE-1 slot) can never be an occupied cell
    if math.floor(180.0 / cell_deg) >= _STRIDE - 2:
        raise ValueError(
            f"cell_deg={cell_deg} puts gy range within 2 of the id stride "
            f"{_STRIDE}; use a coarser grid or raise _STRIDE"
        )
    gx = F.floor((F.col(lon_col) + 180.0) / cell_deg).cast("int")
    gy = F.floor((90.0 - F.col(lat_col)) / cell_deg).cast("int")
    dense = (
        pts.select((gx * _STRIDE + gy).alias("cell_id"))
        .groupBy("cell_id")
        .agg(F.count("*").alias("n_points"))
        .filter(F.col("n_points") >= min_points)
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if not (dx == 0 and dy == 0)
        ]
    )
    nbrs = dense.select("cell_id", F.explode(offsets).alias("o")).select(
        F.col("cell_id").alias("src"),
        (
            (F.col("cell_id") / _STRIDE).cast("int") * _STRIDE
            + F.col("o.dx") * _STRIDE
            + (F.col("cell_id") % _STRIDE)
            + F.col("o.dy")
        ).alias("dst"),
    )
    edges = (
        nbrs.join(dense.select(F.col("cell_id").alias("dst")), "dst")
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
    )
    comp = connected_components(edges, max_iter=16)
    return dense.join(comp, dense.cell_id == comp.node, "left").select(
        "cell_id",
        F.coalesce(F.least(F.col("cell_id"), F.col("comp")), F.col("cell_id"))
        .cast("int")
        .alias("cluster_id"),
        "n_points",
    )
