"""kNN join via k-ring expansion with a coverage guarantee loop.

north_star: "k-ring-expansion kNN" (BASELINE.json:6). Spark-first shape:

- both sides carry an S2 cell at a coarse ``level``;
- round ``r``: each live query explodes its radius-r adjacency ball
  (gipspark.geo.s2.grid_disk — exact BFS across cube-face seams) and
  equi-joins candidates on cell — a shuffle join on cell ids, never a
  cross join;
- exact haversine (JVM codegen, no Python) ranks candidates; a query is
  *settled* when it has ≥ k candidates whose k-th distance is within the
  ball's guaranteed covered radius r·min_cell_width — every point
  outside the ball must be at least that far away (walk-contraction
  bound, see _min_cell_width_m), so the top-k is provably exact;
- unsettled queries re-expand (r doubles); after ``max_rounds`` the
  stragglers (typically none) fall back to a bounded brute-force join.

At 10^12 points the candidate volume per query is O(k·skew), the big
side shuffles once per round on cell id, and AQE handles residual
skew; the driver never sees the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gipspark.functions.cells import kring, s2_cell
from gipspark.geo.haversine import haversine_col


import functools


# Published S2 metric (s2geometry s2metrics, quadratic projection):
# kMinWidth deriv = 2*sqrt(2)/3 — the minimum, over ALL level-L cells on
# the sphere, of the distance between a cell's two opposite edges is
# (2*sqrt(2)/3) * 2^-L radians. This is the constant S2 itself uses to
# lower-bound point-to-outside-cell distances.
_S2_MIN_WIDTH_DERIV = 2.0 * (2.0**0.5) / 3.0
_EARTH_RADIUS_M = 6371000.0  # must match geo/haversine.EARTH_RADIUS_M


@functools.lru_cache(maxsize=32)
def _min_cell_width_m(level: int) -> float:
    """Analytic lower bound on level-``level`` cell width (meters).

    Worst-case argument for the k-ring guarantee (replaces the round-2
    sampled 512-point estimate, which could not certify unsampled
    regions — ADVICE r2). geo/s2.grid_disk returns the true radius-r
    adjacency BALL (BFS over exact unit steps, edge+vertex adjacency
    across face seams). Walk-contraction lemma: a geodesic from a point
    in cell A to a point in cell B visits cells c_0=A..c_m=B where
    consecutive cells are adjacent; each intermediate crossing either
    enters and leaves through OPPOSITE edges of a full lattice cell —
    costing ≥ that cell's width ≥ kMinWidth(L) — or cuts a corner
    between two ADJACENT edges, in which case (same-level lattice ⇒
    neighbors share full edges ⇒ both flanking cells touch the shared
    vertex) c_{t−1} and c_{t+1} are themselves adjacent and the step
    contracts out of the walk. So graph_dist(A,B) = d implies geodesic
    ≥ (d−1)·kMinWidth(L). Any point OUTSIDE the radius-r ball has
    d ≥ r+1, hence is ≥ r·min_width away. kMinWidth deriv = 2√2/3 is
    the published global minimum cell width for the quadratic
    projection geo/s2.py implements (a minimum over every cell on every
    face, so face seams and corners are covered). The 0.999 factor
    absorbs float slop between the metric-space bound and the
    haversine refine.
    """
    return _S2_MIN_WIDTH_DERIV * (2.0 ** -level) * _EARTH_RADIUS_M * 0.999


def knn_join(
    queries: DataFrame,
    points: DataFrame,
    k: int = 5,
    level: int | None = None,
    q_id: str = "q_id",
    p_id: str = "p_id",
    q_lat: str = "q_lat",
    q_lon: str = "q_lon",
    p_lat: str = "p_lat",
    p_lon: str = "p_lon",
    max_rounds: int = 3,
    n_points_hint: int | None = None,
) -> DataFrame:
    """Exact k nearest ``points`` per query row.

    Returns (q_id, p_id, dist_m, rank) with rank 1..k ordered by
    (dist_m, p_id) — the tie-break makes results deterministic and
    oracle-comparable. ``n_points_hint`` skips the ``points.count()``
    the density-adaptive level pick otherwise needs — at 10^12 rows
    pass the table's known row count (catalog/manifest metadata)
    instead of paying a full scan before the join starts.
    """
    if level is None and n_points_hint is not None:
        import math

        target_cells = max(6, n_points_hint * 9 // (8 * k))
        level = max(1, min(14, int(math.log(max(target_cells / 6, 1), 4))))
    if level is None:
        # density-adaptive: pick the level whose ring-1 disk (9 cells)
        # is expected to hold ~8k points, so most queries settle in the
        # first round instead of walking the expansion ladder
        import math

        n_pts = points.count()
        target_cells = max(6, n_pts * 9 // (8 * k))
        level = max(1, min(14, int(math.log(max(target_cells / 6, 1), 4))))

    # Persist both sides: the loop takes multiple actions per round and
    # the cell encode is a pandas-UDF pass worth paying exactly once.
    pts = points.select(
        F.col(p_id),
        F.col(p_lat),
        F.col(p_lon),
        s2_cell(F.col(p_lat), F.col(p_lon), level).alias("__pcell"),
    ).persist()
    live = queries.select(
        F.col(q_id),
        F.col(q_lat),
        F.col(q_lon),
        s2_cell(F.col(q_lat), F.col(q_lon), level).alias("__qcell"),
    ).persist()
    min_width = _min_cell_width_m(level)
    settled_parts: list[DataFrame] = []
    w = Window.partitionBy(q_id).orderBy(F.col("dist_m").asc(), F.col(p_id).asc())

    r = 1
    for _ in range(max_rounds):
        cand = (
            live.withColumn("__ring", kring(F.col("__qcell"), level, r))
            .select(q_id, q_lat, q_lon, F.explode("__ring").alias("__pcell"))
            .join(pts, on="__pcell")
            .withColumn(
                "dist_m", haversine_col(F.col(q_lat), F.col(q_lon), F.col(p_lat), F.col(p_lon))
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
        # a point outside the radius-r lattice disk is separated from the
        # query cell by ≥ r full cell widths (the cells in between), so
        # the top-k is provably exact once kth ≤ r·min_width
        guarantee = r * min_width
        stats = cand.groupBy(q_id).agg(
            F.count("*").alias("__n"), F.max("dist_m").alias("__kth")
        )
        ok_ids = stats.filter((F.col("__n") >= k) & (F.col("__kth") <= F.lit(guarantee)))
        settled_parts.append(
            cand.join(F.broadcast(ok_ids.select(q_id)), on=q_id, how="left_semi")
        )
        live = live.join(
            F.broadcast(ok_ids.select(q_id)), on=q_id, how="left_anti"
        ).persist()
        # cheap emptiness probe per round: query side is small by contract
        if live.count() == 0:
            live = None
            break
        r *= 2
    if live is not None and live.count() > 0:
        brute = (
            live.drop("__qcell")
            .crossJoin(pts.drop("__pcell"))
            .withColumn(
                "dist_m", haversine_col(F.col(q_lat), F.col(q_lon), F.col(p_lat), F.col(p_lon))
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
        settled_parts.append(brute)
    out = settled_parts[0]
    for part in settled_parts[1:]:
        out = out.unionByName(part, allowMissingColumns=True)
    return out.select(q_id, p_id, "dist_m", "rank")


def within_join(
    left: DataFrame,
    right: DataFrame,
    radius_m: float,
    level: int | None = None,
    l_id: str = "l_id",
    r_id: str = "r_id",
    l_lat: str = "l_lat",
    l_lon: str = "l_lon",
    r_lat: str = "r_lat",
    r_lon: str = "r_lon",
) -> DataFrame:
    """Exact distance-within join: every (left, right) pair whose
    haversine distance is ≤ ``radius_m`` meters.

    Scale shape (north_star spatial-join family, BASELINE.json:6): both
    sides are S2-encoded at ``level``; the left side explodes the
    lattice disk of radius ``r`` cells and equi-joins the right side on
    cell — one shuffle on cell ids, candidate volume bounded by disk
    occupancy, never a cross join. Exactness: a point outside the
    radius-``r`` disk is separated from the query cell by ≥ r
    conservative cell widths (see :func:`_min_cell_width_m`), so with
    r·min_width > radius_m no qualifying pair can escape the prefilter.
    The haversine refine runs JVM-side (whole-stage codegen).

    Each right row has exactly one cell and the per-query disk is
    deduped, so no distinct() is needed — pairs appear once.
    Returns (l_id, r_id, dist_m).
    """
    import math

    if level is None:
        # finest level whose disk stays ≤2 rings wide for this radius —
        # small disks keep the explode factor O(10) while fine cells
        # keep per-cell candidate lists short in dense data
        level = 14
        while level > 1 and _min_cell_width_m(level) * 2.0 < radius_m:
            level -= 1
    # strict inequality: r·min_width must EXCEED the radius so the
    # boundary case (dist exactly r·min_width) cannot sit outside the disk
    r = int(math.floor(radius_m / _min_cell_width_m(level))) + 1

    rt = right.select(
        F.col(r_id),
        F.col(r_lat),
        F.col(r_lon),
        s2_cell(F.col(r_lat), F.col(r_lon), level).alias("__cell"),
    )
    lt = left.select(
        F.col(l_id),
        F.col(l_lat),
        F.col(l_lon),
        s2_cell(F.col(l_lat), F.col(l_lon), level).alias("__lcell"),
    )
    return (
        lt.withColumn("__ring", kring(F.col("__lcell"), level, r))
        .select(l_id, l_lat, l_lon, F.explode("__ring").alias("__cell"))
        .join(rt, on="__cell")
        .withColumn(
            "dist_m", haversine_col(F.col(l_lat), F.col(l_lon), F.col(r_lat), F.col(r_lon))
        )
        .filter(F.col("dist_m") <= F.lit(float(radius_m)))
        .select(l_id, r_id, "dist_m")
    )


def knn_join_brute(
    queries: DataFrame,
    points: DataFrame,
    k: int = 5,
    q_id: str = "q_id",
    p_id: str = "p_id",
    q_lat: str = "q_lat",
    q_lon: str = "q_lon",
    p_lat: str = "p_lat",
    p_lon: str = "p_lon",
) -> DataFrame:
    """Reference brute force (broadcast nested loop) — baseline + oracle."""
    w = Window.partitionBy(q_id).orderBy(F.col("dist_m").asc(), F.col(p_id).asc())
    return (
        F.broadcast(queries.select(q_id, q_lat, q_lon))
        .crossJoin(points.select(p_id, p_lat, p_lon))
        .withColumn(
            "dist_m", haversine_col(F.col(q_lat), F.col(q_lon), F.col(p_lat), F.col(p_lon))
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, p_id, "dist_m", "rank")
    )
