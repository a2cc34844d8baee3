"""Nearest-polygon-boundary distance (the "distance to coastline" op).

For every point, the minimum point-to-segment distance over a polygon
set's edges, plus WHICH polygon owns the nearest edge. The reference
family of engines expose this as ST_Distance against a boundary layer;
here the polygon dim is small (country/admin/coastline layers are
thousands of shapes, not billions), so the edges ride into the plan as
literals and the per-point minimization is ONE ``least()`` over the
unrolled per-edge candidate structs — a completely NARROW op: no join,
no shuffle, scales linearly with the point table and is embedded in
the same whole-stage-codegen span as the scan.

Why unrolled ``least`` and not an ``F.aggregate`` fold: higher-order
functions are CodegenFallback in Spark — the lambda re-evaluates
interpretively per array element, measured ~260 µs/row over 42 edges
at sf0.1 vs ~15 µs/row for the codegen'd least-tree (BENCH.md round 2).
Same story for explode + min(struct): as fast per-row but pays a
map-side-combined shuffle of |points| rows that the narrow form never
does. The unroll caps the edge count (codegen size grows linearly,
~64 KB method limits bite near a few hundred edges) — for genuinely
large boundary layers the bbox tile-cover prefilter (operators/bbox.py)
bounds the per-point candidate set first.

Exactness/portability: squared planar distance in degree² is computed
with the textbook clamp-projection formula in a fixed textual operation
order (IEEE-identical in DuckDB), then quantized to integer 1e-6 ticks
BEFORE the min/argmin, so the comparison both engines make is on exact
integers — ulp drift can't flip the winner. Ties break lexicographically
on the candidate struct (ticks, poly_id[, edge_idx]) — ``least()`` on
structs IS that ordering. For metric output, callers convert ticks →
degrees → meters downstream; ordering is invariant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _edge_rows(polygons: list[dict]) -> list[tuple[int, float, float, float, float]]:
    rows = []
    for p in polygons:
        for ring in p["rings"]:
            for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
                rows.append((int(p["poly_id"]), float(x1), float(y1), float(x2), float(y2)))
    return rows


def _cand(
    px: Column, py: Column, pid: int, edge_idx: int | None, x1: float, y1: float, x2: float, y2: float
) -> Column:
    """(ticks, poly[, edge]) candidate struct for one edge.

    t = clamp(((p-a)·(b-a)) / |b-a|², 0, 1); d² = |p - (a + t(b-a))|².
    Ring edges are never degenerate (consecutive ring vertices are
    distinct by construction), so the division is safe. Edge-constant
    subexpressions (x2-x1 etc.) constant-fold identically in Catalyst
    and DuckDB — both are exact IEEE doubles.
    """
    dx = F.lit(x2) - F.lit(x1)
    dy = F.lit(y2) - F.lit(y1)
    l2 = dx * dx + dy * dy
    t = F.greatest(
        F.lit(0.0), F.least(F.lit(1.0), ((px - F.lit(x1)) * dx + (py - F.lit(y1)) * dy) / l2)
    )
    cx = F.lit(x1) + t * dx
    cy = F.lit(y1) + t * dy
    d2 = (px - cx) * (px - cx) + (py - cy) * (py - cy)
    ticks = F.round(d2 * F.lit(1000000.0), 0).cast("long")
    fields = [ticks.alias("ticks"), F.lit(pid).cast("long").alias("poly")]
    if edge_idx is not None:
        fields.append(F.lit(edge_idx).alias("edge"))
    return F.struct(*fields)


def nearest_edge(
    points: DataFrame,
    polygons: list[dict],
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """points + (nearest_poly, d2_ticks): argmin over all boundary edges.

    d2_ticks = round(d²·10⁶) as BIGINT (d in planar degrees).
    ``least`` over (ticks, poly) structs — deterministic argmin
    regardless of edge order, entirely inside whole-stage codegen.
    """
    px, py = F.col(lon_col), F.col(lat_col)
    best = F.least(
        *[_cand(px, py, pid, None, x1, y1, x2, y2) for pid, x1, y1, x2, y2 in _edge_rows(polygons)]
    )
    with_best = points.withColumn("_best", best)
    return (
        with_best.withColumn("nearest_poly", F.col("_best.poly"))
        .withColumn("d2_ticks", F.col("_best.ticks"))
        .drop("_best")
    )


def nearest_edge_sql(
    pts_cte: str,
    key: str,
    polygons: list[dict],
    lat: str = "lat",
    lon: str = "lon",
    wrap_cte: str | None = None,
) -> str:
    """DuckDB replay: edges as VALUES, the SAME textual d² expression
    quantized to the same ticks, argmin via (ticks, poly_id) ordering.
    The oracle may cross-join (it is not the scale path). With
    ``wrap_cte`` the final select becomes one more CTE of that name so
    callers can keep composing (map-matching smoothing)."""
    vals = ", ".join(f"({pid}, {x1!r}, {y1!r}, {x2!r}, {y2!r})" for pid, x1, y1, x2, y2 in _edge_rows(polygons))
    t = (
        f"greatest(0.0, least(1.0, "
        f"(({lon} - x1) * (x2 - x1) + ({lat} - y1) * (y2 - y1)) / "
        f"((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1))))"
    )
    d2 = (
        f"(({lon} - cx) * ({lon} - cx) + ({lat} - cy) * ({lat} - cy))"
    )
    body = f"""
edges(poly_id, x1, y1, x2, y2) AS (VALUES {vals}),
proj AS (
  SELECT p.{key}, e.poly_id,
         {lat}, {lon},
         x1 + {t} * (x2 - x1) AS cx,
         y1 + {t} * (y2 - y1) AS cy
  FROM {pts_cte} p CROSS JOIN edges e
),
dists AS (
  SELECT {key}, poly_id,
         cast(round({d2} * 1000000.0, 0) as bigint) AS ticks
  FROM proj
),
ranked AS (
  SELECT {key}, poly_id, ticks,
         row_number() OVER (PARTITION BY {key} ORDER BY ticks, poly_id) AS rn
  FROM dists
)"""
    sel = (
        f"SELECT {key}, cast(poly_id as bigint) AS nearest_poly, ticks AS d2_ticks\n"
        "FROM ranked WHERE rn = 1"
    )
    if wrap_cte is not None:
        return f"{body},\n{wrap_cte} AS (\n{sel})"
    return f"{body}\n{sel}\n"


def snap_to_edge(
    points: DataFrame,
    polygons: list[dict],
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """ST_ClosestPoint: points + (nearest_poly, edge_idx, d2_ticks,
    snap_lon, snap_lat) — the map-matching primitive ("snap this fix
    to the nearest boundary/road segment").

    Same narrow least-tree as :func:`nearest_edge`, with the argmin
    carrying the winning EDGE index (ties: smaller ticks, then poly_id,
    then edge_idx); the snapped coordinate is then the clamp projection
    onto that one edge, recomputed from a literal edge array via
    element_at — still zero joins, zero shuffles, all codegen.
    Projection arithmetic is +,-,*,/ and min/max only, in the same
    textual order as the SQL oracle; note the oracle's doubles can
    differ by 1 ulp (DuckDB fuses multiply-adds), so callers that hash
    results quantize the snapped coords to 1e-6 ticks.
    """
    edge_list = _edge_rows(polygons)
    px, py = F.col(lon_col), F.col(lat_col)
    best = F.least(
        *[
            _cand(px, py, pid, i, x1, y1, x2, y2)
            for i, (pid, x1, y1, x2, y2) in enumerate(edge_list)
        ]
    )
    edges_lit = F.array(
        *[
            F.struct(
                F.lit(x1).alias("x1"),
                F.lit(y1).alias("y1"),
                F.lit(x2).alias("x2"),
                F.lit(y2).alias("y2"),
            )
            for _, x1, y1, x2, y2 in edge_list
        ]
    )
    with_best = points.withColumn("_best", best).withColumn(
        "_e", F.element_at(edges_lit, F.col("_best.edge") + F.lit(1))
    )
    e = F.col("_e")
    dx = e.x2 - e.x1
    dy = e.y2 - e.y1
    t = F.greatest(
        F.lit(0.0),
        F.least(F.lit(1.0), ((px - e.x1) * dx + (py - e.y1) * dy) / (dx * dx + dy * dy)),
    )
    return with_best.select(
        *points.columns,
        F.col("_best.poly").alias("nearest_poly"),
        F.col("_best.edge").cast("long").alias("edge_idx"),
        F.col("_best.ticks").alias("d2_ticks"),
        (e.x1 + t * dx).alias("snap_lon"),
        (e.y1 + t * dy).alias("snap_lat"),
    )


def snap_to_edge_sql(
    pts_cte: str, key: str, polygons: list[dict], lat: str = "lat", lon: str = "lon"
) -> str:
    """DuckDB replay of :func:`snap_to_edge`: same edges VALUES, same
    tick quantization, argmin by (ticks, poly_id, edge_idx), then the
    SAME textual projection on the winning edge."""
    vals = ", ".join(
        f"({pid}, {i}, {x1!r}, {y1!r}, {x2!r}, {y2!r})"
        for i, (pid, x1, y1, x2, y2) in enumerate(_edge_rows(polygons))
    )
    t = (
        f"greatest(0.0, least(1.0, "
        f"(({lon} - x1) * (x2 - x1) + ({lat} - y1) * (y2 - y1)) / "
        f"((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1))))"
    )
    d2 = f"(({lon} - cx) * ({lon} - cx) + ({lat} - cy) * ({lat} - cy))"
    return f"""
edges(poly_id, edge_idx, x1, y1, x2, y2) AS (VALUES {vals}),
proj AS (
  SELECT p.{key}, e.poly_id, e.edge_idx, {lat}, {lon},
         x1 + {t} * (x2 - x1) AS cx,
         y1 + {t} * (y2 - y1) AS cy
  FROM {pts_cte} p CROSS JOIN edges e
),
dists AS (
  SELECT {key}, poly_id, edge_idx, cx, cy,
         cast(round({d2} * 1000000.0, 0) as bigint) AS ticks
  FROM proj
),
ranked AS (
  SELECT {key}, poly_id, edge_idx, cx, cy, ticks,
         row_number() OVER (PARTITION BY {key} ORDER BY ticks, poly_id, edge_idx) AS rn
  FROM dists
)
SELECT {key}, cast(poly_id as bigint) AS nearest_poly,
       cast(edge_idx as bigint) AS edge_idx, ticks AS d2_ticks,
       cast(round(cx * 1000000.0, 0) as bigint) AS snap_lon_ticks,
       cast(round(cy * 1000000.0, 0) as bigint) AS snap_lat_ticks
FROM ranked WHERE rn = 1
"""
