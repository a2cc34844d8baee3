"""Point-level DBSCAN (core / border / noise) as DataFrame ops.

operators/gridcluster.py clusters *dense cells*; this is the classic
point-level algorithm: a point is CORE when its ε-ball holds at least
``min_pts`` points (itself included), clusters are the connected
components of the core–core ε-graph, non-core points within ε of a
core are BORDER (attached to the smallest adjacent cluster id — the
deterministic resolution of DBSCAN's documented border ambiguity), and
the rest is NOISE (cluster_id = -1).

Scale shape (what survives 100 TB of points):

- ε-pairs come from an ε-wide-cell 3×3 offset-explode equi-join (the
  ripleys_k prefilter) — NEVER the all-pairs θ-join; a pair at
  distance ≤ ε differs by ≤ ε in each axis, so the 3×3 ring is an
  exact candidate superset and shuffle is ∝ occupied-cell density;
- neighbor counts are one map-side-combinable hash aggregate over
  those pairs;
- components run pointer-jumping over CORE–CORE edges only
  (operators/components.py, O(log diameter) rounds) — the core graph
  is far smaller than the point set at any real ε/min_pts;
- the candidate-pair relation is reused three times (count, edges,
  border attach); at cluster scale you'd stage it once
  (sources/checkpoint.py stage-table pattern) — locally Catalyst just
  recomputes the one join.

Coordinates are exact integer ticks (milli-degrees by module
convention), so every distance comparison, count, and label is exact
integer arithmetic — bit-reproducible against the DuckDB brute-force
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gipspark.operators.components import connected_components


def dbscan(
    pts: DataFrame,
    eps: int,
    min_pts: int,
    id_col: str = "id",
    lat_col: str = "la",
    lon_col: str = "lo",
    t_col: str | None = None,
    eps_t: int | None = None,
) -> DataFrame:
    """(id, role, cluster_id) for every input point.

    role ∈ {'core','border','noise'}; cluster_id = min core id of the
    cluster (border: min over adjacent clusters), -1 for noise.

    Pass ``t_col`` + ``eps_t`` for ST-DBSCAN: the neighbor predicate
    becomes d² ≤ ε² AND |Δt| ≤ ε_t (the standard spatio-temporal
    extension — a burst must be compact in space AND time). The
    temporal bound is an extra filter on the SAME spatially-blocked
    candidate set, so the scale shape is unchanged; at extreme
    temporal selectivity you'd block on (cell, time-bucket) instead —
    the knox_test 1-D bucket trick composes here if needed.
    """
    if (t_col is None) != (eps_t is None):
        raise ValueError("t_col and eps_t must be passed together")
    la, lo = F.col(lat_col), F.col(lon_col)
    tcols = [F.col(t_col).cast("long").alias("t")] if t_col else []
    cells = pts.select(
        F.col(id_col).alias("id"),
        la.alias("la"),
        lo.alias("lo"),
        *tcols,
        F.floor(la / F.lit(float(eps))).cast("long").alias("cx"),
        F.floor(lo / F.lit(float(eps))).cast("long").alias("cy"),
    )
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    tb = [F.col("t").alias("t_b")] if t_col else []
    b = cells.select(
        F.col("id").alias("id_b"),
        F.col("la").alias("la_b"),
        F.col("lo").alias("lo_b"),
        *tb,
        F.explode(
            F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in offsets])
        ).alias("o"),
        F.col("cx").alias("bcx"),
        F.col("cy").alias("bcy"),
    ).select(
        "id_b",
        "la_b",
        "lo_b",
        *([F.col("t_b")] if t_col else []),
        (F.col("bcx") + F.col("o.dx")).alias("cx"),
        (F.col("bcy") + F.col("o.dy")).alias("cy"),
    )
    d2 = (
        (F.col("la") - F.col("la_b")) * (F.col("la") - F.col("la_b"))
        + (F.col("lo") - F.col("lo_b")) * (F.col("lo") - F.col("lo_b"))
    )
    cand = (
        cells.join(b, ["cx", "cy"])
        .filter(F.col("id") != F.col("id_b"))
        .filter(d2 <= F.lit(int(eps) * int(eps)))
    )
    if t_col:
        cand = cand.filter(F.abs(F.col("t") - F.col("t_b")) <= F.lit(int(eps_t)))
    cand = cand.select("id", "id_b")

    others = cand.groupBy("id").agg(F.count("*").alias("others"))
    deg = (
        pts.select(F.col(id_col).alias("id"))
        .join(others, "id", "left")
        .select("id", (F.lit(1) + F.coalesce(F.col("others"), F.lit(0))).alias("cnt"))
    )
    cores = deg.filter(F.col("cnt") >= min_pts).select("id")

    core_edges = (
        cand.filter(F.col("id") < F.col("id_b"))
        .join(cores, "id", "left_semi")
        .join(cores.select(F.col("id").alias("id_b")), "id_b", "left_semi")
        .select(F.col("id").alias("id_a"), "id_b")
    )
    comp = connected_components(core_edges)
    core_cluster = (
        cores.join(comp.withColumnRenamed("node", "id"), "id", "left")
        .select("id", F.coalesce(F.col("comp"), F.col("id")).cast("long").alias("cluster_id"))
    )

    border = (
        cand.join(cores, "id", "left_anti")
        .join(core_cluster.select(F.col("id").alias("id_b"), "cluster_id"), "id_b")
        .groupBy("id")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )

    return (
        pts.select(F.col(id_col).alias("id"))
        .join(core_cluster.select("id", F.col("cluster_id").alias("core_cl")), "id", "left")
        .join(border.select("id", F.col("cluster_id").alias("bord_cl")), "id", "left")
        .select(
            "id",
            F.when(F.col("core_cl").isNotNull(), "core")
            .when(F.col("bord_cl").isNotNull(), "border")
            .otherwise("noise")
            .alias("role"),
            F.coalesce(F.col("core_cl"), F.col("bord_cl"), F.lit(-1)).cast("long").alias(
                "cluster_id"
            ),
        )
    )
