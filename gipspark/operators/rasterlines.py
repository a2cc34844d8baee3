"""Exact supercover line rasterization: segment → grid cells touched.

Line density — "how many trajectory segments cross each map cell" — is
the raster twin of the point heatmap (queries.heatmap_smooth_events):
roads, shipping lanes and crawl-bot movement corridors only show up
when the *path between* fixes is rasterized, not just the fixes.

The classic algorithms (Bresenham, Amanatides–Woo DDA) walk the grid
sequentially — a per-row loop, which on Spark would mean a Python UDF
or a per-segment window sort. This implementation instead uses a
CLOSED FORM for every visited cell, so the whole operator is a narrow
projection + explode + one hash aggregate (no window, no extra
shuffle; the only exchange is the final groupBy cell):

  A segment with integer endpoints crosses nx vertical and ny
  horizontal grid lines. Order crossings by the exact crossing
  parameter t; with integer coordinates, t_v(i) = off_v(i)/adx and
  t_h(j) = off_h(j)/ady compare exactly on the common denominator
  adx·ady:  key_v(i) = off_v(i)·ady   vs   key_h(j) = off_h(j)·adx,
  both BIGINT (≤ 3.6e5 · 3.6e5 ≈ 1.3e11). Ties (exact corner hits)
  break x-first, so the cell AFTER the k-th crossing is
      ( cx0 + sx·#v-crossings≤k ,  cy0 + sy·#h-crossings≤k )
  and because off_v / off_h are affine in i / j, the rank of a
  crossing among the other axis's crossings has a closed form:
      #{j : key_h(j) <  key_v} = clamp(ceil((key_v − f0h·adx)/(G·adx)), 0, ny)
      #{i : key_v(i) ≤ key_h} = clamp(floor((key_h − f0v·ady)/(G·ady)) + 1, 0, nx)
  (f0v/f0h = distance from the start point to the first boundary in
  the direction of travel). ceil/floor run on doubles but are exact:
  numerator and denominator are integers < 2^53, the true quotient is
  either exactly an integer (then IEEE division is exact) or at least
  1/denom ≥ 5.6e-10 away from one (double rounding error ≤ ~1e-14
  here), so the floor/ceil can never flip. The x-first rule makes the
  visited-cell count exactly nx + ny + 1 and every visited cell
  distinct, so the density aggregate needs no dedup.

Scale shape at 10^12 segments: explode factor = cells touched ∝ path
length in cells (the output's own size — irreducible for this op);
everything up to the final groupBy(gx, gy) is whole-stage codegen with
zero exchanges. The DuckDB oracle in queries.line_density_cells mirrors
these formulas textually; tests/test_rasterlines.py additionally checks
the closed form against an independent Fraction-exact sequential walker.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sign(c: Column) -> Column:
    return F.when(c > 0, F.lit(1)).when(c < 0, F.lit(-1)).otherwise(F.lit(0))


def segment_cells(
    seg: DataFrame,
    grid: int,
    x0: str = "x0",
    y0: str = "y0",
    x1: str = "x1",
    y1: str = "y1",
) -> DataFrame:
    """All grid cells touched by each segment (supercover, x-first
    corner rule). ``seg`` carries NON-NEGATIVE integer endpoint columns;
    returns the input columns plus (gx, gy) — one row per cell touched,
    nx + ny + 1 rows per segment, no duplicates.
    """
    g = F.lit(grid)
    p = (
        seg.withColumn("cx0", F.expr(f"{x0} div {grid}"))
        .withColumn("cy0", F.expr(f"{y0} div {grid}"))
        .withColumn("cx1", F.expr(f"{x1} div {grid}"))
        .withColumn("cy1", F.expr(f"{y1} div {grid}"))
        .withColumn("sx", _sign(F.col(x1) - F.col(x0)))
        .withColumn("sy", _sign(F.col(y1) - F.col(y0)))
        .withColumn("adx", F.abs(F.col(x1) - F.col(x0)))
        .withColumn("ady", F.abs(F.col(y1) - F.col(y0)))
        .withColumn("nx", F.abs(F.col("cx1") - F.col("cx0")))
        .withColumn("ny", F.abs(F.col("cy1") - F.col("cy0")))
        .withColumn(
            "f0v",
            F.when(F.col("sx") > 0, (F.col("cx0") + 1) * g - F.col(x0))
            .when(F.col("sx") < 0, F.col(x0) - F.col("cx0") * g)
            .otherwise(F.lit(0)),
        )
        .withColumn(
            "f0h",
            F.when(F.col("sy") > 0, (F.col("cy0") + 1) * g - F.col(y0))
            .when(F.col("sy") < 0, F.col(y0) - F.col("cy0") * g)
            .otherwise(F.lit(0)),
        )
    )
    carry = [c for c in seg.columns]

    start = p.select(*carry, F.col("cx0").alias("gx"), F.col("cy0").alias("gy"))

    # vertical crossings i = 1..nx: x steps to cx0 + sx*i; y is cy0 +
    # sy * (# horizontal crossings strictly before this one).
    v = (
        p.filter(F.col("nx") >= 1)
        .select(
            *carry,
            "cx0", "cy0", "sx", "sy", "adx", "ady", "ny", "f0v", "f0h",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("nx").cast("long"))).alias("i"),
        )
        .withColumn("key_v", (F.col("f0v") + (F.col("i") - 1) * g) * F.col("ady"))
        .withColumn(
            "hcnt",
            F.least(
                F.col("ny"),
                F.greatest(
                    F.lit(0).cast("long"),
                    F.ceil(
                        (F.col("key_v") - F.col("f0h") * F.col("adx")).cast("double")
                        / (g * F.col("adx")).cast("double")
                    ),
                ),
            ),
        )
        .select(
            *carry,
            (F.col("cx0") + F.col("sx") * F.col("i")).alias("gx"),
            (F.col("cy0") + F.col("sy") * F.col("hcnt")).alias("gy"),
        )
    )

    # horizontal crossings j = 1..ny: y steps to cy0 + sy*j; x is cx0 +
    # sx * (# vertical crossings at-or-before — x wins exact corners).
    h = (
        p.filter(F.col("ny") >= 1)
        .select(
            *carry,
            "cx0", "cy0", "sx", "sy", "adx", "ady", "nx", "f0v", "f0h",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("ny").cast("long"))).alias("j"),
        )
        .withColumn("key_h", (F.col("f0h") + (F.col("j") - 1) * g) * F.col("adx"))
        .withColumn(
            "vcnt",
            F.least(
                F.col("nx"),
                F.greatest(
                    F.lit(0).cast("long"),
                    F.floor(
                        (F.col("key_h") - F.col("f0v") * F.col("ady")).cast("double")
                        / (g * F.col("ady")).cast("double")
                    )
                    + 1,
                ),
            ),
        )
        .select(
            *carry,
            (F.col("cx0") + F.col("sx") * F.col("vcnt")).alias("gx"),
            (F.col("cy0") + F.col("sy") * F.col("j")).alias("gy"),
        )
    )

    return start.unionByName(v).unionByName(h)
