"""Global Moran's I — spatial autocorrelation of a lattice statistic.

"Are dense tiles next to dense tiles?" — the standard global
clustering index over a tile grid:

    I = (n / W) · Σ_ij w_ij (x_i − x̄)(x_j − x̄) / Σ_i (x_i − x̄)²

with rook contiguity (w_ij = 1 for lattice neighbors) over the
OCCUPIED cells of an integer grid.

Scale shape: cell counts are one hash aggregate; the neighbor sum is
NOT a θ-join — each cell explodes its 4 rook offsets and the pair set
comes from an equi-join on the shifted (gx, gy) key, so shuffle is
O(cells), candidate pairs are O(cells·4). The two global moments ride
in as a broadcast 1-row scalar (same decorrelation trick as the
scalar-subquery queries).

Exactness: with integer counts x_i, n·x_i − S (S = Σx) is an exact
bigint deviation, so numerator and denominator are computed as exact
integer sums — no float-reorder drift, and the DuckDB oracle replays
them bit-for-bit. Only the final ratio is a double, computed from the
same four integers in the same textual order both sides:

    I = (n·num) / (W·den)  computed as  (n/W)·(num/den)  in doubles
    (num = Σ_pairs dev_i·dev_j / n², den = Σ dev_i² / n² — the n²
    factors cancel, so they are never materialized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROOK_OFFSETS: tuple[tuple[int, int], ...] = ((1, 0), (-1, 0), (0, 1), (0, -1))


def cell_counts(points: DataFrame, grid_deg: float, lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """(gx, gy, x): occupied-cell point counts on the integer lattice."""
    return points.groupBy(
        F.floor((F.col(lon_col) + F.lit(180.0)) / F.lit(grid_deg)).cast("int").alias("gx"),
        F.floor((F.lit(90.0) - F.col(lat_col)) / F.lit(grid_deg)).cast("int").alias("gy"),
    ).agg(F.count("*").alias("x"))


def morans_i(cells: DataFrame) -> DataFrame:
    """One row: (n_cells, w_links, num, den, morans_i) from (gx, gy, x).

    num = Σ over directed rook-neighbor pairs of dev_i·dev_j,
    den = Σ dev_i², dev_i = n·x_i − S (exact bigints). w_links counts
    DIRECTED links (each undirected link twice), matching the
    textbook W = Σ_ij w_ij.
    """
    stats = cells.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    dev = cells.crossJoin(F.broadcast(stats)).select(
        "gx", "gy", "n", "s", (F.col("n") * F.col("x") - F.col("s")).alias("dev")
    )
    shifted = dev.select(
        "gx",
        "gy",
        "dev",
        F.explode(
            F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in ROOK_OFFSETS])
        ).alias("o"),
    ).select(
        (F.col("gx") + F.col("o.dx")).alias("gx"),
        (F.col("gy") + F.col("o.dy")).alias("gy"),
        F.col("dev").alias("dev_j"),
    )
    pairs = dev.join(shifted, ["gx", "gy"]).select("n", "dev", "dev_j")
    agg = pairs.agg(
        F.first("n").alias("n_cells"),
        F.count("*").cast("long").alias("w_links"),
        F.sum(F.col("dev") * F.col("dev_j")).cast("long").alias("num"),
    )
    den = dev.agg(F.sum(F.col("dev") * F.col("dev")).cast("long").alias("den"))
    out = agg.crossJoin(F.broadcast(den))
    return out.select(
        "n_cells",
        "w_links",
        "num",
        "den",
        (
            (F.col("n_cells").cast("double") / F.col("w_links").cast("double"))
            * (F.col("num").cast("double") / F.col("den").cast("double"))
        ).alias("morans_i"),
    )


def gearys_c(cells: DataFrame) -> DataFrame:
    """One row: (n_cells, w_links, num, den, gearys_c) from (gx, gy, x).

    Geary's C = (n−1)·Σ w_ij (x_i − x_j)² / (2W · Σ (x_i − x̄)²) — the
    local-contrast sibling of Moran's I (C < 1 = positive
    autocorrelation). Same offset-explode rook equi-join; exactness via
    the same n·x − S trick: (x_i − x_j)² · n² = (dev_i − dev_j)², so
    num = Σ (dev_i − dev_j)² and den = Σ dev_i² carry the n² factor
    jointly and it cancels in the ratio. Only the final ratio is a
    double, computed from the same integers on both engines as
    ((n−1)·num) / (2W·den) in the textual order (n−1)/W · num/den / 2.
    """
    stats = cells.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    dev = cells.crossJoin(F.broadcast(stats)).select(
        "gx", "gy", "n", (F.col("n") * F.col("x") - F.col("s")).alias("dev")
    )
    shifted = dev.select(
        "gx",
        "gy",
        "dev",
        F.explode(
            F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in ROOK_OFFSETS])
        ).alias("o"),
    ).select(
        (F.col("gx") + F.col("o.dx")).alias("gx"),
        (F.col("gy") + F.col("o.dy")).alias("gy"),
        F.col("dev").alias("dev_j"),
    )
    pairs = dev.join(shifted, ["gx", "gy"]).select("n", "dev", "dev_j")
    diff = F.col("dev") - F.col("dev_j")
    agg = pairs.agg(
        F.first("n").alias("n_cells"),
        F.count("*").cast("long").alias("w_links"),
        F.sum(diff * diff).cast("long").alias("num"),
    )
    den = dev.agg(F.sum(F.col("dev") * F.col("dev")).cast("long").alias("den"))
    out = agg.crossJoin(F.broadcast(den))
    return out.select(
        "n_cells",
        "w_links",
        "num",
        "den",
        (
            ((F.col("n_cells") - F.lit(1)).cast("double") / F.col("w_links").cast("double"))
            * (F.col("num").cast("double") / F.col("den").cast("double"))
            / F.lit(2.0)
        ).alias("gearys_c"),
    )


def local_moran(cells: DataFrame) -> DataFrame:
    """Per-cell LISA terms: (gx, gy, x, dev, nbr_sum, li_num) — the
    hotspot/coldspot decomposition of global Moran's I. dev = n·x − S
    (exact bigint), nbr_sum = Σ rook-neighbor devs, li_num = dev·nbr_sum
    (positive = the cell sits in a like-valued cluster — a hotspot when
    dev > 0). Global I = Σ li_num / (W/n · Σ dev²); the per-cell terms
    are what a map colors. All bigint; no floats at all."""
    stats = cells.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    dev = cells.crossJoin(F.broadcast(stats)).select(
        "gx", "gy", "x", (F.col("n") * F.col("x") - F.col("s")).alias("dev")
    )
    shifted = dev.select(
        "gx",
        "gy",
        "dev",
        F.explode(
            F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in ROOK_OFFSETS])
        ).alias("o"),
    ).select(
        (F.col("gx") + F.col("o.dx")).alias("gx"),
        (F.col("gy") + F.col("o.dy")).alias("gy"),
        F.col("dev").alias("dev_j"),
    )
    nbr = shifted.groupBy("gx", "gy").agg(F.sum("dev_j").cast("long").alias("nbr_sum"))
    out = dev.join(nbr, ["gx", "gy"], "left").select(
        "gx",
        "gy",
        "x",
        "dev",
        F.coalesce("nbr_sum", F.lit(0)).cast("long").alias("nbr_sum"),
        (F.col("dev") * F.coalesce("nbr_sum", F.lit(0))).cast("long").alias("li_num"),
    )
    return out
