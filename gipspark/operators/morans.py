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


STAR_OFFSETS: tuple[tuple[int, int], ...] = ROOK_OFFSETS + ((0, 0),)


def getis_ord_star(cells: DataFrame) -> DataFrame:
    """Per-cell Getis–Ord Gi* hotspot statistic from (gx, gy, x):

        Gi* = (Σ_j w_ij x_j − x̄ W_i) / (S·√((n·W_i − W_i²)/(n−1)))

    with binary rook weights INCLUDING self (the * variant). Same
    offset-explode equi-join shape as local_moran — shuffle O(cells),
    never a θ-join — plus one broadcast 1-row moment aggregate.

    Exactness: with integer counts, num = n·Σw x − W_i·S and
    d2 = W_i·(n − W_i) are exact bigints; d1 = n·Σx² − S² is computed
    in DECIMAL(38,0) (DuckDB HUGEINT on the oracle side) because S²
    passes int64 once the lattice holds ≳3·10⁹ points — the
    chisq_contrib lesson (ADVICE r2) applied up front. The only double
    is the final z-score, num / √(d1·d2/(n−1)), evaluated in the same
    textual order on both engines (÷ and √ are IEEE correctly-rounded,
    so equal integers give equal doubles).
    """
    stats = cells.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sx2"),
    )
    shifted = cells.select(
        "gx",
        "gy",
        "x",
        F.explode(
            F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in STAR_OFFSETS])
        ).alias("o"),
    ).select(
        (F.col("gx") + F.col("o.dx")).alias("gx"),
        (F.col("gy") + F.col("o.dy")).alias("gy"),
        F.col("x").alias("x_j"),
    )
    nbr = shifted.groupBy("gx", "gy").agg(
        F.count("*").cast("long").alias("wi"),
        F.sum("x_j").cast("long").alias("gsum"),
    )
    out = cells.join(nbr, ["gx", "gy"]).crossJoin(F.broadcast(stats))
    dec = "decimal(38,0)"
    num = (F.col("n") * F.col("gsum") - F.col("wi") * F.col("s")).cast("long")
    d1 = (
        F.col("n").cast(dec) * F.col("sx2").cast(dec) - F.col("s").cast(dec) * F.col("s").cast(dec)
    )
    d2 = (F.col("wi") * (F.col("n") - F.col("wi"))).cast("long")
    return out.select(
        "gx",
        "gy",
        F.col("x").cast("long").alias("x"),
        "wi",
        "gsum",
        num.alias("num"),
        d2.alias("d2"),
        (
            num.cast("double")
            / F.sqrt(d1.cast("double") * d2.cast("double") / (F.col("n") - F.lit(1)).cast("double"))
        ).alias("gi_star"),
    )


def join_counts(cells: DataFrame) -> DataFrame:
    """Join-count statistics (BB/WW/BW) over (gx, gy, x) — the
    categorical sibling of Moran's I: mark each occupied cell Black
    when its count is above the lattice mean, then count like/unlike
    rook-adjacent pairs. Clustering shows as BB ≫ E[BB] and
    BW ≪ E[BW] (the checkerboard inverts it).

    Exactness: the Black marker is the integer comparison n·x > S
    (above-mean without a division); pair counts come from the same
    offset-explode rook equi-join as morans_i (shuffle O(cells), never
    a θ-join), counted directed then halved with ``div 2`` (every
    unordered pair appears exactly twice, so the halves are exact).
    Expected counts under nonfree sampling,

        E[BB] = W·nb(nb−1)/(n(n−1)),  E[BW] = 2W·nb·nw/(n(n−1)),

    are the only doubles, computed from the same exact integers in the
    same textual order both engines."""
    stats = cells.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    marked = cells.crossJoin(F.broadcast(stats)).select(
        "gx", "gy", "n",
        (F.col("n") * F.col("x") > F.col("s")).cast("int").alias("blk"),
    )
    shifted = marked.select(
        "gx",
        "gy",
        "blk",
        F.explode(
            F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in ROOK_OFFSETS])
        ).alias("o"),
    ).select(
        (F.col("gx") + F.col("o.dx")).alias("gx"),
        (F.col("gy") + F.col("o.dy")).alias("gy"),
        F.col("blk").alias("blk_j"),
    )
    pairs = marked.join(shifted, ["gx", "gy"]).select("n", "blk", "blk_j")
    agg = pairs.agg(
        F.first("n").alias("n_cells"),
        F.expr("cast(count(*) div 2 as bigint)").alias("w_links"),
        F.expr("cast(sum(blk * blk_j) div 2 as bigint)").alias("j_bb"),
        F.expr("cast(sum((1 - blk) * (1 - blk_j)) div 2 as bigint)").alias("j_ww"),
        F.expr("cast(sum(blk + blk_j - 2 * blk * blk_j) div 2 as bigint)").alias("j_bw"),
    )
    nb = marked.agg(F.sum("blk").cast("long").alias("n_black"))
    out = agg.crossJoin(F.broadcast(nb))
    n_, w_, b_ = (F.col(c).cast("double") for c in ("n_cells", "w_links", "n_black"))
    denom = n_ * (n_ - F.lit(1.0))
    return out.select(
        "n_cells",
        "n_black",
        "w_links",
        "j_bb",
        "j_ww",
        "j_bw",
        (w_ * b_ * (b_ - F.lit(1.0)) / denom).alias("e_bb"),
        (F.lit(2.0) * w_ * b_ * (n_ - b_) / denom).alias("e_bw"),
    )


def mann_kendall(series: DataFrame, keys: list[str], t_col: str = "t", v_col: str = "v") -> DataFrame:
    """Per-key Mann–Kendall trend statistic S = Σ_{i<j} sign(v_j − v_i)
    over each key's time series — the "emerging hotspot" test a
    space-time cube runs per cell (rising when S ≫ 0, declining ≪ 0).

    Shape: one self equi-join on the key columns filtered to t₂ > t₁ —
    quadratic only WITHIN a key's series, and a series has at most
    #time-buckets rows (bounded by the calendar: ≤366 daily buckets a
    year → ≤67k pairs per cell, a constant at 100 TB). The join and
    both aggregates shuffle on the key, never on rows. Everything is
    exact integers; keys with a single period emit (0, 0, 'flat')."""
    a = series.select(*keys, F.col(t_col).alias("t1"), F.col(v_col).alias("v1"))
    b = series.select(*keys, F.col(t_col).alias("t2"), F.col(v_col).alias("v2"))
    sg = (
        F.when(F.col("v2") > F.col("v1"), 1).when(F.col("v2") < F.col("v1"), -1).otherwise(0)
    )
    pairs = (
        a.join(b, keys)
        .filter(F.col("t2") > F.col("t1"))
        .groupBy(*keys)
        .agg(F.count("*").cast("long").alias("n_pairs"), F.sum(sg).cast("long").alias("s_stat"))
    )
    np_ = series.groupBy(*keys).agg(F.count("*").cast("long").alias("n_periods"))
    out = np_.join(pairs, keys, "left")
    s = F.coalesce("s_stat", F.lit(0).cast("long"))
    return out.select(
        *keys,
        "n_periods",
        F.coalesce("n_pairs", F.lit(0).cast("long")).alias("n_pairs"),
        s.alias("s_stat"),
        F.when(s > 0, "rising").when(s < 0, "falling").otherwise("flat").alias("trend"),
    )


def ripleys_k(
    pts: DataFrame,
    radii_mdeg: list[int],
    area_mdeg2: float,
    lat_col: str = "la",
    lon_col: str = "lo",
    id_col: str = "id",
) -> DataFrame:
    """Ripley's K point-pattern statistic at the given radii (planar
    milli-degree ticks, no edge correction — documented estimator bias
    at the study-area border):

        K̂(r) = A · 2·|{(i<j): 0 < d²_ij ≤ r²}| / n²

    Scale shape: NEVER the all-pairs θ-join — points land in cells as
    wide as max(r), candidates come from a 3×3 offset-explode equi-join
    on the cell key (every unordered pair appears exactly once after
    id_a < id_b), and all radii share that one join: per-radius counts
    are conditional sums in a single aggregate, unpivoted with stack().
    Distances are exact integer ticks (coords are exact milli-degree
    ints by construction), so pair counts are bit-exact; K̂ is the only
    double, computed from the same integers in the same textual order
    as the oracle."""
    rmax = max(radii_mdeg)
    la, lo = F.col(lat_col), F.col(lon_col)
    cells = pts.select(
        F.col(id_col).alias("id"),
        la.alias("la"),
        lo.alias("lo"),
        F.floor(la / F.lit(float(rmax))).cast("long").alias("cx"),
        F.floor(lo / F.lit(float(rmax))).cast("long").alias("cy"),
    )
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    b = cells.select(
        F.col("id").alias("id_b"),
        F.col("la").alias("la_b"),
        F.col("lo").alias("lo_b"),
        F.explode(
            F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in offsets])
        ).alias("o"),
        F.col("cx").alias("bcx"),
        F.col("cy").alias("bcy"),
    ).select(
        "id_b",
        "la_b",
        "lo_b",
        (F.col("bcx") + F.col("o.dx")).alias("cx"),
        (F.col("bcy") + F.col("o.dy")).alias("cy"),
    )
    d2 = (
        (F.col("la") - F.col("la_b")) * (F.col("la") - F.col("la_b"))
        + (F.col("lo") - F.col("lo_b")) * (F.col("lo") - F.col("lo_b"))
    )
    cand = (
        cells.join(b, ["cx", "cy"])
        .filter(F.col("id") < F.col("id_b"))
        .select(d2.alias("d2"))
    )
    sums = cand.agg(
        *[
            F.sum(F.when((F.col("d2") > 0) & (F.col("d2") <= r * r), 1).otherwise(0))
            .cast("long")
            .alias(f"n_{r}")
            for r in radii_mdeg
        ]
    )
    stack_args = ", ".join(f"{r}, n_{r}" for r in radii_mdeg)
    bands = sums.select(
        F.expr(f"stack({len(radii_mdeg)}, {stack_args}) AS (r_mdeg, n_pairs)")
    )
    n1 = pts.agg(F.count("*").cast("long").alias("n"))
    return bands.crossJoin(F.broadcast(n1)).select(
        F.col("r_mdeg").cast("long").alias("r_mdeg"),
        "n_pairs",
        (
            F.lit(float(area_mdeg2))
            * (F.lit(2).cast("long") * F.col("n_pairs")).cast("double")
            / (F.col("n").cast("double") * F.col("n").cast("double"))
        ).alias("k_hat"),
    )


def knox_test(
    pts: DataFrame,
    s_crit: int,
    t_crit: int,
    id_col: str = "id",
    lat_col: str = "la",
    lon_col: str = "lo",
    t_col: str = "t",
) -> DataFrame:
    """Knox space-time interaction statistic (one row):

        X  = |{i<j : d²_ij ≤ s² AND |Δt| ≤ τ}|
        Ns = |close in space|, Nt = |close in time|, N = n(n-1)/2
        knox_ratio = X / (Ns·Nt/N)   (>1 ⇒ space-time clustering)

    Scale shape — two INDEPENDENT blocked self-joins, never all-pairs:
    the spatial side reuses the ripleys_k 3×3 s-wide-cell offset join
    (X and Ns are conditional sums of that ONE join — each unordered
    pair appears exactly once because each point's cell is unique, so
    the offset is determined); the temporal side is the same trick in
    1-D: τ-wide time buckets with a 3-offset explode, so Nt shuffles ∝
    temporal co-occupancy. All counts exact bigints; the ratio is the
    only double, derived in fixed textual order.
    """
    la, lo, t = F.col(lat_col), F.col(lon_col), F.col(t_col)
    base = pts.select(
        F.col(id_col).alias("id"), la.alias("la"), lo.alias("lo"), t.cast("long").alias("t")
    )
    # spatial block (3x3 of s-wide cells), X and Ns from one join
    sc = base.select(
        "id", "la", "lo", "t",
        F.floor(F.col("la") / F.lit(float(s_crit))).cast("long").alias("cx"),
        F.floor(F.col("lo") / F.lit(float(s_crit))).cast("long").alias("cy"),
    )
    offs2 = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    sb = sc.select(
        F.col("id").alias("id_b"), F.col("la").alias("la_b"),
        F.col("lo").alias("lo_b"), F.col("t").alias("t_b"),
        F.explode(F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in offs2])).alias("o"),
        F.col("cx").alias("bcx"), F.col("cy").alias("bcy"),
    ).select(
        "id_b", "la_b", "lo_b", "t_b",
        (F.col("bcx") + F.col("o.dx")).alias("cx"),
        (F.col("bcy") + F.col("o.dy")).alias("cy"),
    )
    d2 = (
        (F.col("la") - F.col("la_b")) * (F.col("la") - F.col("la_b"))
        + (F.col("lo") - F.col("lo_b")) * (F.col("lo") - F.col("lo_b"))
    )
    sp = (
        sc.join(sb, ["cx", "cy"])
        .filter(F.col("id") < F.col("id_b"))
        .filter(d2 <= F.lit(int(s_crit) * int(s_crit)))
        .select(
            F.abs(F.col("t") - F.col("t_b")).alias("dt"),
        )
        .agg(
            F.count("*").cast("long").alias("n_space"),
            F.sum(F.when(F.col("dt") <= t_crit, 1).otherwise(0)).cast("long").alias("x_st"),
        )
    )
    # temporal block (1-D, tau-wide buckets)
    tc = base.select("id", "t", (F.col("t") - (F.col("t") % F.lit(int(t_crit)))).alias("tb"))
    tb = tc.select(
        F.col("id").alias("id_b"), F.col("t").alias("t_b"),
        F.explode(F.array(F.lit(-int(t_crit)), F.lit(0), F.lit(int(t_crit)))).alias("o"),
        F.col("tb").alias("tbb"),
    ).select("id_b", "t_b", (F.col("tbb") + F.col("o")).alias("tb"))
    tm = (
        tc.join(tb, "tb")
        .filter(F.col("id") < F.col("id_b"))
        .filter(F.abs(F.col("t") - F.col("t_b")) <= t_crit)
        .agg(F.count("*").cast("long").alias("n_time"))
    )
    n1 = base.agg(F.count("*").cast("long").alias("n"))
    out = sp.crossJoin(F.broadcast(tm)).crossJoin(F.broadcast(n1))
    npairs = F.expr("n * (n - 1) div 2")  # exact bigint (n*(n-1) even)
    expected = (
        F.col("n_space").cast("double") * F.col("n_time").cast("double") / npairs.cast("double")
    )
    return out.select(
        "n",
        npairs.alias("n_pairs"),
        "n_space",
        "n_time",
        "x_st",
        (F.col("x_st").cast("double") / expected).alias("knox_ratio"),
    )


def theil_sen(
    series: DataFrame,
    keys: list[str],
    t_col: str = "t",
    v_col: str = "x",
) -> DataFrame:
    """Theil–Sen slope per key group — the robust trend MAGNITUDE
    estimator that pairs with mann_kendall's direction test: the lower
    median of all pairwise slopes (v_j - v_i)/(t_j - t_i), t_j > t_i.

    Scale shape: the pair set is a self equi-join on the group key,
    bounded by the calendar (a daily series of D days gives D(D-1)/2
    pairs per group — never |rows|² across groups); median selection is
    one window rank, no driver-side sorting. Slopes are single exact
    IEEE divisions of integer deltas, ordered with full deterministic
    tie-breaks (slope, dv, dt, t1), so the selected median is
    bit-reproducible across engines.
    """
    a = series.select(*keys, F.col(t_col).alias("t1"), F.col(v_col).alias("v1"))
    b = series.select(
        *[F.col(k).alias(f"__{k}") for k in keys],
        F.col(t_col).alias("t2"),
        F.col(v_col).alias("v2"),
    )
    cond = [F.col(k) == F.col(f"__{k}") for k in keys]
    p = (
        a.join(b, cond)
        .filter(F.col("t2") > F.col("t1"))
        .select(
            *keys,
            (F.col("v2") - F.col("v1")).cast("long").alias("dv"),
            (F.col("t2") - F.col("t1")).cast("long").alias("dt"),
            "t1",
        )
        .withColumn("slope", F.col("dv").cast("double") / F.col("dt").cast("double"))
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy(*keys).orderBy("slope", "dv", "dt", "t1")
    cw = W.partitionBy(*keys)
    r = p.select(
        *keys,
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(cw).alias("cnt"),
    )
    return r.filter(
        F.col("rn") == F.floor((F.col("cnt") + 1) / F.lit(2)).cast("int")
    ).select(*keys, F.col("cnt").cast("long").alias("n_pairs"), F.col("slope").alias("sen_slope"))


def semivariogram(
    pts: DataFrame,
    bin_edges_mdeg: list[int],
    lat_col: str = "la",
    lon_col: str = "lo",
    id_col: str = "id",
    val_col: str = "v",
) -> DataFrame:
    """Empirical (Matheron) semivariogram of a point-attached value at
    the given distance bins (planar milli-degree ticks):

        γ̂(bin) = Σ_{pairs in bin} (v_i − v_j)² / (2 · |pairs in bin|)

    — the spatial-continuity diagnostic that tells you the range/sill
    to feed IDW/kriging-style interpolators (the repo ships IDW; this
    is how a user picks its radius).

    Scale shape: identical to :func:`ripleys_k` — NEVER the all-pairs
    θ-join. Points land in cells as wide as max(bin), every unordered
    candidate pair appears exactly once via the 3×3 offset-explode
    equi-join + id_a < id_b, and ALL bins share that one join; binning
    is a CASE over exact integer d². Values must be exact integer
    ticks; (v_i−v_j)² is summed in DECIMAL(38,0) (cents² per pair can
    reach ~1e12; a 10^12-pair bin would wrap bigint), γ̂ is the only
    double, computed from the same integers in the same textual order
    as the oracle."""
    rmax = max(bin_edges_mdeg)
    la, lo = F.col(lat_col), F.col(lon_col)
    cells = pts.select(
        F.col(id_col).alias("id"),
        la.alias("la"),
        lo.alias("lo"),
        F.col(val_col).alias("v"),
        F.floor(la / F.lit(float(rmax))).cast("long").alias("cx"),
        F.floor(lo / F.lit(float(rmax))).cast("long").alias("cy"),
    )
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    b = cells.select(
        F.col("id").alias("id_b"),
        F.col("la").alias("la_b"),
        F.col("lo").alias("lo_b"),
        F.col("v").alias("v_b"),
        F.explode(
            F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in offsets])
        ).alias("o"),
        F.col("cx").alias("bcx"),
        F.col("cy").alias("bcy"),
    ).select(
        "id_b",
        "la_b",
        "lo_b",
        "v_b",
        (F.col("bcx") + F.col("o.dx")).alias("cx"),
        (F.col("bcy") + F.col("o.dy")).alias("cy"),
    )
    d2 = (
        (F.col("la") - F.col("la_b")) * (F.col("la") - F.col("la_b"))
        + (F.col("lo") - F.col("lo_b")) * (F.col("lo") - F.col("lo_b"))
    )
    edges = sorted(bin_edges_mdeg)
    bin_expr = F.when(F.col("d2") <= edges[0] * edges[0], F.lit(edges[0]).cast("long"))
    for lo_e, hi_e in zip(edges, edges[1:]):
        bin_expr = bin_expr.when(
            (F.col("d2") > lo_e * lo_e) & (F.col("d2") <= hi_e * hi_e),
            F.lit(hi_e).cast("long"),
        )
    cand = (
        cells.join(b, ["cx", "cy"])
        .filter(F.col("id") < F.col("id_b"))
        .select(
            d2.alias("d2"),
            ((F.col("v") - F.col("v_b")) * (F.col("v") - F.col("v_b")))
            .cast("decimal(38,0)")
            .alias("dv2"),
        )
        .filter((F.col("d2") > 0) & (F.col("d2") <= rmax * rmax))
        .select(bin_expr.alias("r_mdeg"), "dv2")
    )
    agg = cand.groupBy("r_mdeg").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("dv2").cast("decimal(38,0)").alias("sum_dv2"),
    )
    return agg.select(
        "r_mdeg",
        "n_pairs",
        F.col("sum_dv2").cast("double").alias("sum_dv2"),
        (
            F.col("sum_dv2").cast("double")
            / (F.lit(2.0) * F.col("n_pairs").cast("double"))
        ).alias("gamma"),
    )


def bivariate_moran(cells: DataFrame, x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Bivariate Moran's I — spatial CROSS-correlation between two
    lattice variables ("is MY density next to YOUR wealth?"):

        I_xy = (n / W) · Σ_ij w_ij devx_i · devy_j
                       / sqrt(Σ devx²) / sqrt(Σ devy²)

    with the same rook offset-explode equi-join as :func:`morans_i`
    (never a θ-join) and the same n·v − S exact-deviation trick. The
    second variable's magnitude (e.g. money in cents) pushes deviation
    products past int64, so num and both moments ride in DECIMAL(38,0)
    (HUGEINT on the oracle side — the chisq wrap lesson); the index is
    the only double, computed from the same five scalars in the same
    textual order both engines."""
    dec = "decimal(38,0)"
    stats = cells.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x_col).cast("long").alias("sx"),
        F.sum(y_col).cast("long").alias("sy"),
    )
    dev = cells.crossJoin(F.broadcast(stats)).select(
        "gx",
        "gy",
        "n",
        (F.col("n").cast(dec) * F.col(x_col).cast(dec) - F.col("sx").cast(dec)).alias("devx"),
        (F.col("n").cast(dec) * F.col(y_col).cast(dec) - F.col("sy").cast(dec)).alias("devy"),
    )
    shifted = dev.select(
        "gx",
        "gy",
        "devy",
        F.explode(
            F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in ROOK_OFFSETS])
        ).alias("o"),
    ).select(
        (F.col("gx") + F.col("o.dx")).alias("gx"),
        (F.col("gy") + F.col("o.dy")).alias("gy"),
        F.col("devy").alias("devy_j"),
    )
    pairs = dev.join(shifted, ["gx", "gy"]).select("n", "devx", "devy_j")
    agg = pairs.agg(
        F.first("n").alias("n_cells"),
        F.count("*").cast("long").alias("w_links"),
        F.sum(F.col("devx") * F.col("devy_j")).cast(dec).alias("num"),
    )
    mom = dev.agg(
        F.sum(F.col("devx") * F.col("devx")).cast(dec).alias("mxx"),
        F.sum(F.col("devy") * F.col("devy")).cast(dec).alias("myy"),
    )
    out = agg.crossJoin(F.broadcast(mom))
    return out.select(
        "n_cells",
        "w_links",
        F.col("num").cast("double").alias("num"),
        F.col("mxx").cast("double").alias("mxx"),
        F.col("myy").cast("double").alias("myy"),
        (
            (F.col("n_cells").cast("double") / F.col("w_links").cast("double"))
            * F.col("num").cast("double")
            / F.sqrt(F.col("mxx").cast("double"))
            / F.sqrt(F.col("myy").cast("double"))
        ).alias("moran_ixy"),
    )


def cross_k(
    pts_a: DataFrame,
    pts_b: DataFrame,
    radii_mdeg: list[int],
    area_mdeg2: float,
    lat_col: str = "la",
    lon_col: str = "lo",
) -> DataFrame:
    """Bivariate (cross-type) Ripley's K between two point sets at the
    given radii (planar milli-degree ticks, no edge correction):

        K̂_AB(r) = A · |{(a, b): d²_ab ≤ r²}| / (n_a · n_b)

    K̂_AB above π·r² means type-B points cluster AROUND type-A points
    (attraction); below means repulsion — the standard screen for
    spatial association between two event types (crime/amenity,
    click/purchase) that the univariate K (ripleys_k above) cannot see.

    Scale shape, identical to ripleys_k: the A side buckets into cells
    as wide as max(r); the B side offset-explodes its 3×3 neighborhood
    and equi-joins on the cell key, so candidates are bounded by local
    density and the all-pairs θ-join never plans. Unlike the
    univariate case there is no i<j dedup and d²=0 is a legitimate
    cross-type coincidence, so every (a, b) candidate counts once with
    d² ≤ r². All radii share the one join (conditional sums in a
    single aggregate); distances are exact integer ticks, K̂ the only
    double, computed in the same textual order as the oracle."""
    rmax = max(radii_mdeg)
    la, lo = F.col(lat_col), F.col(lon_col)

    def _cells(df: DataFrame, suffix: str) -> DataFrame:
        return df.select(
            F.col(lat_col).alias(f"la{suffix}"),
            F.col(lon_col).alias(f"lo{suffix}"),
            F.floor(F.col(lat_col) / F.lit(float(rmax))).cast("long").alias("cx"),
            F.floor(F.col(lon_col) / F.lit(float(rmax))).cast("long").alias("cy"),
        )

    a = _cells(pts_a, "_a")
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    b = _cells(pts_b, "_b").select(
        "la_b",
        "lo_b",
        F.explode(
            F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in offsets])
        ).alias("o"),
        "cx",
        "cy",
    ).select(
        "la_b",
        "lo_b",
        (F.col("cx") + F.col("o.dx")).alias("cx"),
        (F.col("cy") + F.col("o.dy")).alias("cy"),
    )
    d2 = (
        (F.col("la_a") - F.col("la_b")) * (F.col("la_a") - F.col("la_b"))
        + (F.col("lo_a") - F.col("lo_b")) * (F.col("lo_a") - F.col("lo_b"))
    )
    cand = a.join(b, ["cx", "cy"]).select(d2.alias("d2"))
    sums = cand.agg(
        *[
            F.sum(F.when(F.col("d2") <= r * r, 1).otherwise(0))
            .cast("long")
            .alias(f"n_{r}")
            for r in radii_mdeg
        ]
    )
    stack_args = ", ".join(f"{r}, n_{r}" for r in radii_mdeg)
    bands = sums.select(
        F.expr(f"stack({len(radii_mdeg)}, {stack_args}) AS (r_mdeg, n_pairs)")
    )
    counts = pts_a.agg(F.count("*").cast("long").alias("n_a")).crossJoin(
        F.broadcast(pts_b.agg(F.count("*").cast("long").alias("n_b")))
    )
    return bands.crossJoin(F.broadcast(counts)).select(
        F.col("r_mdeg").cast("long").alias("r_mdeg"),
        "n_pairs",
        (
            F.lit(float(area_mdeg2))
            * F.col("n_pairs").cast("double")
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        ).alias("k_ab"),
    )
