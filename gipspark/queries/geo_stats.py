"""Registry family: geo_stats (split from the single-file registry; query names and behavior unchanged)."""

from __future__ import annotations

from gipspark.queries._base import (  # noqa: F401
    C,
    DataFrame,
    F,
    HAVERSINE_SQL,
    Window,
    _LAT,
    _LON,
    _cust_pts,
    colocation_sql,
    knn_join,
    load,
    register,
    table_rows,
)
from gipspark.queries._shared import (  # noqa: F401
    _EH_GRID,
    _GFN_R_M,
    _KNOX_S,
    _KNOX_T,
    _MORAN_GRID,
    _QUADRAT_DEG,
    _QUADRAT_N,
    _RIPLEY_AREA,
    _RIPLEY_R,
    _VARIO_BINS,
    _XK_AREA,
    _XK_R,
)



@register(
    "colocation_pairs_events",
    (
        f"""
WITH pts AS (
  SELECT user_id, ts, {_LAT.format(k='event_id')} AS lat, {_LON.format(k='event_id')} AS lon
  FROM events
),"""
        + colocation_sql("pts")
    ),
)
def colocation_pairs_events(spark, sf_dir):
    """Spatio-temporal co-location ("contact") join: user pairs seen in
    the same 10° cell within the same 6 h bucket. distinct-occupancy →
    self equi-join on (cell, bucket) — candidate output bounded by
    per-slot occupancy, never |fixes|² (operators/colocation.py)."""
    from gipspark.operators.colocation import colocation_pairs

    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "ts",
        C.derived_lat(F.col("event_id")).alias("lat"),
        C.derived_lon(F.col("event_id")).alias("lon"),
    )
    return colocation_pairs(pts)



@register(
    "local_moran_hotspots",
    f"""
WITH pts AS (
  SELECT {_LAT.format(k='c_custkey')} AS lat, {_LON.format(k='c_custkey')} AS lon
  FROM customer
), cells AS (
  SELECT cast(floor((lon + 180.0) / {_MORAN_GRID}) as int) AS gx,
         cast(floor((90.0 - lat) / {_MORAN_GRID}) as int) AS gy,
         count(*) AS x
  FROM pts GROUP BY gx, gy
), st AS (
  SELECT count(*) AS n, cast(sum(x) as bigint) AS s FROM cells
), dev AS (
  SELECT gx, gy, x, (st.n * x - st.s) AS dev FROM cells, st
), nbr AS (
  SELECT a.gx, a.gy, cast(sum(b.dev) as bigint) AS nbr_sum
  FROM dev a JOIN dev b ON (abs(a.gx - b.gx) + abs(a.gy - b.gy)) = 1
  GROUP BY a.gx, a.gy
)
SELECT d.gx, d.gy, cast(d.x as bigint) AS x, cast(d.dev as bigint) AS dev,
       cast(coalesce(n.nbr_sum, 0) as bigint) AS nbr_sum,
       cast(d.dev * coalesce(n.nbr_sum, 0) as bigint) AS li_num
FROM dev d LEFT JOIN nbr n ON n.gx = d.gx AND n.gy = d.gy
""",
)
def local_moran_hotspots(spark, sf_dir):
    """Local Moran (LISA) per cell — the hotspot/coldspot map behind
    the global index: li_num = dev · Σ neighbor devs, positive where a
    cell sits in a like-valued cluster. Pure bigint end to end
    (operators/morans.py local_moran); the map a GIS would color."""
    from gipspark.operators.morans import cell_counts, local_moran

    pts = load(spark, sf_dir, "customer").select(
        C.derived_lat(F.col("c_custkey")).alias("lat"),
        C.derived_lon(F.col("c_custkey")).alias("lon"),
    )
    return local_moran(cell_counts(pts, _MORAN_GRID))



# ---------------------------------------------------------------------------
# round-3 batch: Gi* hotspots, Mann–Kendall trends, substring-span dedup
# ---------------------------------------------------------------------------


@register(
    "gi_star_hotspots",
    f"""
WITH pts AS (
  SELECT {_LAT.format(k='c_custkey')} AS lat, {_LON.format(k='c_custkey')} AS lon
  FROM customer
), cells AS (
  SELECT cast(floor((lon + 180.0) / {_MORAN_GRID}) as int) AS gx,
         cast(floor((90.0 - lat) / {_MORAN_GRID}) as int) AS gy,
         cast(count(*) as bigint) AS x
  FROM pts GROUP BY gx, gy
), st AS (
  SELECT count(*) AS n, cast(sum(x) as bigint) AS s, cast(sum(x * x) as bigint) AS sx2
  FROM cells
), nbr AS (
  SELECT a.gx, a.gy, cast(count(*) as bigint) AS wi, cast(sum(b.x) as bigint) AS gsum
  FROM cells a JOIN cells b ON (abs(a.gx - b.gx) + abs(a.gy - b.gy)) <= 1
  GROUP BY a.gx, a.gy
)
SELECT c.gx, c.gy, c.x, n.wi, n.gsum,
       cast(st.n * n.gsum - n.wi * st.s as bigint) AS num,
       cast(n.wi * (st.n - n.wi) as bigint) AS d2,
       cast(st.n * n.gsum - n.wi * st.s as double)
         / sqrt(cast(cast(st.n as hugeint) * st.sx2 - cast(st.s as hugeint) * st.s as double)
                * cast(n.wi * (st.n - n.wi) as double)
                / cast(st.n - 1 as double)) AS gi_star
FROM cells c JOIN nbr n ON n.gx = c.gx AND n.gy = c.gy, st
""",
)
def gi_star_hotspots(spark, sf_dir):
    """Getis–Ord Gi* z-scores over the 15° customer-density lattice —
    the hotspot map GIS tooling draws next to the LISA one
    (operators/morans.py getis_ord_star). Binary rook weights including
    self; num/d2 exact bigints, the Σx²-scale moment in DECIMAL(38,0)
    (HUGEINT on the oracle side, the chisq ADVICE lesson applied up
    front), the z-score the only double — same textual order both
    engines."""
    from gipspark.operators.morans import cell_counts, getis_ord_star

    pts = load(spark, sf_dir, "customer").select(
        C.derived_lat(F.col("c_custkey")).alias("lat"),
        C.derived_lon(F.col("c_custkey")).alias("lon"),
    )
    return getis_ord_star(cell_counts(pts, _MORAN_GRID))



@register(
    "ripleys_k_customers",
    # oracle is the bounded brute force (customer is dim-sized at the
    # oracle SF); the engine side uses the 3×3 cell-offset prefilter
    f"""
WITH pts AS (
  SELECT c_custkey AS id,
         (cast(c_custkey as bigint) * {C.LAT_MUL}) % {C.LAT_MOD} - 60000 AS la,
         (cast(c_custkey as bigint) * {C.LON_MUL}) % {C.LON_MOD} - 180000 AS lo
  FROM customer
), st AS (SELECT cast(count(*) as bigint) AS n FROM pts),
d AS (
  SELECT (a.la - b.la) * (a.la - b.la) + (a.lo - b.lo) * (a.lo - b.lo) AS d2
  FROM pts a JOIN pts b ON a.id < b.id
), agg AS (
  SELECT {', '.join(f"cast(sum(CASE WHEN d2 > 0 AND d2 <= {r * r} THEN 1 ELSE 0 END) as bigint) AS n_{r}" for r in _RIPLEY_R)}
  FROM d
), bands AS (
  {' UNION ALL '.join(f"SELECT cast({r} as bigint) AS r_mdeg, n_{r} AS n_pairs FROM agg" for r in _RIPLEY_R)}
)
SELECT b.r_mdeg, b.n_pairs,
       {_RIPLEY_AREA!r} * cast(2 * b.n_pairs as double)
         / (cast(st.n as double) * cast(st.n as double)) AS k_hat
FROM bands b, st
""",
)
def ripleys_k_customers(spark, sf_dir):
    """Ripley's K point-pattern statistic over the customer cloud at
    three radii (no edge correction): is the pattern clustered or
    dispersed vs CSR? Engine side never does the all-pairs θ-join —
    points bucket into max(r)-wide cells, candidates come from one 3×3
    offset-explode equi-join shared by ALL radii, and distances are
    exact integer milli-degree ticks (operators/morans.py ripleys_k).
    The oracle is the bounded brute force."""
    from gipspark.operators.morans import ripleys_k

    pts = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey").cast("long") * F.lit(C.LAT_MUL)) % F.lit(C.LAT_MOD) - F.lit(60000)).alias("la"),
        ((F.col("c_custkey").cast("long") * F.lit(C.LON_MUL)) % F.lit(C.LON_MOD) - F.lit(180000)).alias("lo"),
    )
    return ripleys_k(pts, _RIPLEY_R, _RIPLEY_AREA)



@register(
    "knox_space_time",
    f"""
WITH pts AS (
  SELECT event_id AS id,
         (cast(event_id as bigint) * {C.LAT_MUL}) % {C.LAT_MOD} - 60000 AS la,
         (cast(event_id as bigint) * {C.LON_MUL}) % {C.LON_MOD} - 180000 AS lo,
         epoch_us(ts) // 1000000 AS t
  FROM events WHERE event_type = 'click'
), p AS (
  SELECT (a.la-b.la)*(a.la-b.la) + (a.lo-b.lo)*(a.lo-b.lo) AS d2,
         abs(a.t - b.t) AS dt
  FROM pts a JOIN pts b ON a.id < b.id
), agg AS (
  SELECT cast(sum(CASE WHEN d2 <= {_KNOX_S * _KNOX_S} THEN 1 ELSE 0 END) as bigint) AS n_space,
         cast(sum(CASE WHEN dt <= {_KNOX_T} THEN 1 ELSE 0 END) as bigint) AS n_time,
         cast(sum(CASE WHEN d2 <= {_KNOX_S * _KNOX_S} AND dt <= {_KNOX_T} THEN 1 ELSE 0 END) as bigint) AS x_st
  FROM p
), st AS (SELECT cast(count(*) as bigint) AS n FROM pts)
SELECT st.n AS n, st.n * (st.n - 1) // 2 AS n_pairs, agg.n_space, agg.n_time, agg.x_st,
       cast(agg.x_st as double)
         / (cast(agg.n_space as double) * cast(agg.n_time as double)
            / cast(st.n * (st.n - 1) // 2 as double)) AS knox_ratio
FROM agg, st
""",
)
def knox_space_time(spark, sf_dir):
    """Knox space-time interaction test over click events: are events
    that are close in space ALSO close in time (epidemic/burst
    signature)? X, Ns from one 3×3 s-cell offset join; Nt from the same
    trick in 1-D (τ-wide time buckets, 3-offset explode) — never the
    all-pairs θ-join (operators/morans.py knox_test). Counts exact
    bigints; the oracle is the bounded brute force over the click
    subset."""
    from gipspark.operators.morans import knox_test

    pts = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("id"),
            ((F.col("event_id").cast("long") * F.lit(C.LAT_MUL)) % F.lit(C.LAT_MOD) - F.lit(60000)).alias("la"),
            ((F.col("event_id").cast("long") * F.lit(C.LON_MUL)) % F.lit(C.LON_MOD) - F.lit(180000)).alias("lo"),
            F.unix_timestamp("ts").alias("t"),
        )
    )
    return knox_test(pts, s_crit=_KNOX_S, t_crit=_KNOX_T)



# ---------------------------------------------------------------------------
# round-3 batch: join-count statistics + PMI collocations
# ---------------------------------------------------------------------------


@register(
    "join_count_stats",
    f"""
WITH pts AS (
  SELECT {_LAT.format(k='c_custkey')} AS lat, {_LON.format(k='c_custkey')} AS lon
  FROM customer
), cells AS (
  SELECT cast(floor((lon + 180.0) / {_MORAN_GRID}) as int) AS gx,
         cast(floor((90.0 - lat) / {_MORAN_GRID}) as int) AS gy,
         cast(count(*) as bigint) AS x
  FROM pts GROUP BY gx, gy
), st AS (
  SELECT cast(count(*) as bigint) AS n, cast(sum(x) as bigint) AS s FROM cells
), m AS (
  SELECT gx, gy, cast(st.n * x > st.s as int) AS blk FROM cells, st
), p AS (
  SELECT a.blk AS blk, b.blk AS blk_j
  FROM m a JOIN m b ON (abs(a.gx - b.gx) + abs(a.gy - b.gy)) = 1
), agg AS (
  SELECT cast(count(*) // 2 as bigint) AS w_links,
         cast(sum(blk * blk_j) // 2 as bigint) AS j_bb,
         cast(sum((1 - blk) * (1 - blk_j)) // 2 as bigint) AS j_ww,
         cast(sum(blk + blk_j - 2 * blk * blk_j) // 2 as bigint) AS j_bw
  FROM p
), nb AS (SELECT cast(sum(blk) as bigint) AS n_black FROM m)
SELECT st.n AS n_cells, nb.n_black, agg.w_links, agg.j_bb, agg.j_ww, agg.j_bw,
       cast(agg.w_links as double) * cast(nb.n_black as double)
         * (cast(nb.n_black as double) - 1.0)
         / (cast(st.n as double) * (cast(st.n as double) - 1.0)) AS e_bb,
       2.0 * cast(agg.w_links as double) * cast(nb.n_black as double)
         * (cast(st.n as double) - cast(nb.n_black as double))
         / (cast(st.n as double) * (cast(st.n as double) - 1.0)) AS e_bw
FROM agg, st, nb
""",
)
def join_count_stats(spark, sf_dir):
    """Join-count statistics over the 15° customer-density lattice —
    the categorical spatial-autocorrelation test (BB/WW/BW rook-pair
    counts vs their nonfree-sampling expectations) that complements
    Moran's I when the signal is a binary marker (here: above-mean
    density). Same offset-explode rook equi-join scale shape as the
    whole lattice family (operators/morans.py join_counts): shuffle
    O(cells), two 1-row broadcast moments, exact bigint pair counts
    halved with div 2, expectations the only doubles (fixed textual
    order both engines)."""
    from gipspark.operators.morans import cell_counts, join_counts

    pts = load(spark, sf_dir, "customer").select(
        C.derived_lat(F.col("c_custkey")).alias("lat"),
        C.derived_lon(F.col("c_custkey")).alias("lon"),
    )
    return join_counts(cell_counts(pts, _MORAN_GRID))



@register(
    "semivariogram_customers",
    # oracle is the bounded brute force (customer is dim-sized at the
    # oracle SF); the engine side shares Ripley's 3×3 cell-offset
    # prefilter. Value = acctbal in exact integer cents.
    f"""
WITH pts AS (
  SELECT c_custkey AS id,
         (cast(c_custkey as bigint) * {C.LAT_MUL}) % {C.LAT_MOD} - 60000 AS la,
         (cast(c_custkey as bigint) * {C.LON_MUL}) % {C.LON_MOD} - 180000 AS lo,
         cast(round(c_acctbal * 100) as bigint) AS v
  FROM customer
), pr AS (
  SELECT (a.la - b.la) * (a.la - b.la) + (a.lo - b.lo) * (a.lo - b.lo) AS d2,
         cast((a.v - b.v) as hugeint) * cast((a.v - b.v) as hugeint) AS dv2
  FROM pts a JOIN pts b ON a.id < b.id
), binned AS (
  SELECT CASE
           WHEN d2 <= {_VARIO_BINS[0] ** 2} THEN cast({_VARIO_BINS[0]} as bigint)
           WHEN d2 <= {_VARIO_BINS[1] ** 2} THEN cast({_VARIO_BINS[1]} as bigint)
           ELSE cast({_VARIO_BINS[2]} as bigint)
         END AS r_mdeg, dv2
  FROM pr WHERE d2 > 0 AND d2 <= {_VARIO_BINS[2] ** 2}
)
SELECT r_mdeg,
       cast(count(*) as bigint) AS n_pairs,
       cast(sum(dv2) as double) AS sum_dv2,
       cast(sum(dv2) as double) / (2.0 * cast(count(*) as double)) AS gamma
FROM binned GROUP BY r_mdeg
""",
)
def semivariogram_customers(spark, sf_dir):
    """Empirical semivariogram of customer account balance over the
    point cloud at three distance bins — the spatial-continuity curve
    (nugget/range/sill) a user reads to pick the IDW/kriging radius;
    the natural companion to idw_interpolate_probes. Engine side never
    does the all-pairs θ-join: the 3×3 max-bin cell-offset equi-join
    from the Ripley machinery yields every candidate pair once, exact
    integer mdeg ticks and cents keep pair sums bit-exact
    (operators/morans.py semivariogram), DECIMAL(38,0)/HUGEINT for the
    squared-diff sums, γ̂ the only double. Oracle is the bounded brute
    force."""
    from gipspark.operators.morans import semivariogram

    pts = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey").cast("long") * F.lit(C.LAT_MUL)) % F.lit(C.LAT_MOD) - F.lit(60000)).alias("la"),
        ((F.col("c_custkey").cast("long") * F.lit(C.LON_MUL)) % F.lit(C.LON_MOD) - F.lit(180000)).alias("lo"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("v"),
    )
    return semivariogram(pts, _VARIO_BINS)



@register(
    "clq_colocation_segments",
    # colocation quotient CLQ(A→B) = (C_AB/N_A) / (N'_B/(N−1)) over
    # nearest-neighbor pairs — rearranged to the single exact division
    # C_AB·(N−1) / (N_A·N'_B). Oracle replays the brute-force NN.
    f"""
WITH p AS (SELECT c_custkey AS id, c_mktsegment AS seg,
                  {_LAT.format(k='c_custkey')} AS lat, {_LON.format(k='c_custkey')} AS lon
           FROM customer),
d AS (SELECT a.id AS q_id, a.seg AS seg_a, b.id AS p_id, b.seg AS seg_b,
             {HAVERSINE_SQL.format(lat1='a.lat', lon1='a.lon', lat2='b.lat', lon2='b.lon')} AS dist_m
      FROM p a JOIN p b ON a.id <> b.id),
r AS (SELECT q_id, seg_a, seg_b,
             row_number() OVER (PARTITION BY q_id ORDER BY dist_m ASC, p_id ASC) AS rn
      FROM d),
c AS (SELECT seg_a, seg_b, cast(count(*) as bigint) AS n_pairs FROM r WHERE rn = 1 GROUP BY seg_a, seg_b),
sn AS (SELECT seg, cast(count(*) as bigint) AS n_seg, sum(cast(count(*) as bigint)) OVER () AS n_all
       FROM p GROUP BY seg)
SELECT c.seg_a, c.seg_b, c.n_pairs,
       cast(c.n_pairs * (sa.n_all - 1) as double)
         / cast(sa.n_seg * (CASE WHEN c.seg_a = c.seg_b THEN sb.n_seg - 1 ELSE sb.n_seg END) as double) AS clq
FROM c
JOIN sn sa ON sa.seg = c.seg_a
JOIN sn sb ON sb.seg = c.seg_b
""",
)
def clq_colocation_segments(spark, sf_dir):
    """Colocation quotient between market segments over the customer
    point cloud: for each ordered category pair (A→B), how over- or
    under-represented B is among A's nearest neighbors, vs the CSR
    expectation — the categorical spatial-association statistic that
    complements join_count_stats (which needs a lattice; CLQ works on
    raw points). Nearest neighbors reuse the exact k-ring kNN join
    (k=2, self excluded — the clark_evans machinery); the quotient is
    rearranged to ONE exact division C_AB·(N−1)/(N_A·N'_B) with the
    own-category correction N'_B = N_B−1 when A=B.

    Scale shape: candidate-bounded kNN (never all-pairs), one
    (seg,seg) hash-agg, then category-cardinality joins; the corpus
    total rides an unpartitioned window over the 5-row category table
    (no 1-row broadcast)."""
    pts = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("p_id"),
        F.col("c_mktsegment").alias("seg"),
        C.derived_lat(F.col("c_custkey")).alias("p_lat"),
        C.derived_lon(F.col("c_custkey")).alias("p_lon"),
    )
    qs = pts.select(
        F.col("p_id").alias("q_id"),
        F.col("seg").alias("seg_a"),
        F.col("p_lat").alias("q_lat"),
        F.col("p_lon").alias("q_lon"),
    )
    nn = (
        knn_join(
            qs.select("q_id", "q_lat", "q_lon"),
            pts.select("p_id", "p_lat", "p_lon"),
            k=2,
            n_points_hint=table_rows(sf_dir, "customer"),
        )
        .filter(F.col("p_id") != F.col("q_id"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(F.col("dist_m").asc(), F.col("p_id").asc())
            ),
        )
        .filter(F.col("rn") == 1)
        .select("q_id", "p_id")
    )
    pairs = (
        nn.join(qs.select("q_id", "seg_a"), "q_id")
        .join(pts.select("p_id", F.col("seg").alias("seg_b")), "p_id")
        .groupBy("seg_a", "seg_b")
        .agg(F.count("*").cast("long").alias("n_pairs"))
    )
    sn = (
        pts.groupBy("seg")
        .agg(F.count("*").cast("long").alias("n_seg"))
        .withColumn("n_all", F.sum("n_seg").over(Window.partitionBy()))
    )
    sa = sn.select(F.col("seg").alias("seg_a"), F.col("n_seg").alias("na"), "n_all")
    sb = sn.select(F.col("seg").alias("seg_b"), F.col("n_seg").alias("nb"))
    out = pairs.join(F.broadcast(sa), "seg_a").join(F.broadcast(sb), "seg_b")
    nb_eff = F.when(F.col("seg_a") == F.col("seg_b"), F.col("nb") - 1).otherwise(F.col("nb"))
    return out.select(
        "seg_a",
        "seg_b",
        "n_pairs",
        (
            (F.col("n_pairs") * (F.col("n_all") - 1)).cast("double")
            / (F.col("na") * nb_eff).cast("double")
        ).alias("clq"),
    )



@register(
    "quadrat_vmr_customers",
    # quadrat analysis over the FIXED world frame of 15° quadrats:
    # empty quadrats count (they carry the dispersion signal), but are
    # never materialized — their contribution to the moments is pure
    # arithmetic (zeros add nothing to S and Σx²; only N_q changes).
    # VMR and the chi-square index are exact rationals over bigints.
    f"""
WITH pts AS (
  SELECT {_LAT.format(k='c_custkey')} AS lat, {_LON.format(k='c_custkey')} AS lon FROM customer
), c AS (
  SELECT cast(floor((lon + 180.0) / {_QUADRAT_DEG}) as int) AS gx,
         cast(floor((90.0 - lat) / {_QUADRAT_DEG}) as int) AS gy,
         cast(count(*) as bigint) AS x
  FROM pts GROUP BY gx, gy
)
SELECT cast({_QUADRAT_N} as bigint) AS n_quadrats,
       cast(count(*) as bigint) AS n_occupied,
       cast(sum(x) as bigint) AS n_points,
       cast(sum(cast(x as hugeint) * cast(x as hugeint)) as bigint) AS sumsq,
       cast({_QUADRAT_N} * sum(cast(x as hugeint) * cast(x as hugeint))
            - cast(sum(x) as hugeint) * cast(sum(x) as hugeint) as double)
         / cast(({_QUADRAT_N} - 1) * cast(sum(x) as hugeint) as double) AS vmr
FROM c
""",
)
def quadrat_vmr_customers(spark, sf_dir):
    """Quadrat analysis (variance-to-mean ratio of quadrat counts) over
    the fixed world frame of 15° quadrats — the third classic
    point-pattern test beside Clark–Evans (NN-distance) and Ripley's K
    (multi-scale): VMR > 1 clustered, ≈ 1 CSR, < 1 dispersed. Empty
    quadrats matter and are counted WITHOUT being materialized: zeros
    contribute nothing to Σx or Σx², so the fixed frame size enters the
    moments as a literal — no calendar-style dense grid ever exists.
    VMR = (N_q·Σx² − S²)/((N_q−1)·S) is one exact rational with
    HUGEINT/DECIMAL moments; one cell hash-agg over the big table."""
    dec = "decimal(38,0)"
    pts = _cust_pts(spark, sf_dir)
    c = pts.groupBy(
        F.floor((F.col("lon") + 180.0) / F.lit(_QUADRAT_DEG)).cast("int").alias("gx"),
        F.floor((90.0 - F.col("lat")) / F.lit(_QUADRAT_DEG)).cast("int").alias("gy"),
    ).agg(F.count("*").cast("long").alias("x"))
    nq = F.lit(_QUADRAT_N).cast(dec)
    s = F.sum("x").cast(dec)
    sq = F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).cast(dec)
    return c.agg(
        F.lit(_QUADRAT_N).cast("long").alias("n_quadrats"),
        F.count("*").cast("long").alias("n_occupied"),
        F.sum("x").cast("long").alias("n_points"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).cast("long").alias("sumsq"),
        ((nq * sq - s * s).cast("double") / ((nq - 1) * s).cast("double")).alias("vmr"),
    )



@register(
    "cross_k_events",
    # oracle is the bounded brute force (each type is ~2k rows at the
    # oracle SF); the engine side shares ONE 3x3 cell-offset join
    # across all radii and never plans the all-pairs theta-join
    f"""
WITH a AS (
  SELECT (cast(event_id as bigint) * {C.LAT_MUL}) % {C.LAT_MOD} - 60000 AS la,
         (cast(event_id as bigint) * {C.LON_MUL}) % {C.LON_MOD} - 180000 AS lo
  FROM events WHERE event_type = 'click'
), b AS (
  SELECT (cast(event_id as bigint) * {C.LAT_MUL}) % {C.LAT_MOD} - 60000 AS la,
         (cast(event_id as bigint) * {C.LON_MUL}) % {C.LON_MOD} - 180000 AS lo
  FROM events WHERE event_type = 'purchase'
), st AS (
  SELECT (SELECT cast(count(*) as bigint) FROM a) AS n_a,
         (SELECT cast(count(*) as bigint) FROM b) AS n_b
), d AS (
  SELECT (a.la - b.la) * (a.la - b.la) + (a.lo - b.lo) * (a.lo - b.lo) AS d2
  FROM a, b
), agg AS (
  SELECT {', '.join(f"cast(sum(CASE WHEN d2 <= {r * r} THEN 1 ELSE 0 END) as bigint) AS n_{r}" for r in _XK_R)}
  FROM d
), bands AS (
  {' UNION ALL '.join(f"SELECT cast({r} as bigint) AS r_mdeg, n_{r} AS n_pairs FROM agg" for r in _XK_R)}
)
SELECT b.r_mdeg, b.n_pairs,
       {_XK_AREA!r} * cast(b.n_pairs as double)
         / (cast(st.n_a as double) * cast(st.n_b as double)) AS k_ab
FROM bands b, st
""",
)
def cross_k_events(spark, sf_dir):
    """Bivariate (cross-type) Ripley's K between click and purchase
    events at three radii: do purchases cluster around clicks beyond
    what independent CSR placement predicts? Engine side reuses the
    ripleys_k machinery (operators/morans.py cross_k): the A side
    buckets into max(r)-wide cells, the B side offset-explodes its 3x3
    neighborhood, one equi-join on the cell key feeds ALL radii as
    conditional sums in a single aggregate. Distances are exact integer
    milli-degree ticks; K-hat is the only double. The oracle is the
    bounded brute force over the two type slices."""
    from gipspark.operators.morans import cross_k

    ev = load(spark, sf_dir, "events")

    def pts(t: str) -> DataFrame:
        return ev.filter(F.col("event_type") == t).select(
            ((F.col("event_id").cast("long") * F.lit(C.LAT_MUL)) % F.lit(C.LAT_MOD) - F.lit(60000)).alias("la"),
            ((F.col("event_id").cast("long") * F.lit(C.LON_MUL)) % F.lit(C.LON_MOD) - F.lit(180000)).alias("lo"),
        )

    return cross_k(pts("click"), pts("purchase"), _XK_R, _XK_AREA)



@register(
    "gfunction_customers",
    f"""
WITH p AS (SELECT c_custkey AS id, {_LAT.format(k='c_custkey')} AS lat,
                  {_LON.format(k='c_custkey')} AS lon FROM customer),
d AS (SELECT a.id,
             cast(round(min({HAVERSINE_SQL.format(lat1='a.lat', lon1='a.lon', lat2='b.lat', lon2='b.lon')}), 0) as bigint) AS nn_m
      FROM p a JOIN p b ON a.id <> b.id GROUP BY a.id),
st AS (SELECT cast(count(*) as bigint) AS n,
              {', '.join(f"cast(sum(CASE WHEN nn_m <= {r} THEN 1 ELSE 0 END) as bigint) AS n_{r}" for r in _GFN_R_M)}
       FROM d),
bands AS (
  {' UNION ALL '.join(f"SELECT cast({r} as bigint) AS r_m, n_{r} AS n_within, n FROM st" for r in _GFN_R_M)}
)
SELECT r_m, n_within,
       cast(n_within as double) / cast(n as double) AS g_hat
FROM bands ORDER BY r_m
""",
)
def gfunction_customers(spark, sf_dir):
    """G-function (nearest-neighbor distance CDF) of the customer
    cloud at three radii: Ĝ(r) = share of points whose NN lies within
    r. Read against CSR's 1−exp(−λπr²), it separates clustering (G
    rises early) from inhibition — the distributional complement to
    the scalar Clark–Evans index above, sharing its exact machinery:
    per-point NN comes from the k-ring-guaranteed kNN self-join with
    k=2 (self is rank 1 at distance 0; derived-coordinate points are
    never coincident), NN meters round to exact integer ticks, and all
    radii are conditional sums in ONE single-row aggregate unpivoted to
    bands. Ĝ is the only double. Oracle: brute min over the same
    haversine text."""
    pts = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("p_id"),
        C.derived_lat(F.col("c_custkey")).alias("p_lat"),
        C.derived_lon(F.col("c_custkey")).alias("p_lon"),
    )
    qs = pts.select(
        F.col("p_id").alias("q_id"),
        F.col("p_lat").alias("q_lat"),
        F.col("p_lon").alias("q_lon"),
    )
    nn = (
        knn_join(qs, pts, k=2, n_points_hint=table_rows(sf_dir, "customer"))
        .filter(F.col("p_id") != F.col("q_id"))
        .groupBy("q_id")
        .agg(F.round(F.min("dist_m"), 0).cast("long").alias("nn_m"))
    )
    st = nn.agg(
        F.count("*").cast("long").alias("n"),
        *[
            F.sum(F.when(F.col("nn_m") <= r, 1).otherwise(0)).cast("long").alias(f"n_{r}")
            for r in _GFN_R_M
        ],
    )
    stack_args = ", ".join(f"{r}L, n_{r}" for r in _GFN_R_M)
    bands = st.select(
        F.expr(f"stack({len(_GFN_R_M)}, {stack_args}) AS (r_m, n_within)"), "n"
    )
    return bands.select(
        "r_m",
        "n_within",
        (F.col("n_within").cast("double") / F.col("n").cast("double")).alias("g_hat"),
    ).orderBy("r_m")



@register(
    "emerging_hotspots",
    f"""
WITH pts AS (
  SELECT {_LAT.format(k='event_id')} AS lat, {_LON.format(k='event_id')} AS lon,
         epoch_us(ts) // 1000000 // 86400 AS d
  FROM events
), c AS (
  SELECT cast(floor((lon + 180.0) / {_EH_GRID}) as int) AS gx,
         cast(floor((90.0 - lat) / {_EH_GRID}) as int) AS gy,
         d, cast(count(*) as bigint) AS x
  FROM pts GROUP BY gx, gy, d
), tot AS (
  SELECT gx, gy, cast(sum(x) as bigint) AS total_x FROM c GROUP BY gx, gy
), g AS (
  SELECT cast(count(*) as bigint) AS n_cells, cast(sum(total_x) as bigint) AS grand
  FROM tot
), mk AS (
  SELECT a.gx, a.gy,
         cast(sum(CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END)
              as bigint) AS s_stat
  FROM c a JOIN c b ON a.gx = b.gx AND a.gy = b.gy AND b.d > a.d
  GROUP BY a.gx, a.gy
)
SELECT t.gx, t.gy, t.total_x,
       coalesce(mk.s_stat, 0) AS s_stat,
       cast(CASE WHEN t.total_x * g.n_cells > g.grand THEN 1 ELSE 0 END as int) AS is_hot,
       CASE WHEN t.total_x * g.n_cells > g.grand AND coalesce(mk.s_stat, 0) > 0
              THEN 'intensifying'
            WHEN t.total_x * g.n_cells > g.grand AND coalesce(mk.s_stat, 0) < 0
              THEN 'diminishing'
            WHEN t.total_x * g.n_cells > g.grand THEN 'persistent'
            WHEN coalesce(mk.s_stat, 0) > 0 THEN 'emerging'
            WHEN coalesce(mk.s_stat, 0) < 0 THEN 'receding'
            ELSE 'quiet' END AS phase
FROM tot t LEFT JOIN mk ON mk.gx = t.gx AND mk.gy = t.gy, g
""",
)
def emerging_hotspots(spark, sf_dir):
    """Space-time-cube emerging-hotspot classification (the ESRI
    composition): per 30° cell, combine current hotness (total events
    strictly above the cross-cell mean — exact integer inequality
    total·n_cells > grand, no division) with the Mann–Kendall trend of
    the cell's DAILY counts (operators/morans.py mann_kendall), and
    label intensifying / diminishing / persistent / emerging /
    receding / quiet. Every comparison is on exact integers. Shape:
    one groupBy to daily cells, the calendar-bounded MK self-join, one
    per-cell rollup, and a single-row global aggregate broadcast back
    — no step holds more than #cells rows after the first agg."""
    from gipspark.operators.morans import mann_kendall

    ev = load(spark, sf_dir, "events").select(
        C.derived_lat(F.col("event_id")).alias("lat"),
        C.derived_lon(F.col("event_id")).alias("lon"),
        F.expr("unix_timestamp(ts) div 86400").alias("d"),
    )
    c = ev.groupBy(
        F.floor((F.col("lon") + F.lit(180.0)) / F.lit(_EH_GRID)).cast("int").alias("gx"),
        F.floor((F.lit(90.0) - F.col("lat")) / F.lit(_EH_GRID)).cast("int").alias("gy"),
        "d",
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    tot = c.groupBy("gx", "gy").agg(F.sum("x").cast("long").alias("total_x"))
    g = tot.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("total_x").cast("long").alias("grand"),
    )
    mk = mann_kendall(c, ["gx", "gy"], t_col="d", v_col="x").select(
        "gx", "gy", "s_stat"
    )
    j = tot.join(mk, ["gx", "gy"], "left").crossJoin(F.broadcast(g))
    s = F.coalesce("s_stat", F.lit(0).cast("long"))
    hot = F.col("total_x") * F.col("n_cells") > F.col("grand")
    return j.select(
        "gx",
        "gy",
        "total_x",
        s.alias("s_stat"),
        F.when(hot, 1).otherwise(0).cast("int").alias("is_hot"),
        F.when(hot & (s > 0), "intensifying")
        .when(hot & (s < 0), "diminishing")
        .when(hot, "persistent")
        .when(s > 0, "emerging")
        .when(s < 0, "receding")
        .otherwise("quiet")
        .alias("phase"),
    )



@register(
    "temporal_colocation_types",
    """
WITH mins AS (
  SELECT DISTINCT event_type AS t,
         cast(epoch_us(ts) // 60000000 as bigint) AS m
  FROM events
), per_t AS (
  SELECT t, cast(count(*) as bigint) AS n_min FROM mins GROUP BY t
), tot AS (
  SELECT cast(count(DISTINCT m) as bigint) AS n_total FROM mins
), pairs AS (
  SELECT a.t AS type_a, b.t AS type_b, cast(count(*) as bigint) AS n_both
  FROM mins a JOIN mins b ON a.m = b.m AND a.t < b.t
  GROUP BY a.t, b.t
)
SELECT p.type_a, p.type_b, p.n_both, pa.n_min AS n_a, pb.n_min AS n_b, t.n_total,
       cast(p.n_both * t.n_total * 1000000 // (pa.n_min * pb.n_min) as bigint) AS lift_micro
FROM pairs p
JOIN per_t pa ON p.type_a = pa.t
JOIN per_t pb ON p.type_b = pb.t
CROSS JOIN tot t
ORDER BY p.type_a, p.type_b
""",
)
def temporal_colocation_types(spark, sf_dir):
    """TEMPORAL co-location lift between event types: for each type
    pair, the number of minutes where BOTH fired vs the independence
    expectation n_a·n_b/n_total — lift > 10⁶ means the types travel
    together in time (shared upstream trigger, retry storms, funnel
    coupling), the clock-axis twin of colocation_pairs_events (which
    asks the same on the map). The minute grid is exact integer
    epoch-division; lift is one cross-multiplied floor micro — no
    probability ever floats. Scale shape: one distinct (type, minute)
    agg, one minute-keyed self-equi-join over the 5-type dim, a
    1-row total anchor."""
    e = load(spark, sf_dir, "events")
    mins = e.select(
        F.col("event_type").alias("t"),
        F.expr(
            "cast(unix_micros(cast(ts as timestamp)) div 60000000 as bigint)"
        ).alias("m"),
    ).distinct()
    per_t = mins.groupBy("t").agg(F.count("*").cast("long").alias("n_min"))
    tot = mins.select("m").distinct().agg(F.count("*").cast("long").alias("n_total"))
    a = mins.select(F.col("t").alias("type_a"), "m")
    b = mins.select(F.col("t").alias("type_b"), "m")
    pairs = (
        a.join(b, "m")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("long").alias("n_both"))
    )
    pa = per_t.select(F.col("t").alias("type_a"), F.col("n_min").alias("n_a"))
    pb = per_t.select(F.col("t").alias("type_b"), F.col("n_min").alias("n_b"))
    return (
        pairs.join(F.broadcast(pa), "type_a")
        .join(F.broadcast(pb), "type_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            "n_total",
            F.expr(
                "cast(n_both * n_total * 1000000 div (n_a * n_b) as bigint)"
            ).alias("lift_micro"),
        )
        .orderBy("type_a", "type_b")
    )



@register(
    "cross_gfunction_suppliers",
    f"""
WITH cu AS (
  SELECT c_custkey AS cid,
         (cast(c_custkey as bigint) * {C.LON_MUL}) % {C.LON_MOD} - 180000 AS x,
         (cast(c_custkey as bigint) * {C.LAT_MUL}) % {C.LAT_MOD} - 60000 AS y
  FROM customer
), su AS (
  SELECT s_suppkey AS sid,
         (cast(s_suppkey as bigint) * {C.LON_MUL}) % {C.LON_MOD} - 180000 AS sx,
         (cast(s_suppkey as bigint) * {C.LAT_MUL}) % {C.LAT_MOD} - 60000 AS sy
  FROM supplier
), nn AS (
  SELECT cid, min((x - sx) * (x - sx) + (y - sy) * (y - sy)) AS d2
  FROM cu CROSS JOIN su GROUP BY cid
), tot AS (SELECT cast(count(*) as bigint) AS n FROM nn),
radii(r_mdeg) AS (VALUES (2000), (5000), (10000), (20000), (40000))
SELECT cast(radii.r_mdeg as bigint) AS r_mdeg,
       cast(count(CASE WHEN nn.d2 <= cast(radii.r_mdeg as bigint) * radii.r_mdeg
                       THEN 1 END) as bigint) AS n_within,
       cast((count(CASE WHEN nn.d2 <= cast(radii.r_mdeg as bigint) * radii.r_mdeg
                        THEN 1 END) * 1000000) // any_value(tot.n) as bigint) AS g_q
FROM radii CROSS JOIN nn CROSS JOIN tot
GROUP BY radii.r_mdeg ORDER BY r_mdeg
""",
)
def cross_gfunction_suppliers(spark, sf_dir):
    """Bivariate (cross-type) G function: the CDF of each CUSTOMER's
    distance to its nearest SUPPLIER at five radii — the service-
    accessibility curve (what fraction of demand sits within r of
    supply) that the within-set G function (gfunction_customers)
    cannot express because the two point processes are different
    populations: its shape against the independence benchmark says
    suppliers track demand (attraction), avoid it, or ignore it —
    catchment_counts assigns customers to suppliers, this grades the
    whole assignment's geometry. Exact integer milli-degree d² mins
    (supplier dim broadcast — bounded), conditional counts on the
    literal radius dim, micro CDF values. One broadcast-join agg +
    a 5-row sweep."""
    cu = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cid"),
        ((F.col("c_custkey").cast("long") * C.LON_MUL) % C.LON_MOD - 180000).alias("x"),
        ((F.col("c_custkey").cast("long") * C.LAT_MUL) % C.LAT_MOD - 60000).alias("y"),
    )
    su = load(spark, sf_dir, "supplier").select(
        ((F.col("s_suppkey").cast("long") * C.LON_MUL) % C.LON_MOD - 180000).alias("sx"),
        ((F.col("s_suppkey").cast("long") * C.LAT_MUL) % C.LAT_MOD - 60000).alias("sy"),
    )
    nn = (
        cu.crossJoin(F.broadcast(su))
        .groupBy("cid")
        .agg(
            F.min(
                (F.col("x") - F.col("sx")) * (F.col("x") - F.col("sx"))
                + (F.col("y") - F.col("sy")) * (F.col("y") - F.col("sy"))
            ).alias("d2")
        )
    )
    tot = nn.agg(F.count("*").cast("long").alias("n"))
    radii = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(r) for r in (2000, 5000, 10000, 20000, 40000)])
        ).alias("r_mdeg")
    )
    return (
        radii.crossJoin(nn)
        .crossJoin(F.broadcast(tot))
        .groupBy("r_mdeg")
        .agg(
            F.count(
                F.when(
                    F.col("d2")
                    <= F.col("r_mdeg").cast("long") * F.col("r_mdeg"),
                    1,
                )
            )
            .cast("long")
            .alias("n_within"),
            F.expr(
                "cast((count(CASE WHEN d2 <= cast(r_mdeg as bigint) * r_mdeg"
                " THEN 1 END) * 1000000) div any_value(n) as bigint)"
            ).alias("g_q"),
        )
        .select(F.col("r_mdeg").cast("long").alias("r_mdeg"), "n_within", "g_q")
        .orderBy("r_mdeg")
    )

