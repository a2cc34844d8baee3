"""Registry family: sketches (split from the single-file registry; query names and behavior unchanged)."""

from __future__ import annotations

from gipspark.queries._base import (  # noqa: F401
    C,
    D,
    DEC,
    F,
    Window,
    _LAT,
    _LON,
    load,
    register,
    table_rows,
)
from gipspark.queries._shared import (  # noqa: F401
    _BF_M,
    _BF_SALTS,
    _HLL_TRAIL_D,
    _SB_MAXQ,
    _SB_STEPS,
    _VOPT_B,
    _VOPT_GRID,
    _bf_h,
    _voptimal_oracle_sql,
)



@register(
    "approx_vs_exact_distinct",
    """
SELECT event_type, count(DISTINCT user_id) AS exact_users,
       TRUE AS approx_ok
FROM events GROUP BY event_type
""",
)
def approx_vs_exact_distinct(spark, sf_dir):
    """HLL++ approx-distinct vs exact. The raw sketch estimate is
    engine-specific, so the oracle checks the CONTRACT instead: the
    exact count bit-matches DuckDB and the approx estimate lands within
    2.5× the configured rsd of it (``approx_ok``) — if Spark's HLL
    drifts outside the bound the value-hash fails."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.lit(0.05) * F.col("exact_users")
        ).alias("approx_ok"),
    )



@register(
    "value_histogram_events",
    """
SELECT cast(floor(value / 25.0) as bigint) AS bin,
       count(*) AS n,
       cast(sum(cast(round(value * 100) as bigint)) as bigint) AS sum_cents
FROM events
GROUP BY bin
""",
)
def value_histogram_events(spark, sf_dir):
    """Fixed-width value histogram with exact per-bin totals: bin ids
    from floor-division (exact IEEE), totals in integer cents (no
    parallel float-sum drift). Single map-side-combinable aggregate."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.floor(F.col("value") / 25.0).cast("bigint").alias("bin"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_cents"),
        )
    )



@register(
    "bloom_semi_join_orders",
    """
WITH build AS (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
SELECT o_orderpriority,
       cast(count(*) as bigint) AS n_orders,
       cast(cast(sum(cast(o_totalprice as decimal(18,2))) as decimal(18,2)) as double) AS total
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM build)
GROUP BY o_orderpriority
""",
)
def bloom_semi_join_orders(spark, sf_dir):
    """Bloom-filter runtime pruning ahead of a semi join
    (operators/bloom.py): the selective build side (high-balance
    customers) is folded into a literal bitmask tested INSIDE the probe
    scan stage — at 100 TB the orders table is pruned before any
    exchange, the exact broadcast semi join afterwards only sees
    surviving rows, and the result is bit-identical to the plain semi
    join the oracle runs. This is the explicit, oracle-replayable twin
    of Spark's runtime bloomFilter rewrite."""
    from gipspark.operators.bloom import bloom_semi_join

    orders = load(spark, sf_dir, "orders")
    build = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    hits = bloom_semi_join(orders, build, "o_custkey", "c_custkey")
    return hits.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast(DEC).cast("double").alias("total"),
    )



@register(
    "hll_pyramid_contract",
    f"""
WITH raw AS (
  SELECT user_id, {_LAT.format(k='event_id')} AS lat, {_LON.format(k='event_id')} AS lon
  FROM events
), pts AS (
  SELECT user_id,
         cast(floor((lon + 180.0) / 10.0) as int) AS pgx,
         cast(floor((90.0 - lat) / 10.0) as int) AS pgy
  FROM raw
)
SELECT pgx, pgy, cast(count(DISTINCT user_id) as bigint) AS exact_users,
       TRUE AS ok
FROM pts GROUP BY pgx, pgy
""",
)
def hll_pyramid_contract(spark, sf_dir):
    """Sketch-merge pyramid rollup: per-child-cell (2.5°) HLL sketches
    of distinct users union up to the 10° parent, and the merged
    estimate must sit within the documented accuracy band of the exact
    parent distinct (ok = TRUE, which is what the oracle asserts).
    This is THE 100 TB pattern for distinct-per-region: children are
    sketched once (one shuffle), every ancestor level merges sketches
    (bytes), never re-scans raw rows — the same contract shape as
    approx_count_distinct/approx_percentile."""
    ev = load(spark, sf_dir, "events")
    lat = C.derived_lat(F.col("event_id"))
    lon = C.derived_lon(F.col("event_id"))
    pts = ev.select(
        "user_id",
        F.floor((lon + F.lit(180.0)) / F.lit(10.0)).cast("int").alias("pgx"),
        F.floor((F.lit(90.0) - lat) / F.lit(10.0)).cast("int").alias("pgy"),
        F.floor((lon + F.lit(180.0)) / F.lit(2.5)).cast("int").alias("cgx"),
        F.floor((F.lit(90.0) - lat) / F.lit(2.5)).cast("int").alias("cgy"),
    )
    child = pts.groupBy("pgx", "pgy", "cgx", "cgy").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = child.groupBy("pgx", "pgy").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = pts.groupBy("pgx", "pgy").agg(
        F.count_distinct("user_id").cast("long").alias("exact_users")
    )
    out = exact.join(merged, ["pgx", "pgy"])
    tol = F.greatest(F.lit(2.0), F.col("exact_users").cast("double") * F.lit(0.06))
    return out.select(
        "pgx",
        "pgy",
        "exact_users",
        (F.abs(F.col("est").cast("double") - F.col("exact_users").cast("double")) <= tol).alias(
            "ok"
        ),
    )



@register(
    "hll_intersection_contract",
    """
WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
SELECT cast((SELECT count(*) FROM a) as bigint) AS n_a,
       cast((SELECT count(*) FROM b) as bigint) AS n_b,
       cast((SELECT count(*) FROM a JOIN b USING (user_id)) as bigint) AS n_both,
       TRUE AS approx_ok
""",
)
def hll_intersection_contract(spark, sf_dir):
    """Sketch-based set-intersection estimate by inclusion–exclusion:
    |A∩B| ≈ hll(A) + hll(B) − hll(A∪B), the mergeable-sketch identity
    that answers audience-overlap questions at 10^12 rows without ever
    joining the raw sets (three sketches, unioned per partition). The
    oracle checks the contract: exact cardinalities bit-match and the
    sketch estimate lands within 15% of |A| + |B| (inclusion–exclusion
    compounds three sketches' error, hence the wider band than the
    single-sketch 5%)."""
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "view").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    exact = (
        a.distinct()
        .agg(F.count(F.lit(1)).alias("n_a"))
        .crossJoin(b.distinct().agg(F.count(F.lit(1)).alias("n_b")))
        .crossJoin(
            a.distinct().join(b.distinct(), "user_id").agg(F.count(F.lit(1)).alias("n_both"))
        )
    )
    approx = (
        a.agg(F.approx_count_distinct("user_id", 0.02).alias("ha"))
        .crossJoin(b.agg(F.approx_count_distinct("user_id", 0.02).alias("hb")))
        .crossJoin(
            a.unionByName(b).agg(F.approx_count_distinct("user_id", 0.02).alias("hab"))
        )
    )
    return exact.crossJoin(approx).select(
        "n_a",
        "n_b",
        "n_both",
        (
            F.abs((F.col("ha") + F.col("hb") - F.col("hab")) - F.col("n_both"))
            <= F.lit(0.15) * (F.col("n_a") + F.col("n_b"))
        ).alias("approx_ok"),
    )



@register(
    "bloom_fp_rate",
    f"""
WITH bits AS (
  {' UNION '.join(f"SELECT DISTINCT {_bf_h(s, 'p_partkey')} AS b FROM part" for s in _BF_SALTS)}
),
probes AS (
  SELECT c_custkey + 10000000 AS pk FROM customer
),
hits AS (
  SELECT p.pk, cast(count(*) as bigint) AS n_hit
  FROM (
    {' UNION ALL '.join(f"SELECT pk, {_bf_h(s, 'pk')} AS b FROM probes" for s in _BF_SALTS)}
  ) p JOIN bits ON bits.b = p.b
  GROUP BY p.pk
)
SELECT cast((SELECT count(*) FROM probes) as bigint) AS n_probes,
       cast((SELECT count(*) FROM bits) as bigint) AS n_bits_set,
       cast(count(*) as bigint) AS n_fp,
       cast((count(*) * 1000000) // (SELECT count(*) FROM probes) as bigint) AS fp_rate_q
FROM hits WHERE n_hit = {len(_BF_SALTS)}
""",
)
def bloom_fp_rate(spark, sf_dir):
    """Measured false-positive rate of the Bloom filter construction
    (the accuracy contract next to bloom_semi_join_orders — HLL and
    approx-percentile already have theirs): part keys populate an
    m=4096, k=3 md5 filter; customer keys offset by 10⁷ (guaranteed
    absent) probe it; a probe is a false positive iff ALL THREE of its
    bit positions are set. The bit table and the probe hash explode
    are both exact md5 arithmetic, so Spark and DuckDB count the
    identical FP set — a sketch whose error itself is deterministic.
    Shuffles: one distinct on bits, one bit-keyed join; never wider
    than 3× the probe table."""
    part = load(spark, sf_dir, "part")
    cust = load(spark, sf_dir, "customer")
    bits = None
    for s in _BF_SALTS:
        b = part.select(
            (D.md5_long(F.concat(F.lit(f"{s}:"), F.col("p_partkey").cast("string"))) % _BF_M).alias("b")
        )
        bits = b if bits is None else bits.union(b)
    bits = bits.distinct()
    probes = cust.select((F.col("c_custkey") + 10000000).alias("pk"))
    ph = None
    for s in _BF_SALTS:
        p = probes.select(
            "pk",
            (D.md5_long(F.concat(F.lit(f"{s}:"), F.col("pk").cast("string"))) % _BF_M).alias("b"),
        )
        ph = p if ph is None else ph.unionAll(p)
    hits = (
        ph.join(bits, "b")
        .groupBy("pk")
        .agg(F.count("*").cast("long").alias("n_hit"))
        .filter(F.col("n_hit") == len(_BF_SALTS))
    )
    n_probes = probes.agg(F.count("*").cast("long").alias("n_probes"))
    n_bits = bits.agg(F.count("*").cast("long").alias("n_bits_set"))
    nf = hits.agg(F.count("*").cast("long").alias("n_fp"))
    return (
        nf.crossJoin(F.broadcast(n_probes))
        .crossJoin(F.broadcast(n_bits))
        .select(
            "n_probes",
            "n_bits_set",
            "n_fp",
            F.expr("(n_fp * 1000000) div n_probes").cast("long").alias("fp_rate_q"),
        )
    )



@register("voptimal_histogram_orders", _voptimal_oracle_sql())
def voptimal_histogram_orders(spark, sf_dir):
    """V-optimal histogram construction over the order-price
    distribution — the optimizer-synopsis classic (Jagadish et al.):
    for every bucket budget b = 1..{_VOPT_B}, the MINIMUM total
    within-bucket variance partition of the sorted value grid, by
    exact dynamic programming over prefix moments. Segment cost is
    the floor-exact cnt-scaled variance ((SSd*Cd - Sd^2) div Cd, in
    dollars^2 so quotients stay in int64 to ~1e11 rows), and the
    argmin packs (cost, j) into one integer (min(total*1e5 + j) —
    the kmeans tie-break trick) so the chosen split is deterministic.
    The emitted cost-vs-buckets elbow is what a query planner reads
    to size its synopsis. Scale shape: one histogram agg over the big
    table bounds the DP to the value GRID (~55 rows at the $10k
    grid), then {_VOPT_B - 1} unrolled join+min rounds on that dim."""
    dec = "decimal(38,0)"
    o = load(spark, sf_dir, "orders")
    dollars = F.expr(
        f"cast(round(cast(o_totalprice as {DEC}) * 100) as bigint) div 100"
    )
    h = o.select(dollars.alias("x")).groupBy(
        F.expr(f"x div {_VOPT_GRID}").alias("v")
    ).agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum(F.col("x").cast(dec)).cast(dec).alias("s"),
        F.sum(F.col("x").cast(dec) * F.col("x")).cast(dec).alias("ss"),
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    p = h.select(
        F.row_number().over(Window.orderBy("v")).cast("long").alias("i"),
        "v",
        F.sum("cnt").over(wv).cast(dec).alias("c"),
        F.sum("s").over(wv).cast(dec).alias("s"),
        F.sum("ss").over(wv).cast(dec).alias("ss"),
    ).localCheckpoint()
    zero = spark.createDataFrame(
        [(0, 0, 0, 0, 0)], "i long, v long, c long, s long, ss long"
    ).select(
        "i", "v", F.col("c").cast(dec).alias("c"), F.col("s").cast(dec).alias("s"),
        F.col("ss").cast(dec).alias("ss"),
    )
    p0 = zero.unionByName(p)
    nmax = p.agg(F.max("i").cast("long").alias("n"))

    def seg_cost(pi_pref: str, pj_pref: str) -> str:
        return (
            f"(({pi_pref}ss - {pj_pref}ss) * ({pi_pref}c - {pj_pref}c)"
            f" - ({pi_pref}s - {pj_pref}s) * ({pi_pref}s - {pj_pref}s))"
            f" div ({pi_pref}c - {pj_pref}c)"
        )

    pi = p.select(
        F.col("i"), F.col("c").alias("pic"), F.col("s").alias("pis"),
        F.col("ss").alias("piss"),
    )
    best = pi.select(
        "i",
        F.expr(
            "cast(((piss - 0) * (pic - 0) - (pis - 0) * (pis - 0)) div (pic - 0)"
            " as bigint)"
        ).alias("cost"),
        F.lit(0).cast("long").alias("lastj"),
    ).localCheckpoint()
    pj = p0.select(
        F.col("i").alias("j"), F.col("v").alias("jv"), F.col("c").alias("pjc"),
        F.col("s").alias("pjs"), F.col("ss").alias("pjss"),
    )
    results = []
    nrow = nmax.collect()[0]["n"]
    for b in range(1, _VOPT_B + 1):
        if b > 1:
            cand = (
                best.join(pj, F.col("j") == F.col("i"))
                .drop("i")
                .join(pi, F.col("i") > F.col("j"))
                .select(
                    "i",
                    (
                        F.col("cost")
                        + F.expr(
                            # CASE guard: Catalyst pushes the later
                            # total == cost predicate into the BNLJ and
                            # may evaluate this before the i > j
                            # conjunct, hitting pic = pjc pairs
                            "cast(CASE WHEN pic - pjc > 0 THEN"
                            " ((piss - pjss) * (pic - pjc)"
                            " - (pis - pjs) * (pis - pjs)) div (pic - pjc)"
                            " END as bigint)"
                        )
                    ).alias("total"),
                    "j",
                )
            )
            m = cand.groupBy("i").agg(F.min("total").cast("long").alias("cost"))
            best = (
                cand.join(m, "i")
                .filter(F.col("total") == F.col("cost"))
                .groupBy("i", "cost")
                .agg(F.min("j").cast("long").alias("lastj"))
                .localCheckpoint()
            )
        row = (
            best.filter(F.col("i") == nrow)
            .join(
                p0.select(F.col("i").alias("lastj"), F.col("v").alias("last_split_v")),
                "lastj",
            )
            .select(
                F.lit(b).alias("n_buckets"),
                F.col("cost").alias("total_cost"),
                F.col("lastj").alias("last_split_i"),
                F.col("last_split_v").cast("long").alias("last_split_v"),
            )
        )
        results.append(row)
    out = results[0]
    for r in results[1:]:
        out = out.unionAll(r)
    return out.orderBy("n_buckets")



@register(
    "hll_trailing_contract",
    f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) // 1000000 // 86400 AS d FROM events
), days AS (SELECT DISTINCT d FROM ev),
tr AS (
  SELECT days.d, cast(count(DISTINCT ev.user_id) as bigint) AS exact_users
  FROM days JOIN ev ON ev.d BETWEEN days.d - {_HLL_TRAIL_D} AND days.d
  GROUP BY days.d
)
SELECT d AS day, exact_users, TRUE AS ok FROM tr ORDER BY day
""",
)
def hll_trailing_contract(spark, sf_dir):
    """Trailing 7-day distinct users per day via SLIDING SKETCH MERGES
    — the windowed-cardinality pattern at 100 TB: sketch each day ONCE
    (one shuffle over raw rows), then every trailing window is a
    7-sketch union (bytes), never a re-scan; the contract asserts the
    merged estimate lands within the documented HLL band of the exact
    trailing distinct (ok = TRUE is what the oracle pins, the
    hll_pyramid_contract convention — the pyramid rolls space, this
    rolls TIME). Band: max(5, 6% of exact) for the default lgK=12
    sketch. Scale shape: one day-sketch agg + a calendar-bounded
    <=7x band join on sketches."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / F.lit(86400)).cast("long").alias("d"),
    )
    ev = ev.localCheckpoint()
    daily = ev.groupBy("d").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk")
    )
    days = ev.select("d").distinct()
    merged = (
        days.select(F.col("d").alias("day"))
        .join(
            daily,
            (F.col("d") >= F.col("day") - _HLL_TRAIL_D) & (F.col("d") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
    )
    exact = (
        days.select(F.col("d").alias("day"))
        .join(
            ev,
            (F.col("d") >= F.col("day") - _HLL_TRAIL_D) & (F.col("d") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("long").alias("exact_users"))
    )
    joined = exact.join(merged, "day")
    bad = joined.filter(
        F.abs(F.col("est") - F.col("exact_users"))
        > F.greatest(F.lit(5), F.col("exact_users") * 6 / 100)
    ).count()
    assert bad == 0, f"HLL trailing estimate outside band for {bad} days"
    return joined.select("day", "exact_users", F.lit(True).alias("ok")).orderBy("day")



@register(
    "rational_approx_rates",
    f"""
WITH RECURSIVE shares AS (
  SELECT event_type, cast(count(*) as bigint) AS p,
         (SELECT cast(count(*) as bigint) FROM events) AS q
  FROM events GROUP BY event_type
), sb(event_type, p, q, step, la, lb, rc, rd, bp, bq) AS (
  SELECT event_type, p, q, 0,
         cast(0 as bigint), cast(1 as bigint), cast(1 as bigint), cast(1 as bigint),
         cast(0 as bigint), cast(1 as bigint)
  FROM shares
  UNION ALL
  SELECT event_type, p, q, step + 1,
         CASE WHEN q * (la + rc) <= p * (lb + rd) THEN la + rc ELSE la END,
         CASE WHEN q * (la + rc) <= p * (lb + rd) THEN lb + rd ELSE lb END,
         CASE WHEN q * (la + rc) <= p * (lb + rd) THEN rc ELSE la + rc END,
         CASE WHEN q * (la + rc) <= p * (lb + rd) THEN rd ELSE lb + rd END,
         CASE WHEN lb + rd <= {_SB_MAXQ}
               AND abs(p * (lb + rd) - (la + rc) * q) * bq
                   < abs(p * bq - bp * q) * (lb + rd)
              THEN la + rc ELSE bp END,
         CASE WHEN lb + rd <= {_SB_MAXQ}
               AND abs(p * (lb + rd) - (la + rc) * q) * bq
                   < abs(p * bq - bp * q) * (lb + rd)
              THEN lb + rd ELSE bq END
  FROM sb WHERE step < {_SB_STEPS}
)
SELECT event_type, cast(p as bigint) AS count_n, cast(q as bigint) AS total_n,
       cast(bp as bigint) AS approx_num, cast(bq as bigint) AS approx_den,
       cast(abs(p * bq - bp * q) * 1000000 // (q * bq) as bigint) AS err_q
FROM sb WHERE step = {_SB_STEPS} ORDER BY event_type
""",
)
def rational_approx_rates(spark, sf_dir):
    """Best small-denominator rational approximation of each event
    type's share via Stern–Brocot mediant descent — the
    'one-in-seven events is a purchase' presentation problem solved
    exactly: {_SB_STEPS} bisection steps through the mediant tree,
    keeping the best fraction with denominator ≤ {_SB_MAXQ} under
    EXACT cross-multiplied error comparison (|p·q′ − p′·q| — no float
    ever touches the ratio, so the chosen fraction is the true best
    approximant among those visited; the mediant path visits every
    best-approximant prefix, a classical continued-fraction fact).
    The sb recursion runs per type as another scalar ordered fold.
    Dashboard copy writes itself from approx_num/approx_den."""
    ev = load(spark, sf_dir, "events")
    tot = table_rows(sf_dir, "events")
    shares = ev.groupBy("event_type").agg(F.count("*").cast("long").alias("p")).select(
        "event_type", "p", F.lit(tot).cast("long").alias("q")
    )
    fold = shares.select(
        "event_type",
        "p",
        "q",
        F.expr(
            f"""
aggregate(
  sequence(1, {_SB_STEPS}),
  named_struct('la', cast(0 as bigint), 'lb', cast(1 as bigint),
               'rc', cast(1 as bigint), 'rd', cast(1 as bigint),
               'bp', cast(0 as bigint), 'bq', cast(1 as bigint)),
  (acc, st) -> named_struct(
    'la', CASE WHEN q * (acc.la + acc.rc) <= p * (acc.lb + acc.rd)
               THEN acc.la + acc.rc ELSE acc.la END,
    'lb', CASE WHEN q * (acc.la + acc.rc) <= p * (acc.lb + acc.rd)
               THEN acc.lb + acc.rd ELSE acc.lb END,
    'rc', CASE WHEN q * (acc.la + acc.rc) <= p * (acc.lb + acc.rd)
               THEN acc.rc ELSE acc.la + acc.rc END,
    'rd', CASE WHEN q * (acc.la + acc.rc) <= p * (acc.lb + acc.rd)
               THEN acc.rd ELSE acc.lb + acc.rd END,
    'bp', CASE WHEN acc.lb + acc.rd <= {_SB_MAXQ}
                AND abs(p * (acc.lb + acc.rd) - (acc.la + acc.rc) * q) * acc.bq
                    < abs(p * acc.bq - acc.bp * q) * (acc.lb + acc.rd)
               THEN acc.la + acc.rc ELSE acc.bp END,
    'bq', CASE WHEN acc.lb + acc.rd <= {_SB_MAXQ}
                AND abs(p * (acc.lb + acc.rd) - (acc.la + acc.rc) * q) * acc.bq
                    < abs(p * acc.bq - acc.bp * q) * (acc.lb + acc.rd)
               THEN acc.lb + acc.rd ELSE acc.bq END),
  acc -> acc) AS r
"""
        ).alias("r"),
    )
    return fold.select(
        "event_type",
        F.col("p").alias("count_n"),
        F.col("q").alias("total_n"),
        F.col("r.bp").cast("long").alias("approx_num"),
        F.col("r.bq").cast("long").alias("approx_den"),
        F.expr("abs(p * r.bq - r.bp * q) * 1000000 div (q * r.bq)").alias("err_q"),
    ).orderBy("event_type")

