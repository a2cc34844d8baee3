"""Registry family: contracts (split from the single-file registry; query names and behavior unchanged)."""

from __future__ import annotations

from gipspark.queries._base import (  # noqa: F401
    C,
    D,
    DEC,
    F,
    HAVERSINE_SQL,
    T,
    Window,
    _LAT,
    _LON,
    load,
    register,
    table_rows,
)
from gipspark.queries._shared import (  # noqa: F401
    _AMS_SIGN_KEY,
    _BDAY_BUCKETS,
    _CPA_COLS,
    _CPA_DECIMALS,
    _ENC_COLS,
    _FH_BUCKETS,
    _HT_N,
    _HT_P,
    _IBN_BATCH,
    _IVM_SPLIT,
    _KA_KS,
    _KMV_K,
    _KMV_MAXH,
    _LDIV_BUCKET,
    _LDIV_LS,
    _MOM_PARTS,
    _PACK_B,
    _PACK_BUDGET,
    _PACK_H,
    _PR_EDGE_DST,
    _PR_N,
    _RG_TARGET_BYTES,
    _SFC_BITS,
    _SPA_TARGET,
    _SPLIT_A,
    _SPLIT_B,
    _STJ_TURN_BUCKETS,
    _ZM_FILE_ROWS,
    _ZM_PREDS,
    _blen_col,
    _blen_sql,
    _neardup_ver_sql,
    _sfc_oracle_sql,
    _shard_balance_oracle_sql,
    _verified_neardup_pairs,
    morton_key,
)



@register(
    "ks_drift_sources",
    # two-sample Kolmogorov–Smirnov: each source's doc-length ECDF vs
    # the pooled corpus ECDF. sup|F_s − F_all| is attained at a pooled
    # sample point, so evaluating at every distinct n_chars is exact.
    # D numerator kept as the exact bigint |c_s·N − c_all·n_s|.
    """
WITH vc AS (
  SELECT source, n_chars AS v, cast(count(*) as bigint) AS c
  FROM documents GROUP BY source, n_chars
), s AS (
  SELECT source, cast(count(*) as bigint) AS n_docs FROM documents GROUP BY source
), gvc AS (
  SELECT n_chars AS v, cast(count(*) as bigint) AS c FROM documents GROUP BY n_chars
), ga AS (
  SELECT v, sum(c) OVER (ORDER BY v) AS cum_all FROM gvc
), g AS (SELECT cast(count(*) as bigint) AS n_all FROM documents),
grid AS (
  SELECT s.source, s.n_docs, ga.v, ga.cum_all, g.n_all
  FROM s CROSS JOIN ga CROSS JOIN g
), cum AS (
  SELECT source, n_docs, v, cum_all, n_all,
         sum(coalesce(vc.c, 0)) OVER (PARTITION BY source ORDER BY v) AS cum_s
  FROM grid LEFT JOIN vc USING (source, v)
), dev AS (
  SELECT source, n_docs, v,
         abs(cum_s * n_all - cum_all * n_docs) AS dnum, n_all
  FROM cum
), pick AS (
  SELECT source, n_docs, v, dnum, n_all,
         row_number() OVER (PARTITION BY source ORDER BY dnum DESC, v ASC) AS rn
  FROM dev
)
SELECT source, n_docs, cast(dnum as bigint) AS d_num, cast(v as bigint) AS v_at,
       cast(dnum as double) / (cast(n_docs as double) * cast(n_all as double)) AS ks_d
FROM pick WHERE rn = 1
""",
)
def ks_drift_sources(spark, sf_dir):
    """Two-sample Kolmogorov–Smirnov drift monitor: each source's
    document-length distribution against the pooled corpus — the
    distribution-shift gate a curation pipeline runs per crawl snapshot
    before mixing a source in (length drift is the cheapest proxy for a
    template/boilerplate change). The KS numerator |c_s·N − c_all·n_s|
    stays an exact bigint; the statistic itself is the only double; the
    step point where the max is attained (min value on ties) is
    reported so the drift is locatable.

    Scale shape: ONE big-data pass (the groupBy(source, n_chars)
    hash-agg, map-side partial); everything downstream is dim-scale —
    the (source × distinct-length) grid is bounded by group cardinality
    × the length domain, built with literal-key BroadcastHashJoins
    (never a nested loop), and the ECDF windows partition by source.
    The pooled-ECDF window is unpartitioned but runs over the distinct
    length values only (domain-bounded, ≤ max doc length rows)."""
    d = load(spark, sf_dir, "documents")
    vc = d.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count("*").cast("long").alias("c")
    )
    s = d.groupBy("source").agg(F.count("*").cast("long").alias("n_docs"))
    gvc = d.groupBy(F.col("n_chars").alias("v")).agg(F.count("*").cast("long").alias("c"))
    ga = gvc.select(
        "v", F.sum("c").over(Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)).alias("cum_all")
    )
    g = d.agg(F.count("*").cast("long").alias("n_all"))
    grid = (
        s.withColumn("__k", F.lit(1))
        .join(F.broadcast(ga.withColumn("__k", F.lit(1))), "__k")
        .join(F.broadcast(g.withColumn("__k", F.lit(1))), "__k")
        .drop("__k")
    )
    cum = grid.join(vc, ["source", "v"], "left").select(
        "source",
        "n_docs",
        "v",
        "cum_all",
        "n_all",
        F.sum(F.coalesce(F.col("c"), F.lit(0)))
        .over(Window.partitionBy("source").orderBy("v").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_s"),
    )
    dev = cum.select(
        "source",
        "n_docs",
        "v",
        F.abs(F.col("cum_s") * F.col("n_all") - F.col("cum_all") * F.col("n_docs")).alias("dnum"),
        "n_all",
    )
    pick = dev.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("source").orderBy(F.col("dnum").desc(), F.col("v").asc())
        ),
    ).filter(F.col("rn") == 1)
    return pick.select(
        "source",
        "n_docs",
        F.col("dnum").cast("long").alias("d_num"),
        F.col("v").cast("long").alias("v_at"),
        (F.col("dnum").cast("double") / (F.col("n_docs").cast("double") * F.col("n_all").cast("double"))).alias(
            "ks_d"
        ),
    )



@register(
    "fk_integrity_audit",
    # referential-integrity audit across the star schema: per declared
    # FK edge, child row count and orphan count (children whose parent
    # key is missing) — each edge one left-anti-shaped aggregate.
    """
SELECT 'orders->customer' AS fk_edge,
       (SELECT cast(count(*) as bigint) FROM orders) AS n_child,
       (SELECT cast(count(*) as bigint) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS n_orphans
UNION ALL
SELECT 'lineitem->orders',
       (SELECT cast(count(*) as bigint) FROM lineitem),
       (SELECT cast(count(*) as bigint) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'lineitem->part',
       (SELECT cast(count(*) as bigint) FROM lineitem),
       (SELECT cast(count(*) as bigint) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
UNION ALL
SELECT 'customer->nation',
       (SELECT cast(count(*) as bigint) FROM customer),
       (SELECT cast(count(*) as bigint) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
""",
)
def fk_integrity_audit(spark, sf_dir):
    """Referential-integrity audit over the star schema — the data-
    quality gate a warehouse runs after every load: for each declared
    FK edge, how many child rows point at a missing parent. Each edge
    is a left-anti join counted (broadcast when the parent is a dim),
    so the audit costs one scan per child table and never materializes
    the orphans themselves.

    Scale shape: anti joins inherit the usual broadcast/shuffle choice;
    counts are map-side-combinable; output is one row per edge."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    c = load(spark, sf_dir, "customer")
    p = load(spark, sf_dir, "part")
    n = load(spark, sf_dir, "nation")

    def edge(name, child, parent, ck, pk):
        orphans = child.join(
            F.broadcast(parent.select(F.col(pk).alias("__pk"))),
            child[ck] == F.col("__pk"),
            "left_anti",
        )
        return (
            child.agg(F.count("*").cast("long").alias("n_child"))
            .withColumn("fk_edge", F.lit(name))
            .withColumn("__k", F.lit(1))
            .join(
                F.broadcast(
                    orphans.agg(F.count("*").cast("long").alias("n_orphans")).withColumn(
                        "__k", F.lit(1)
                    )
                ),
                "__k",
            )
            .select("fk_edge", "n_child", "n_orphans")
        )

    return (
        edge("orders->customer", o, c, "o_custkey", "c_custkey")
        .unionByName(edge("lineitem->orders", li, o, "l_orderkey", "o_orderkey"))
        .unionByName(edge("lineitem->part", li, p, "l_partkey", "p_partkey"))
        .unionByName(edge("customer->nation", c, n, "c_nationkey", "n_nationkey"))
    )



@register(
    "column_profile_audit",
    "\nUNION ALL\n".join(
        f"""
SELECT '{c}' AS col_name,
       cast(count(*) as bigint) AS n_rows,
       cast(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) as bigint) AS n_null,
       cast(count(DISTINCT {c}) as bigint) AS n_distinct,
       min(cast({c} as double)) AS min_v,
       max(cast({c} as double)) AS max_v
FROM lineitem"""
        for c in _CPA_COLS
    ),
)
def column_profile_audit(spark, sf_dir):
    """Single-pass pipeline data-quality audit: per numeric lineitem
    column, row count, null count, EXACT distinct count, and min/max —
    the profile a training-data ingest job runs before accepting a
    drop. Spark computes all {len(_CPA_COLS)} column profiles in ONE
    aggregate (the multi-distinct plans as a single Expand + partial
    aggs — one scan, {len(_CPA_COLS)}× expand; at petabyte scale swap
    count(distinct) for the HLL contract in approx_vs_exact_distinct)
    then unpivots the 1-row result with stack(). The oracle is the
    naive {len(_CPA_COLS)}-scan UNION ALL — same rows, so the
    single-scan claim is verified, not assumed."""
    li = load(spark, sf_dir, "lineitem")
    aggs = []
    for c in _CPA_COLS:
        aggs += [
            F.count(F.lit(1)).cast("long").alias(f"nr_{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"nn_{c}"),
            F.countDistinct(c).cast("long").alias(f"nd_{c}"),
            F.min(F.col(c).cast("double")).alias(f"mn_{c}"),
            F.max(F.col(c).cast("double")).alias(f"mx_{c}"),
        ]
    one = li.agg(*aggs)
    stack = "stack({}, {}) as (col_name, n_rows, n_null, n_distinct, min_v, max_v)".format(
        len(_CPA_COLS),
        ", ".join(f"'{c}', nr_{c}, nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in _CPA_COLS),
    )
    return one.select(F.expr(stack))



@register(
    "ht_total_contract",
    f"""
WITH w AS (
  SELECT o_orderkey,
         cast(round(cast(o_totalprice as {DEC}) * 100) as bigint) AS cents,
         {D.MD5_LONG_SQL.format(x="concat('ht:', cast(o_orderkey as varchar))")} % {_HT_P} AS h
  FROM orders
), tot AS (SELECT cast(sum(cents) as bigint) AS big_w, cast(count(*) as bigint) AS n_pop FROM w),
s AS (
  SELECT w.o_orderkey, w.cents, w.h, tot.big_w, tot.n_pop,
         least(cast({_HT_P} as bigint),
               ({_HT_P} * {_HT_N} * w.cents) // tot.big_w) AS t
  FROM w, tot
), inc AS (SELECT * FROM s WHERE h < t AND t > 0)
SELECT cast(max(n_pop) as bigint) AS n_pop,
       cast(count(*) as bigint) AS n_sampled,
       cast(cast(sum(({_HT_P} * cents) // t) as bigint) as double) / 100.0 AS ht_estimate,
       cast(max(big_w) as double) / 100.0 AS exact_total
FROM inc
""",
)
def ht_total_contract(spark, sf_dir):
    """Horvitz–Thompson estimation contract: deterministic Poisson-PPS
    sampling (include order i iff md5-hash < floor(P·n·wᵢ/W), so the
    inclusion probability πᵢ = tᵢ/P is EXACTLY known as an integer
    ratio) and the HT estimator Σ yᵢ/πᵢ of total revenue next to the
    exact total — the one-pass audit that tells a pipeline how much a
    cheap sampled estimate can be trusted before running the full
    aggregation at 100 TB. Every addend is the integer floor of
    P·yᵢ/tᵢ (drops < 1 cent-tick per sampled row), so the estimator
    sum is a BIGINT — exact under any partitioning / accumulation
    order — and the whole contract replays bit-identically in the
    oracle."""
    w = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"),
        (
            D.md5_long(F.concat(F.lit("ht:"), F.col("o_orderkey").cast("string"))) % _HT_P
        ).alias("h"),
    )
    tot = w.agg(
        F.sum("cents").cast("long").alias("big_w"), F.count("*").cast("long").alias("n_pop")
    )
    s = w.crossJoin(F.broadcast(tot)).withColumn(
        "t",
        F.least(
            F.lit(_HT_P).cast("long"),
            F.expr(f"({_HT_P} * {_HT_N} * cents) div big_w"),
        ),
    )
    inc = s.filter((F.col("h") < F.col("t")) & (F.col("t") > 0))
    return inc.agg(
        F.max("n_pop").cast("long").alias("n_pop"),
        F.count("*").cast("long").alias("n_sampled"),
        (
            F.sum(F.expr(f"({_HT_P} * cents) div t")).cast("long").cast("double") / F.lit(100.0)
        ).alias("ht_estimate"),
        (F.max("big_w").cast("double") / F.lit(100.0)).alias("exact_total"),
    )



@register(
    "k_anonymity_audit",
    f"""
WITH qi AS (
  SELECT c_mktsegment AS seg, c_nationkey AS nat,
         cast(floor(c_acctbal / 1000.0) as int) AS bal_band,
         c_custkey
  FROM customer
), grp AS (
  SELECT seg, nat, bal_band, cast(count(*) as bigint) AS gsize,
         cast(count(DISTINCT c_custkey % 7) as bigint) AS l_div
  FROM qi GROUP BY seg, nat, bal_band
), tot AS (SELECT cast(sum(gsize) as bigint) AS n FROM grp),
ks(k) AS (VALUES {', '.join(f'({k})' for k in _KA_KS)})
SELECT ks.k,
       cast(sum(CASE WHEN gsize < ks.k THEN gsize ELSE 0 END) as bigint) AS n_exposed,
       cast((sum(CASE WHEN gsize < ks.k THEN gsize ELSE 0 END) * 1000000)
            // any_value(tot.n) as bigint) AS exposed_q,
       cast(min(gsize) as bigint) AS min_group,
       cast(sum(CASE WHEN l_div < 2 THEN gsize ELSE 0 END) as bigint) AS n_low_ldiv
FROM grp CROSS JOIN tot CROSS JOIN ks
GROUP BY ks.k
""",
)
def k_anonymity_audit(spark, sf_dir):
    """k-anonymity / l-diversity audit over the quasi-identifier tuple
    (segment, nation, balance band) — the data-governance gate a
    release pipeline runs before publishing: for k ∈ {{2,5,10}}, how
    many rows sit in QI groups smaller than k (re-identifiable), the
    1e6 fixed-point exposure share, the worst group size, and the
    rows whose group has fewer than 2 distinct sensitive values
    (l-diversity < 2 — homogeneous groups leak even when k holds).
    One QI aggregate + a 3-row k dim + the 1-row total broadcast."""
    cu = load(spark, sf_dir, "customer")
    qi = cu.select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nat"),
        F.floor(F.col("c_acctbal") / 1000.0).cast("int").alias("bal_band"),
        "c_custkey",
    )
    grp = qi.groupBy("seg", "nat", "bal_band").agg(
        F.count("*").cast("long").alias("gsize"),
        F.countDistinct(F.col("c_custkey") % 7).cast("long").alias("l_div"),
    )
    tot = grp.agg(F.sum("gsize").cast("long").alias("n"))
    ks = spark.createDataFrame([(k,) for k in _KA_KS], "k int")
    return (
        grp.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("gsize") < F.col("k"), F.col("gsize")).otherwise(0))
            .cast("long")
            .alias("n_exposed"),
            F.first("n").alias("__n"),
            F.min("gsize").cast("long").alias("min_group"),
            F.sum(F.when(F.col("l_div") < 2, F.col("gsize")).otherwise(0))
            .cast("long")
            .alias("n_low_ldiv"),
        )
        .withColumn("exposed_q", F.expr("(n_exposed * 1000000) div __n").cast("long"))
        .select("k", "n_exposed", "exposed_q", "min_group", "n_low_ldiv")
    )



@register(
    "kmv_distinct_contract",
    f"""
WITH toks AS (
  SELECT DISTINCT unnest({D.shingles_sql('text', 3)}) AS w
  FROM documents
), h AS (
  SELECT w, {D.MD5_LONG_SQL.format(x='w')} % {_KMV_MAXH} AS hv FROM toks
), kth AS (
  SELECT hv FROM h ORDER BY hv LIMIT 1 OFFSET {_KMV_K - 1}
), exact_cnt AS (SELECT cast(count(*) as bigint) AS exact_d FROM toks)
SELECT exact_cnt.exact_d,
       cast((SELECT hv FROM kth) as bigint) AS kth_min,
       cast(({_KMV_K - 1} * cast({_KMV_MAXH} as hugeint))
            // (SELECT hv FROM kth) as bigint) AS kmv_estimate,
       cast(abs(cast(({_KMV_K - 1} * cast({_KMV_MAXH} as hugeint))
            // (SELECT hv FROM kth) as bigint) - exact_cnt.exact_d) * 1000000
            // exact_cnt.exact_d as bigint) AS rel_err_q
FROM exact_cnt
""",
)
def kmv_distinct_contract(spark, sf_dir):
    """KMV (k-minimum-values / bottom-k) distinct-count sketch with a
    measured accuracy contract — the third cardinality sketch beside
    HLL and the exact count, and the one whose sketches UNION
    losslessly by merging bottom-k sets: estimate = (k−1)·M / h(k)
    with M the hash range and h(k) the k-th smallest md5 value, all
    exact integer arithmetic (128-bit for the product), so the
    estimate AND its 1e6 relative error hash identically. The k-th
    minimum is a top-k (TakeOrderedAndProject shape), never a full
    sort."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(D.shingles(F.col("text"), 3)).alias("w")).distinct()
    h = toks.select((D.md5_long(F.col("w")) % _KMV_MAXH).alias("hv"))
    kth = h.orderBy("hv").limit(_KMV_K).orderBy(F.col("hv").desc()).limit(1)
    exact = toks.agg(F.count("*").cast("long").alias("exact_d"))
    return (
        exact.crossJoin(F.broadcast(kth.select(F.col("hv").alias("kth_min"))))
        .withColumn(
            "kmv_estimate",
            # decimal `div` (not `/`): `/` rounds HALF_UP at scale 6 before a
            # long cast, which can exceed the true floor quotient by one
            F.expr(
                f"(cast({_KMV_K - 1} as decimal(38,0)) * cast({_KMV_MAXH} as decimal(38,0)))"
                " div kth_min"
            ).cast("long"),
        )
        .withColumn(
            "rel_err_q",
            F.expr("(abs(kmv_estimate - exact_d) * 1000000) div exact_d").cast("long"),
        )
        .select("exact_d", "kth_min", "kmv_estimate", "rel_err_q")
    )



@register(
    "ams_f2_contract",
    f"""
WITH tf AS (
  SELECT w, cast(count(*) as bigint) AS f
  FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
        FROM documents) t
  GROUP BY w
), exact AS (SELECT cast(sum(f * f) as bigint) AS f2 FROM tf),
zs AS (
  SELECT i,
         cast(sum((1 - 2 * ({D.MD5_LONG_SQL.format(x=_AMS_SIGN_KEY)} % 2)) * f)
              as bigint) AS z
  FROM tf, (SELECT unnest(generate_series(0, 8)) AS i) sk
  GROUP BY i
), est AS (
  SELECT z * z AS e, row_number() OVER (ORDER BY z * z, i) AS rn FROM zs
)
SELECT exact.f2, cast(est.e as bigint) AS median_est,
       cast(abs(est.e - exact.f2) * 1000000 // exact.f2 as bigint) AS rel_err_q
FROM exact, est WHERE est.rn = 5
""",
)
def ams_f2_contract(spark, sf_dir):
    """AMS tug-of-war sketch for the second frequency moment F2 = Σf²
    of the term-frequency vector, with a measured accuracy contract —
    the join-size / self-join-cost estimator (F2 of the key histogram
    IS the self-join cardinality), the third sketch contract beside
    HLL (F0) and CMS (point counts): nine independent ±1 sign streams
    s_i(w) from md5 parity fold to Z_i = Σ s_i(w)·f_w, each Z_i² is an
    unbiased F2 estimate, and the median of nine is the
    variance-tamed report. All integer: signs are hash parities, Z
    and Z² exact bigints (|Z| ≤ Σf ≈ corpus tokens, so Z² is safe to
    ~3e9 tokens — documented headroom), the median is a row_number
    pick over the 9-row sketch dim, never a float quantile. One
    term-count aggregate + a 9-row broadcast fan-out; shuffle is one
    hash agg on the token explode."""
    d = load(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(T.tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("f"))
    )
    exact = tf.agg(F.sum(F.col("f") * F.col("f")).cast("long").alias("f2"))
    sk = spark.range(9).select(F.col("id").cast("int").alias("i"))
    sign = 1 - 2 * (
        D.md5_long(F.concat(F.lit("ams"), F.col("i").cast("string"), F.lit(":"), F.col("w"))) % 2
    )
    zs = (
        tf.crossJoin(F.broadcast(sk))
        .select("i", (sign * F.col("f")).alias("sf"))
        .groupBy("i")
        .agg(F.sum("sf").cast("long").alias("z"))
    )
    est = (
        zs.select((F.col("z") * F.col("z")).alias("e"), "i")
        .withColumn("rn", F.row_number().over(Window.orderBy("e", "i")))
        .filter(F.col("rn") == 5)
    )
    return (
        exact.crossJoin(F.broadcast(est.select(F.col("e").alias("median_est"))))
        .withColumn("rel_err_q", F.expr("(abs(median_est - f2) * 1000000) div f2").cast("long"))
        .select("f2", "median_est", "rel_err_q")
    )



@register(
    "feature_hash_contract",
    f"""
WITH tf AS (
  SELECT w, cast(count(*) as bigint) AS f
  FROM (SELECT unnest({D.shingles_sql('text', 3)}) AS w FROM documents)
  GROUP BY w
), hb AS (
  SELECT w, f, {D.MD5_LONG_SQL.format(x="'fh:' || w")} % {_FH_BUCKETS} AS b FROM tf
), bk AS (
  SELECT b, cast(count(*) as bigint) AS occ, cast(sum(f) as bigint) AS mass FROM hb GROUP BY b
)
SELECT cast((SELECT count(*) FROM tf) as bigint) AS n_terms,
       cast(count(*) as bigint) AS n_buckets_used,
       cast(max(occ) as bigint) AS max_occupancy,
       cast(sum(CASE WHEN occ > 1 THEN occ ELSE 0 END) as bigint) AS n_collided_terms,
       cast(sum(CASE WHEN occ > 1 THEN mass ELSE 0 END) * 1000000
            // sum(mass) as bigint) AS collided_mass_q
FROM bk
""",
)
def feature_hash_contract(spark, sf_dir):
    """Feature-hashing (hashing-trick) collision contract — the
    measured price of hashing the 3-shingle vocabulary into {_FH_BUCKETS}
    buckets (every hashed-feature model pays it; this query says how
    much): bucket occupancy histogram from one md5 assignment, the
    birthday-bound collision count, and — the number that actually
    matters for model quality — the share of TOKEN MASS sitting in
    collided buckets (a rare term colliding with 'the' is catastrophic;
    two rare terms colliding is noise), exact 1e6 ticks. One term agg,
    one bucket agg, a 1-row census."""
    d = load(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(D.shingles(F.col("text"), 3)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("f"))
    )
    hb = tf.select(
        "f", (D.md5_long(F.concat(F.lit("fh:"), F.col("w"))) % _FH_BUCKETS).alias("b")
    )
    bk = hb.groupBy("b").agg(
        F.count("*").cast("long").alias("occ"), F.sum("f").cast("long").alias("mass")
    )
    nt = tf.agg(F.count("*").cast("long").alias("n_terms"))
    return (
        bk.agg(
            F.count("*").cast("long").alias("n_buckets_used"),
            F.max("occ").cast("long").alias("max_occupancy"),
            F.sum(F.when(F.col("occ") > 1, F.col("occ")).otherwise(0))
            .cast("long")
            .alias("n_collided_terms"),
            F.expr(
                "(sum(CASE WHEN occ > 1 THEN mass ELSE 0 END) * 1000000) div sum(mass)"
            )
            .cast("long")
            .alias("collided_mass_q"),
        )
        .crossJoin(F.broadcast(nt))
        .select(
            "n_terms", "n_buckets_used", "max_occupancy", "n_collided_terms", "collided_mass_q"
        )
    )



@register("sfc_locality_audit", _sfc_oracle_sql())
def sfc_locality_audit(spark, sf_dir):
    """Space-filling-curve locality audit: for the occupied 64x64 cell
    lattice, how far apart do ROOK-ADJACENT cells land in each layout
    order? gap = |rank_a - rank_b| over the occupied-cell rank (what a
    clustered table actually stores contiguously); smaller mean gap =
    fewer file/range hops for a spatial window scan. The audit replaces
    folklore with a measured contract — and the measurement is NOT the
    folklore: on the fully-occupied lattice Morton wins this
    mean-adjacent-gap metric (32.5 vs 39.1 rank-ticks at 64x64 —
    Morton's jumps are rare-but-huge, Hilbert's detours are
    frequent-but-long, and the mean rewards the former), while
    Hilbert's real advantage is contiguous key RANGES per query box
    (zranges in operators/zorder.py vs the hilbert chain) — exactly
    why the engine exposes both layouts. Both key chains are the SAME
    table-driven renders the layout operators use, so keys are
    bit-exact. Scale shape: one distinct-cell agg over the big table,
    two shifted equi-joins for adjacency (never theta), two rank
    windows over the bounded lattice."""
    from gipspark.operators.hilbert import hilbert_key_df
    from gipspark.operators.zorder import morton_key

    n = 1 << _SFC_BITS
    ev = load(spark, sf_dir, "events")
    cells = ev.selectExpr(
        f"(((cast(event_id as bigint) * {C.LON_MUL}) % {C.LON_MOD}) * {n})"
        f" div {C.LON_MOD} as cgx",
        f"(((cast(event_id as bigint) * {C.LAT_MUL}) % {C.LAT_MOD}) * {n})"
        f" div {C.LAT_MOD} as cgy",
    ).distinct()
    keyed = hilbert_key_df(
        cells, gx_col="cgx", gy_col="cgy", bits=_SFC_BITS, out="hkey"
    ).withColumn("zkey", morton_key(F.col("cgx"), F.col("cgy")))
    ranked = keyed.select(
        "cgx",
        "cgy",
        F.row_number().over(Window.orderBy("zkey")).alias("zrank"),
        F.row_number().over(Window.orderBy("hkey")).alias("hrank"),
    ).localCheckpoint()
    b = ranked.select(
        F.col("cgx").alias("bgx"),
        F.col("cgy").alias("bgy"),
        F.col("zrank").alias("zb"),
        F.col("hrank").alias("hb"),
    )
    right = ranked.join(
        b, (F.col("bgx") == F.col("cgx") + 1) & (F.col("bgy") == F.col("cgy"))
    ).select(F.col("zrank").alias("za"), "zb", F.col("hrank").alias("ha"), "hb")
    down = ranked.join(
        b, (F.col("bgx") == F.col("cgx")) & (F.col("bgy") == F.col("cgy") + 1)
    ).select(F.col("zrank").alias("za"), "zb", F.col("hrank").alias("ha"), "hb")
    pairs = right.unionAll(down)
    n_cells = ranked.count()
    stats = None
    for curve, a_col, b_col in (("hilbert", "ha", "hb"), ("zorder", "za", "zb")):
        row = pairs.agg(
            F.lit(curve).alias("curve"),
            F.lit(n_cells).cast("long").alias("n_cells"),
            F.count("*").cast("long").alias("n_pairs"),
            F.sum(F.abs(F.col(a_col) - F.col(b_col))).cast("long").alias("gap_sum"),
            F.max(F.abs(F.col(a_col) - F.col(b_col))).cast("long").alias("gap_max"),
        ).select("curve", "n_cells", "n_pairs", "gap_sum", "gap_max")
        stats = row if stats is None else stats.unionAll(row)
    return stats.withColumn(
        "mean_gap_q", F.expr("(gap_sum * 1000000) div n_pairs").cast("long")
    ).orderBy("curve")



@register(
    "t_closeness_audit",
    f"""
WITH m AS (
  SELECT o_orderpriority AS qi1, o_orderstatus AS qi2,
         cast(round(cast(o_totalprice as {DEC}) * 100) as bigint) // 5000000
           AS sens
  FROM orders
), gh AS (
  SELECT sens, cast(count(*) as bigint) AS cg FROM m GROUP BY sens
), grp AS (SELECT DISTINCT qi1, qi2 FROM m),
spine AS (
  SELECT g.qi1, g.qi2, gh.sens, gh.cg FROM grp g CROSS JOIN gh
), sh AS (
  SELECT qi1, qi2, sens, cast(count(*) as bigint) AS cs
  FROM m GROUP BY qi1, qi2, sens
), c AS (
  SELECT sp.qi1, sp.qi2, sp.sens,
         sum(sp.cg) OVER (PARTITION BY sp.qi1, sp.qi2 ORDER BY sp.sens) AS cumg,
         sum(coalesce(sh.cs, 0)) OVER (PARTITION BY sp.qi1, sp.qi2 ORDER BY sp.sens)
           AS cums,
         max(sp.sens) OVER (PARTITION BY sp.qi1, sp.qi2) AS smax
  FROM spine sp LEFT JOIN sh
    ON sh.qi1 = sp.qi1 AND sh.qi2 = sp.qi2 AND sh.sens = sp.sens
), tot AS (SELECT cast(count(*) as bigint) AS ng FROM m),
st AS (SELECT qi1, qi2, cast(count(*) as bigint) AS ns FROM m GROUP BY qi1, qi2),
emd AS (
  SELECT c.qi1, c.qi2, st.ns, tot.ng,
         cast(sum(abs(c.cums * tot.ng - c.cumg * st.ns))
                FILTER (WHERE c.sens < c.smax) as bigint) AS emd_num
  FROM c JOIN st USING (qi1, qi2) CROSS JOIN tot
  GROUP BY c.qi1, c.qi2, st.ns, tot.ng
)
SELECT qi1, qi2, ns AS group_size,
       cast(emd_num * 1000000 // (ns * ng * ((SELECT max(sens) FROM gh)
            - (SELECT min(sens) FROM gh))) as bigint) AS t_q,
       emd_num
FROM emd ORDER BY qi1, qi2
""",
)
def t_closeness_audit(spark, sf_dir):
    """t-closeness privacy audit (Li et al., the distributional
    upgrade to k_anonymity_audit's size/diversity checks): for every
    quasi-identifier group (priority x status), the normalized
    earth-mover distance between the group's SENSITIVE-attribute
    distribution (price bucket) and the global one — a group whose
    price profile diverges leaks information even when it is large
    and l-diverse. EMD over the ordered bucket axis is the exact
    cumulative-deviation sum (wasserstein_sources' cross-multiplied
    integers, unit bucket steps), normalized by the axis span to the
    standard [0,1] t in floor ticks. Scale shape: one global + one
    (group,bucket) histogram, a bounded group-dim x bucket spine, one
    cumulative window per group."""
    o = load(spark, sf_dir, "orders")
    m = o.select(
        F.col("o_orderpriority").alias("qi1"),
        F.col("o_orderstatus").alias("qi2"),
        F.expr(
            f"cast(round(cast(o_totalprice as {DEC}) * 100) as bigint) div 5000000"
        ).alias("sens"),
    )
    gh = m.groupBy("sens").agg(F.count("*").cast("long").alias("cg"))
    grp = m.select("qi1", "qi2").distinct()
    spine = grp.crossJoin(F.broadcast(gh))
    sh = m.groupBy("qi1", "qi2", "sens").agg(F.count("*").cast("long").alias("cs"))
    wg = Window.partitionBy("qi1", "qi2")
    wcum = wg.orderBy("sens").rowsBetween(Window.unboundedPreceding, 0)
    c = spine.join(sh, ["qi1", "qi2", "sens"], "left").select(
        "qi1",
        "qi2",
        "sens",
        F.sum("cg").over(wcum).alias("cumg"),
        F.sum(F.coalesce(F.col("cs"), F.lit(0))).over(wcum).alias("cums"),
        F.max("sens").over(wg).alias("smax"),
    )
    tot = m.agg(F.count("*").cast("long").alias("ng"))
    st = m.groupBy("qi1", "qi2").agg(F.count("*").cast("long").alias("ns"))
    span = gh.agg((F.max("sens") - F.min("sens")).cast("long").alias("span"))
    emd = (
        c.join(st, ["qi1", "qi2"])
        .crossJoin(F.broadcast(tot))
        .filter(F.col("sens") < F.col("smax"))
        .groupBy("qi1", "qi2", "ns", "ng")
        .agg(
            F.sum(F.abs(F.col("cums") * F.col("ng") - F.col("cumg") * F.col("ns")))
            .cast("long")
            .alias("emd_num")
        )
    )
    return (
        emd.crossJoin(F.broadcast(span))
        .select(
            "qi1",
            "qi2",
            F.col("ns").alias("group_size"),
            F.expr("(emd_num * 1000000) div (ns * ng * span)")
            .cast("long")
            .alias("t_q"),
            "emd_num",
        )
        .orderBy("qi1", "qi2")
    )



@register(
    "packing_gap_contract",
    f"""
WITH RECURSIVE d AS (
  SELECT cast(doc_id as bigint) AS doc_id,
         greatest(1, cast(n_chars as bigint) // 4) AS tok,
         {_PACK_H} % {_PACK_B} AS bucket
  FROM documents
), o AS (
  SELECT doc_id, tok, bucket,
         row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
  FROM d
), step(bucket, rn, tok, seq_id, cum) AS (
  SELECT bucket, rn, tok, cast(0 as bigint), tok FROM o WHERE rn = 1
  UNION ALL
  SELECT o.bucket, o.rn, o.tok,
         CASE WHEN s.cum + o.tok > {_PACK_BUDGET} THEN s.seq_id + 1 ELSE s.seq_id END,
         CASE WHEN s.cum + o.tok > {_PACK_BUDGET} THEN o.tok ELSE s.cum + o.tok END
  FROM step s JOIN o ON o.bucket = s.bucket AND o.rn = s.rn + 1
), greedy AS (
  SELECT cast(sum(mx + 1) as bigint) AS bins
  FROM (SELECT bucket, max(seq_id) AS mx FROM step GROUP BY bucket)
), tot AS (
  SELECT cast(count(*) as bigint) AS n_items, cast(sum(tok) as bigint) AS total_tok
  FROM d
), alphas AS (
  SELECT DISTINCT tok AS a FROM d WHERE tok <= {_PACK_BUDGET} // 2
  UNION SELECT 0
), l2 AS (
  SELECT max(
    (SELECT count(*) FROM d WHERE tok > {_PACK_BUDGET} - al.a)
    + (SELECT count(*) FROM d
       WHERE tok > {_PACK_BUDGET} // 2 AND tok <= {_PACK_BUDGET} - al.a)
    + greatest(0,
        ((SELECT coalesce(sum(tok), 0) FROM d
          WHERE tok >= al.a AND tok <= {_PACK_BUDGET} // 2)
         - ((SELECT count(*) FROM d
             WHERE tok > {_PACK_BUDGET} // 2 AND tok <= {_PACK_BUDGET} - al.a)
              * {_PACK_BUDGET}
            - (SELECT coalesce(sum(tok), 0) FROM d
               WHERE tok > {_PACK_BUDGET} // 2 AND tok <= {_PACK_BUDGET} - al.a))
         + {_PACK_BUDGET} - 1) // {_PACK_BUDGET})
  ) AS l2_bound
  FROM alphas al
)
SELECT tot.n_items, tot.total_tok, greedy.bins AS greedy_bins,
       cast((tot.total_tok + {_PACK_BUDGET} - 1) // {_PACK_BUDGET} as bigint)
         AS l1_bound,
       cast(l2.l2_bound as bigint) AS l2_bound,
       cast(greedy.bins - l2.l2_bound as bigint) AS gap_to_l2,
       cast((greedy.bins * {_PACK_BUDGET} - tot.total_tok) * 1000000
            // (greedy.bins * {_PACK_BUDGET}) as bigint) AS waste_q
FROM greedy, tot, l2
""",
)
def packing_gap_contract(spark, sf_dir):
    """Optimality-gap CERTIFICATE for the greedy sequence packer: the
    Martello-Toth L2 lower bound (maximized over all alpha in the item
    sizes: big items need own bins, half-full items pair with at most
    one mid item, and the leftover mid mass must still fit somewhere)
    is valid for ANY packing, so greedy_bins - l2_bound bounds how far
    pack_sequences_docs can possibly be from optimal — the number
    that says whether smarter packing is worth building (plus waste_q,
    the padding fraction the training loop actually pays). Greedy
    bins come from the SAME salted first-fit operator; the bound is
    pure histogram arithmetic (exact integers, ceil as (a+C-1) div C).
    Scale shape: one item scan + the packer's bucket scans; the alpha
    sweep runs over the <=C/2 distinct-size dim."""
    from gipspark.operators.packing import pack_sequences

    C = _PACK_BUDGET
    d = load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.greatest(F.lit(1).cast("long"), F.expr("cast(n_chars as bigint) div 4")).alias(
            "tok"
        ),
        (D.md5_long(F.concat(F.lit("p:"), F.col("doc_id").cast("string"))) % _PACK_B).alias(
            "bucket"
        ),
    )
    d = d.localCheckpoint()
    packed = pack_sequences(d, budget=C)
    greedy = (
        packed.groupBy("bucket")
        .agg(F.max("seq_id").alias("mx"))
        .agg(F.sum(F.col("mx") + 1).cast("long").alias("greedy_bins"))
    )
    tot = d.agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum("tok").cast("long").alias("total_tok"),
    )
    # histogram + cumulative lookups for the alpha sweep
    h = d.groupBy("tok").agg(
        F.count("*").cast("long").alias("c"), F.sum("tok").cast("long").alias("s")
    ).localCheckpoint()
    alphas = (
        h.filter(F.col("tok") <= C // 2)
        .select(F.col("tok").alias("a"))
        .union(spark.createDataFrame([(0,)], "a long"))
        .distinct()
    )
    # per-alpha terms via conditional aggregation against the bounded histogram
    terms = (
        alphas.crossJoin(h)
        .groupBy("a")
        .agg(
            F.sum(F.when(F.col("tok") > C - F.col("a"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("j1"),
            F.sum(
                F.when(
                    (F.col("tok") > C // 2) & (F.col("tok") <= C - F.col("a")),
                    F.col("c"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("j2"),
            F.sum(
                F.when(
                    (F.col("tok") > C // 2) & (F.col("tok") <= C - F.col("a")),
                    F.col("s"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("j2s"),
            F.sum(
                F.when(
                    (F.col("tok") >= F.col("a")) & (F.col("tok") <= C // 2), F.col("s")
                ).otherwise(0)
            )
            .cast("long")
            .alias("j3s"),
        )
    )
    l2 = terms.select(
        (
            F.col("j1")
            + F.col("j2")
            + F.greatest(
                F.lit(0).cast("long"),
                F.expr(
                    f"(j3s - (j2 * {C} - j2s) + {C} - 1) div {C}"
                ),
            )
        ).alias("lb")
    ).agg(F.max("lb").cast("long").alias("l2_bound"))
    return (
        greedy.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(l2))
        .select(
            "n_items",
            "total_tok",
            "greedy_bins",
            F.expr(f"(total_tok + {C} - 1) div {C}").cast("long").alias("l1_bound"),
            "l2_bound",
            (F.col("greedy_bins") - F.col("l2_bound")).cast("long").alias("gap_to_l2"),
            F.expr(
                f"((greedy_bins * {C} - total_tok) * 1000000)"
                f" div (greedy_bins * {C})"
            )
            .cast("long")
            .alias("waste_q"),
        )
    )



@register(
    "simpsons_paradox_audit",
    f"""
WITH m AS (
  SELECT o_orderpriority AS grp,
         cast(round(cast(o_totalprice as {DEC}) * 100) as bigint) // 100 AS p,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
), per AS (
  SELECT grp, cast(count(*) as bigint) AS n,
         cast(count(*) as HUGEINT) * sum(cast(p as HUGEINT) * y)
           - cast(sum(p) as HUGEINT) * sum(y) AS b_num
  FROM m GROUP BY grp
), gl AS (
  SELECT cast(count(*) as bigint) AS n_total,
         cast(count(*) as HUGEINT) * sum(cast(p as HUGEINT) * y)
           - cast(sum(p) as HUGEINT) * sum(y) AS g_num
  FROM m
)
SELECT gl.n_total,
       cast(sign(gl.g_num) as int) AS global_sign,
       cast(count(*) as bigint) AS n_groups,
       cast(count(*) FILTER (WHERE sign(per.b_num) = sign(gl.g_num)
                               AND per.b_num <> 0) as bigint) AS n_agree,
       cast(count(*) FILTER (WHERE sign(per.b_num) = -sign(gl.g_num)
                               AND per.b_num <> 0) as bigint) AS n_flipped,
       CASE WHEN count(*) FILTER (WHERE sign(per.b_num) = -sign(gl.g_num)
                                    AND per.b_num <> 0)
                 = count(*) FILTER (WHERE per.b_num <> 0)
             AND gl.g_num <> 0
            THEN true ELSE false END AS full_paradox
FROM per, gl GROUP BY gl.n_total, gl.g_num
""",
)
def simpsons_paradox_audit(spark, sf_dir):
    """Simpson's paradox detector: does the price~fulfillment
    association REVERSE inside every priority stratum relative to the
    pooled data? The aggregation trap every dashboard metric is one
    GROUP BY away from — and the audit is exact because only the SIGN
    of each association matters: the covariance numerator
    n*Sum(py) - Sum(p)*Sum(y) is an exact integer per stratum and
    globally, so sign agreement/flip counts are pure integer facts
    (partial_corr handles a continuous confounder; this is the
    categorical-stratification counterpart). full_paradox = every
    non-degenerate stratum opposes the pooled sign. Scale shape: one
    grouped moment agg + one global one."""
    dec = "decimal(38,0)"
    o = load(spark, sf_dir, "orders")
    m = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.expr(
            f"cast(round(cast(o_totalprice as {DEC}) * 100) as bigint) div 100"
        ).alias("p"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )

    def bnum(df):
        return (
            F.count("*").cast(dec)
            * F.sum(F.col("p").cast(dec) * F.col("y")).cast(dec)
            - F.sum("p").cast(dec) * F.sum("y").cast(dec)
        )

    per = m.groupBy("grp").agg(
        F.count("*").cast("long").alias("n"), bnum(m).alias("b_num")
    )
    glob = m.agg(F.count("*").cast("long").alias("n_total"), bnum(m).alias("g_num"))
    j = per.crossJoin(F.broadcast(glob))
    agg = j.agg(
        F.any_value("n_total").alias("n_total"),
        F.any_value(F.expr("cast(sign(g_num) as int)")).alias("global_sign"),
        F.count("*").cast("long").alias("n_groups"),
        F.count(
            F.when(
                (F.expr("sign(b_num) = sign(g_num)")) & (F.col("b_num") != 0), 1
            )
        )
        .cast("long")
        .alias("n_agree"),
        F.count(
            F.when(
                (F.expr("sign(b_num) = -sign(g_num)")) & (F.col("b_num") != 0), 1
            )
        )
        .cast("long")
        .alias("n_flipped"),
        F.count(F.when(F.col("b_num") != 0, 1)).cast("long").alias("n_nonzero"),
        F.any_value(F.expr("g_num <> 0")).alias("g_nonzero"),
    )
    return agg.select(
        "n_total",
        "global_sign",
        "n_groups",
        "n_agree",
        "n_flipped",
        (
            (F.col("n_flipped") == F.col("n_nonzero")) & F.col("g_nonzero")
        ).alias("full_paradox"),
    )



# --- round-4 session-4 batch 1: distribution tests + interop encode -------


@register(
    "cvm_drift_sources",
    """
WITH m AS (
  SELECT source, cast(n_chars as bigint) AS v FROM documents
), gh AS (
  SELECT v, cast(count(*) as bigint) AS cg FROM m GROUP BY v
), spine AS (
  SELECT s.source, gh.v, gh.cg
  FROM (SELECT DISTINCT source FROM m) s CROSS JOIN gh
), sh AS (
  SELECT source, v, cast(count(*) as bigint) AS cs FROM m GROUP BY source, v
), c AS (
  SELECT sp.source, sp.v, sp.cg,
         sum(sp.cg) OVER (PARTITION BY sp.source ORDER BY sp.v) AS cumg,
         sum(coalesce(sh.cs, 0)) OVER (PARTITION BY sp.source ORDER BY sp.v) AS cums
  FROM spine sp LEFT JOIN sh ON sh.source = sp.source AND sh.v = sp.v
), tot AS (
  SELECT cast(count(*) as bigint) AS ng FROM m
), st AS (
  SELECT source, cast(count(*) as bigint) AS ns FROM m GROUP BY source
), agg AS (
  SELECT c.source, st.ns, tot.ng,
         sum(cast(c.cums * tot.ng - c.cumg * st.ns as HUGEINT)
             * (c.cums * tot.ng - c.cumg * st.ns) * c.cg) AS num
  FROM c JOIN st USING (source) CROSS JOIN tot
  GROUP BY c.source, st.ns, tot.ng
)
SELECT source, ns AS n_source, ng AS n_global,
       cast((num * 1000000000)
            // (cast(ns as HUGEINT) * ns * ng * ng * ng) as bigint) AS cvm_nano
FROM agg ORDER BY source
""",
)
def cvm_drift_sources(spark, sf_dir):
    """Cramér–von Mises discrepancy of each source's doc-length
    distribution against the global corpus — the L2 companion to the
    sup-norm KS gate (ks_drift_sources) and the transport-cost W1
    (wasserstein_sources): psi = Σ_k (cg_k/ng)·(F_s(v_k) − F_g(v_k))²
    over the pooled value spine, sensitive to body-wide shape drift
    that a single-point KS sup can miss. The ECDF gap is the exact
    integer cums·ng − cumg·ns (the wasserstein idiom), squared in
    HUGEINT/DECIMAL(38,0), weighted by the pooled mass cg, and
    reported as one floor nano-tick — no floats anywhere. Scale
    shape: one distinct-value spine broadcast across sources + one
    cumulative window per source; never a per-pair rescan of docs."""
    dec = "decimal(38,0)"
    m = load(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("long").alias("v")
    )
    gh = m.groupBy("v").agg(F.count("*").cast("long").alias("cg"))
    srcs = m.select("source").distinct()
    spine = srcs.crossJoin(gh)
    sh = m.groupBy("source", "v").agg(F.count("*").cast("long").alias("cs"))
    w = Window.partitionBy("source").orderBy("v")
    c = (
        spine.join(sh, ["source", "v"], "left")
        .select(
            "source",
            "v",
            "cg",
            F.sum("cg").over(w).alias("cumg"),
            F.sum(F.coalesce(F.col("cs"), F.lit(0))).over(w).alias("cums"),
        )
    )
    tot = m.agg(F.count("*").cast("long").alias("ng"))
    st = m.groupBy("source").agg(F.count("*").cast("long").alias("ns"))
    agg = (
        c.join(st, "source")
        .crossJoin(F.broadcast(tot))
        .groupBy("source", "ns", "ng")
        .agg(
            F.sum(
                (F.col("cums") * F.col("ng") - F.col("cumg") * F.col("ns")).cast(dec)
                * (F.col("cums") * F.col("ng") - F.col("cumg") * F.col("ns"))
                * F.col("cg")
            )
            .cast(dec)
            .alias("num")
        )
    )
    return agg.select(
        "source",
        F.col("ns").alias("n_source"),
        F.col("ng").alias("n_global"),
        F.expr(
            f"cast((num * 1000000000) div"
            f" (cast(ns as {dec}) * ns * ng * ng * ng) as bigint)"
        ).alias("cvm_nano"),
    ).orderBy("source")



@register(
    "split_leakage_audit",
    _neardup_ver_sql()
    + f""",
lab AS (
  SELECT id_a, id_b,
         CASE WHEN {_SPLIT_A} < 8 THEN 0 WHEN {_SPLIT_A} = 8 THEN 1 ELSE 2 END AS ra,
         CASE WHEN {_SPLIT_B} < 8 THEN 0 WHEN {_SPLIT_B} = 8 THEN 1 ELSE 2 END AS rb
  FROM ver
), canon AS (
  SELECT CASE WHEN ra <= rb THEN ra ELSE rb END AS sa,
         CASE WHEN ra <= rb THEN rb ELSE ra END AS sb,
         CASE WHEN ra <= rb THEN id_a ELSE id_b END AS ia,
         CASE WHEN ra <= rb THEN id_b ELSE id_a END AS ib
  FROM lab
)
SELECT CASE sa WHEN 0 THEN 'train' WHEN 1 THEN 'val' ELSE 'test' END AS split_a,
       CASE sb WHEN 0 THEN 'train' WHEN 1 THEN 'val' ELSE 'test' END AS split_b,
       cast(count(*) as bigint) AS n_pairs,
       cast(count(DISTINCT ia) as bigint) AS n_docs_a,
       cast(count(DISTINCT ib) as bigint) AS n_docs_b
FROM canon GROUP BY sa, sb ORDER BY sa, sb
""",
)
def split_leakage_audit(spark, sf_dir):
    """Train/val/test near-dup LEAKAGE audit — the eval-integrity gate
    every LLM data pipeline needs before trusting held-out loss: hash
    docs into 80/10/10 splits (md5 % 10), then count verified near-dup
    pairs (the near_dedup_decision LSH→exact-Jaccard pipeline) that
    CROSS a split boundary, per canonically-ordered split pair — a
    test doc with a train near-twin is a leaked eval item, and the
    (train, test) row is exactly the contamination ngram_decontaminate
    hunts benchmark-by-benchmark, caught here corpus-internally.
    Same-split rows stay as the base-rate denominator. Scale shape:
    the LSH candidate bound does all the work; the audit adds one
    md5-label projection + one 6-row hash agg."""
    ver = _verified_neardup_pairs(spark, sf_dir).select("id_a", "id_b")

    def rank_of(col):
        s = D.md5_long(F.concat(F.lit("split:"), F.col(col).cast("string"))) % 10
        return F.when(s < 8, 0).when(s == 8, 1).otherwise(2)

    lab = ver.select(
        "id_a", "id_b", rank_of("id_a").alias("ra"), rank_of("id_b").alias("rb")
    )
    swap = F.col("ra") <= F.col("rb")
    canon = lab.select(
        F.when(swap, F.col("ra")).otherwise(F.col("rb")).alias("sa"),
        F.when(swap, F.col("rb")).otherwise(F.col("ra")).alias("sb"),
        F.when(swap, F.col("id_a")).otherwise(F.col("id_b")).alias("ia"),
        F.when(swap, F.col("id_b")).otherwise(F.col("id_a")).alias("ib"),
    )
    name = lambda c: (  # noqa: E731
        F.when(F.col(c) == 0, "train").when(F.col(c) == 1, "val").otherwise("test")
    )
    return (
        canon.groupBy("sa", "sb")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.countDistinct("ia").cast("long").alias("n_docs_a"),
            F.countDistinct("ib").cast("long").alias("n_docs_b"),
        )
        .select(
            name("sa").alias("split_a"),
            name("sb").alias("split_b"),
            "n_pairs",
            "n_docs_a",
            "n_docs_b",
        )
        .orderBy("split_a", "split_b")
    )



@register(
    "anonymization_ladder_audit",
    """
WITH w(width) AS (VALUES (250), (500), (1000), (2000), (4000), (8000)),
qi AS (SELECT c_mktsegment AS seg, c_nationkey AS nat, c_acctbal FROM customer),
tot AS (SELECT cast(count(*) as bigint) AS n FROM qi),
grp AS (
  SELECT w.width, seg, nat, cast(floor(c_acctbal / w.width) as int) AS band,
         cast(count(*) as bigint) AS gsize
  FROM qi CROSS JOIN w GROUP BY w.width, seg, nat, band
)
SELECT g.width, cast(count(*) as bigint) AS n_groups,
       cast(min(gsize) as bigint) AS min_group,
       cast(sum(CASE WHEN gsize < 5 THEN gsize ELSE 0 END) as bigint) AS n_exposed_k5,
       cast((sum(CASE WHEN gsize < 5 THEN gsize ELSE 0 END) * 1000000)
            // any_value(tot.n) as bigint) AS exposed_q,
       CASE WHEN min(gsize) >= 5 THEN 1 ELSE 0 END AS meets_k5
FROM grp g CROSS JOIN tot GROUP BY g.width ORDER BY g.width
""",
)
def anonymization_ladder_audit(spark, sf_dir):
    """Generalization-ladder audit — the k-anonymity DUAL of
    k_anonymity_audit (which sweeps k at fixed quasi-identifier
    coarseness): hold k = 5 and sweep the balance-band WIDTH up the
    generalization ladder (250 → 8000), reporting per rung the group
    count, worst group, exposed rows, and whether the rung finally
    meets k — i.e. the minimal generalization a release pipeline must
    apply, and the utility cost (n_groups collapsing) of getting
    there. floor() on doubles is identical in both engines, negative
    balances included. Scale shape: one QI hash agg fanned over a
    6-row literal width dim + the 1-row total anchor."""
    cu = load(spark, sf_dir, "customer")
    qi = cu.select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nat"),
        "c_acctbal",
    )
    wdim = (
        spark.range(1)
        .select(
            F.explode(
                F.array(*[F.lit(x) for x in (250, 500, 1000, 2000, 4000, 8000)])
            ).alias("width")
        )
    )
    tot = qi.agg(F.count("*").cast("long").alias("n"))
    grp = (
        qi.crossJoin(F.broadcast(wdim))
        .groupBy(
            "width",
            "seg",
            "nat",
            F.floor(F.col("c_acctbal") / F.col("width")).cast("int").alias("band"),
        )
        .agg(F.count("*").cast("long").alias("gsize"))
    )
    return (
        grp.crossJoin(F.broadcast(tot))
        .groupBy("width")
        .agg(
            F.count("*").cast("long").alias("n_groups"),
            F.min("gsize").cast("long").alias("min_group"),
            F.sum(F.when(F.col("gsize") < 5, F.col("gsize")).otherwise(0))
            .cast("long")
            .alias("n_exposed_k5"),
            F.expr(
                "cast((sum(CASE WHEN gsize < 5 THEN gsize ELSE 0 END) * 1000000)"
                " div any_value(n) as bigint)"
            ).alias("exposed_q"),
            F.when(F.min("gsize") >= 5, 1).otherwise(0).alias("meets_k5"),
        )
        .orderBy("width")
    )



@register(
    "inbatch_negative_audit",
    f"""
WITH b AS (
  SELECT doc_id, {_IBN_BATCH} % 16 AS batch, {T.doc_fingerprint_sql('text')} AS fp
  FROM documents
), nb AS (SELECT batch, cast(count(*) as bigint) AS n_docs FROM b GROUP BY batch),
fn AS (
  SELECT batch, cast(coalesce(sum(c * (c - 1) // 2), 0) as bigint) AS n_false_neg
  FROM (SELECT batch, fp, cast(count(*) as bigint) AS c FROM b GROUP BY batch, fp)
  GROUP BY batch
)
SELECT nb.batch, nb.n_docs,
       cast(nb.n_docs * (nb.n_docs - 1) // 2 as bigint) AS n_pairs,
       fn.n_false_neg,
       cast((fn.n_false_neg * 1000000) // (nb.n_docs * (nb.n_docs - 1) // 2) as bigint)
         AS fn_rate_micro
FROM nb JOIN fn ON nb.batch = fn.batch ORDER BY nb.batch
""",
)
def inbatch_negative_audit(spark, sf_dir):
    """In-batch false-negative audit for contrastive training — the
    check every embedding-training pipeline needs before trusting
    in-batch negatives: hash docs into training batches (md5 % 16) and
    count batch-internal pairs whose normalized-token fingerprints
    MATCH — pairs the loss would push apart that are actually the same
    document (the quiet gradient-noise source dedup is supposed to
    remove; split_leakage_audit catches cross-SPLIT twins, this
    catches same-BATCH twins). Per batch: docs, candidate pairs
    n·(n−1)/2, false-negative pairs Σ c·(c−1)/2 over fingerprint
    groups, and the micro rate. Scale shape: two hash aggs on (batch)
    and (batch, fp) — no pair materialization anywhere."""
    d = load(spark, sf_dir, "documents")
    b = d.select(
        "doc_id",
        (
            D.md5_long(F.concat(F.lit("batch:"), F.col("doc_id").cast("string"))) % 16
        ).alias("batch"),
        T.doc_fingerprint(F.col("text")).alias("fp"),
    )
    nb = b.groupBy("batch").agg(F.count("*").cast("long").alias("n_docs"))
    fn = (
        b.groupBy("batch", "fp")
        .agg(F.count("*").cast("long").alias("c"))
        .groupBy("batch")
        .agg(
            F.coalesce(F.sum(F.expr("c * (c - 1) div 2")), F.lit(0))
            .cast("long")
            .alias("n_false_neg")
        )
    )
    return (
        nb.join(fn, "batch")
        .select(
            "batch",
            "n_docs",
            F.expr("cast(n_docs * (n_docs - 1) div 2 as bigint)").alias("n_pairs"),
            "n_false_neg",
            F.expr(
                "cast((n_false_neg * 1000000) div (n_docs * (n_docs - 1) div 2)"
                " as bigint)"
            ).alias("fn_rate_micro"),
        )
        .orderBy("batch")
    )



@register("shard_balance_audit", _shard_balance_oracle_sql())
def shard_balance_audit(spark, sf_dir):
    """Shard-balance audit of the three partitioning strategies this
    engine actually chooses between at 100 TB — md5 HASH (the shuffle
    default), key RANGE (repartitionByRange), and Z-ORDER range (the
    spatial-locality layout zorder_cluster writes) — each assigning
    customers to 32 shards in one pass, reporting max/min shard
    population and imbalance = max/ideal in micro. Hash should sit
    near 10⁶ (its whole pitch), range inherits key-space skew, and
    zorder trades balance for locality — the audit quantifies exactly
    what that trade costs on THIS data, which is the number a
    partitioning decision needs (skew_diagnostics measures a join key;
    this compares layout strategies). Integer everywhere; maxima are
    1-row anchors, never driver state."""
    from gipspark.operators.zorder import morton_key

    cu = load(spark, sf_dir, "customer")
    gx = F.floor((C.derived_lon(F.col("c_custkey")) + 180.0) / 2.5).cast("long")
    gy = F.floor((90.0 - C.derived_lat(F.col("c_custkey"))) / 2.5).cast("long")
    base = cu.select(
        "c_custkey",
        (
            D.md5_long(F.concat(F.lit("sh:"), F.col("c_custkey").cast("string"))) % 32
        ).alias("h_shard"),
        morton_key(gx, gy).alias("mort"),
    ).localCheckpoint()
    anch = base.agg(
        F.max("c_custkey").cast("long").alias("mk"),
        F.max("mort").cast("long").alias("mm"),
        F.count("*").cast("long").alias("n"),
    )
    ba = base.crossJoin(F.broadcast(anch))
    assigned = (
        ba.select(F.lit("hash").alias("strategy"), F.col("h_shard").alias("shard"))
        .unionByName(
            ba.select(
                F.lit("range").alias("strategy"),
                F.expr("(c_custkey * 32) div (mk + 1)").alias("shard"),
            )
        )
        .unionByName(
            ba.select(
                F.lit("zorder").alias("strategy"),
                F.expr("(mort * 32) div (mm + 1)").alias("shard"),
            )
        )
    )
    sh = assigned.groupBy("strategy", "shard").agg(F.count("*").cast("long").alias("c"))
    return (
        sh.crossJoin(F.broadcast(anch))
        .groupBy("strategy")
        .agg(
            F.count("*").cast("long").alias("n_shards"),
            F.max("c").cast("long").alias("max_n"),
            F.min("c").cast("long").alias("min_n"),
            F.expr(
                "cast((max(c) * 32 * 1000000) div any_value(n) as bigint)"
            ).alias("imbalance_q"),
        )
        .orderBy("strategy")
    )



@register(
    "behavior_drift_users",
    """
WITH sp AS (SELECT min(epoch_us(ts)) // 1000000 AS t0, max(epoch_us(ts)) // 1000000 AS t1
            FROM events),
lab AS (
  SELECT user_id, event_type,
         CASE WHEN epoch_us(ts) // 1000000 * 2 < (SELECT t0 + t1 FROM sp) THEN 0 ELSE 1 END AS half
  FROM events
), cnt AS (
  SELECT user_id, event_type,
         cast(count(CASE WHEN half = 0 THEN 1 END) as bigint) AS c1,
         cast(count(CASE WHEN half = 1 THEN 1 END) as bigint) AS c2
  FROM lab GROUP BY user_id, event_type
), per0 AS (
  SELECT user_id, c1, c2,
         cast(sum(c1) OVER (PARTITION BY user_id) as bigint) AS ut1,
         cast(sum(c2) OVER (PARTITION BY user_id) as bigint) AS ut2
  FROM cnt
), per AS (
  SELECT user_id, any_value(ut1) AS t1, any_value(ut2) AS t2,
         cast(sum(abs(c1 * ut2 - c2 * ut1)) as bigint) AS num
  FROM per0 GROUP BY user_id
)
SELECT user_id, t1 AS n_first, t2 AS n_second,
       cast(CASE WHEN t1 = 0 OR t2 = 0 THEN 1000000
                 ELSE (num * 500000) // (t1 * t2) END as bigint) AS tvd_q
FROM per WHERE t1 + t2 > 0 ORDER BY user_id
""",
)
def behavior_drift_users(spark, sf_dir):
    """Per-user behavioral drift: total-variation distance between the
    event-type mix in the first vs second half of the observation
    window — TVD = ½ Σ|p₁−p₂| carried exactly as Σ|c₁T₂ − c₂T₁| over
    2T₁T₂ (cross-multiplied integers, one micro floor; a user active
    in only one half maxes out at 10⁶ by convention). The per-ACCOUNT
    early-warning under churn and account-takeover alarms: cadence
    ops (purchase_cadence, resurrection) see WHEN a user acts, this
    sees WHAT they do changing (tvd_token_drift is the corpus×token
    sibling; the per-user join shape is a window-free double agg).
    Scale shape: one (user, type) agg + one user agg + a 1-row span
    anchor."""
    e = load(spark, sf_dir, "events")
    sp = e.agg(
        F.min(F.unix_timestamp("ts")).alias("t0"),
        F.max(F.unix_timestamp("ts")).alias("t1s"),
    )
    lab = e.crossJoin(F.broadcast(sp)).select(
        "user_id",
        "event_type",
        F.when(F.unix_timestamp("ts") * 2 < F.col("t0") + F.col("t1s"), 0)
        .otherwise(1)
        .alias("half"),
    )
    cnt = lab.groupBy("user_id", "event_type").agg(
        F.count(F.when(F.col("half") == 0, 1)).cast("long").alias("c1"),
        F.count(F.when(F.col("half") == 1, 1)).cast("long").alias("c2"),
    )
    wt = Window.partitionBy("user_id")
    per = (
        cnt.withColumn("ut1", F.sum("c1").over(wt).cast("long"))
        .withColumn("ut2", F.sum("c2").over(wt).cast("long"))
        .groupBy("user_id")
        .agg(
            F.expr("any_value(ut1)").alias("t1"),
            F.expr("any_value(ut2)").alias("t2"),
            F.sum(F.abs(F.col("c1") * F.col("ut2") - F.col("c2") * F.col("ut1")))
            .cast("long")
            .alias("num"),
        )
    )
    return (
        per.filter(F.col("t1") + F.col("t2") > 0)
        .select(
            "user_id",
            F.col("t1").alias("n_first"),
            F.col("t2").alias("n_second"),
            F.when((F.col("t1") == 0) | (F.col("t2") == 0), F.lit(1000000))
            .otherwise(F.expr("(num * 500000) div (t1 * t2)"))
            .cast("long")
            .alias("tvd_q"),
        )
        .orderBy("user_id")
    )



@register(
    "partition_layout_audit",
    """
WITH schemes AS (
  SELECT 'by_lang' AS scheme, lang AS part FROM documents
  UNION ALL SELECT 'by_source', source FROM documents
  UNION ALL SELECT 'by_lang_source', concat(lang, '/', source) FROM documents
), pc AS (
  SELECT scheme, part, cast(count(*) as bigint) AS rows_
  FROM schemes GROUP BY scheme, part
), pc2 AS (
  SELECT scheme, part, rows_,
         cast(count(*) OVER (PARTITION BY scheme) as bigint) AS np
  FROM pc
), tot AS (SELECT cast(count(*) as bigint) AS n FROM documents)
SELECT pc2.scheme, cast(count(*) as bigint) AS n_partitions,
       cast(min(rows_) as bigint) AS min_rows, cast(max(rows_) as bigint) AS max_rows,
       cast((any_value(tot.n) * 1000) // count(*) as bigint) AS avg_rows_milli,
       cast((max(rows_) * count(*) * 1000000) // any_value(tot.n) as bigint) AS skew_q,
       cast(count(CASE WHEN rows_ * np * 4 < tot.n THEN 1 END) as bigint)
         AS n_small_parts
FROM pc2 CROSS JOIN tot GROUP BY pc2.scheme ORDER BY pc2.scheme
""",
)
def partition_layout_audit(spark, sf_dir):
    """Physical-layout audit of three partitionBy choices — the
    small-files / skew trade every lakehouse write decision makes
    (partition too fine → millions of tiny files choke the driver and
    NameNode; too coarse or skewed → one giant partition serializes
    every reader): for by_lang / by_source / by_lang_source, the
    partition count, min/max rows, skew = max/ideal micro, and the
    count of partitions under ¼ of the average (the small-file
    proxies). shard_balance_audit compares HASH-style strategies;
    this audits the VALUE-partitioned layouts a Hive/Iceberg
    `partitionBy` actually produces. One pass per scheme via a
    3-way label union, pure counting."""
    d = load(spark, sf_dir, "documents")
    schemes = (
        d.select(F.lit("by_lang").alias("scheme"), F.col("lang").alias("part"))
        .unionByName(
            d.select(F.lit("by_source").alias("scheme"), F.col("source").alias("part"))
        )
        .unionByName(
            d.select(
                F.lit("by_lang_source").alias("scheme"),
                F.concat_ws("/", "lang", "source").alias("part"),
            )
        )
    )
    pc = schemes.groupBy("scheme", "part").agg(F.count("*").cast("long").alias("rows_"))
    tot = d.agg(F.count("*").cast("long").alias("n"))
    wp = Window.partitionBy("scheme")
    pcw = pc.withColumn("np", F.count("*").over(wp).cast("long")).crossJoin(
        F.broadcast(tot)
    )
    return (
        pcw.groupBy("scheme")
        .agg(
            F.count("*").cast("long").alias("n_partitions"),
            F.min("rows_").cast("long").alias("min_rows"),
            F.max("rows_").cast("long").alias("max_rows"),
            F.expr("cast((any_value(n) * 1000) div count(*) as bigint)").alias(
                "avg_rows_milli"
            ),
            F.expr(
                "cast((max(rows_) * count(*) * 1000000) div any_value(n) as bigint)"
            ).alias("skew_q"),
            F.count(F.when(F.col("rows_") * F.col("np") * 4 < F.col("n"), 1))
            .cast("long")
            .alias("n_small_parts"),
        )
        .orderBy("scheme")
    )



@register(
    "filter_parity_audit",
    f"""
WITH pass AS (
  SELECT lang,
         CASE WHEN n_chars >= 120
               AND 2 * len(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')))
                   >= len(regexp_split_to_array(lower(trim(text)), '\\s+'))
              THEN 1 ELSE 0 END AS ok
  FROM documents
), agg AS (
  SELECT lang, cast(count(*) as bigint) AS n,
         cast(sum(ok) as bigint) AS n_pass
  FROM pass GROUP BY lang
), tot AS (SELECT cast(sum(n) as bigint) AS tn, cast(sum(n_pass) as bigint) AS tp FROM agg)
SELECT a.lang, a.n AS n_docs, a.n_pass,
       cast((a.n_pass * 1000000) // a.n as bigint) AS pass_q,
       cast((a.n_pass * t.tn * 1000000) // (a.n * t.tp) as bigint) AS parity_q,
       CASE WHEN a.n_pass * t.tn * 5 < a.n * t.tp * 4 THEN 1 ELSE 0 END AS disparate
FROM agg a CROSS JOIN tot t ORDER BY a.lang
""",
)
def filter_parity_audit(spark, sf_dir):
    """Demographic-parity audit of a curation filter across languages
    — the fairness check multilingual corpus work keeps learning the
    hard way (length/repetition heuristics tuned on English silently
    delete low-resource languages): a representative quality gate
    (length ≥ 120 chars AND type/token ratio ≥ ½) is scored per lang,
    and parity_q = lang pass rate / corpus pass rate in micro, with
    the four-fifths disparate-impact flag (the EEOC rule transplanted
    to data curation) as a cross-multiplied integer comparison. A
    flagged lang needs its own thresholds before the filter ships.
    One pass + lang agg + 1-row anchor; no division before any
    comparison."""
    d = load(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    ok = (
        (F.col("n_chars") >= 120)
        & (2 * F.size(F.array_distinct(toks)) >= F.size(toks))
    ).cast("int")
    agg = d.select("lang", ok.alias("ok")).groupBy("lang").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("ok").cast("long").alias("n_pass"),
    )
    tot = agg.agg(
        F.sum("n").cast("long").alias("tn"), F.sum("n_pass").cast("long").alias("tp")
    )
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            F.col("n").alias("n_docs"),
            "n_pass",
            F.expr("cast((n_pass * 1000000) div n as bigint)").alias("pass_q"),
            F.expr("cast((n_pass * tn * 1000000) div (n * tp) as bigint)").alias(
                "parity_q"
            ),
            F.when(
                F.col("n_pass") * F.col("tn") * 5 < F.col("n") * F.col("tp") * 4, 1
            )
            .otherwise(0)
            .alias("disparate"),
        )
        .orderBy("lang")
    )



@register(
    "table_reconciliation_audit",
    f"""
WITH li AS (
  SELECT l_orderkey,
         cast(count(*) as bigint) AS n_items,
         cast(sum(cast(round(cast(l_extendedprice as {DEC}) * 100) as bigint)) as bigint)
           AS item_cents
  FROM lineitem GROUP BY l_orderkey
), jo AS (
  SELECT o.o_orderkey,
         cast(round(cast(o.o_totalprice as {DEC}) * 100) as bigint) AS order_cents,
         li.n_items, li.item_cents
  FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey
)
SELECT cast(count(*) as bigint) AS n_orders,
       cast(count(n_items) as bigint) AS n_with_items,
       cast(count(*) - count(n_items) as bigint) AS n_orphan_orders,
       cast(sum(CASE WHEN n_items IS NOT NULL
                      AND abs(item_cents - order_cents) * 100 <= order_cents
                     THEN 1 ELSE 0 END) as bigint) AS n_within_1pct,
       cast(sum(CASE WHEN n_items IS NOT NULL THEN abs(item_cents - order_cents)
                     ELSE 0 END) as bigint) AS sum_abs_gap_cents,
       cast((sum(CASE WHEN n_items IS NOT NULL THEN abs(item_cents - order_cents)
                      ELSE 0 END) * 1000000)
            // greatest(sum(CASE WHEN n_items IS NOT NULL THEN order_cents ELSE 0 END), 1)
            as bigint) AS gap_q
FROM jo
""",
)
def table_reconciliation_audit(spark, sf_dir):
    """Cross-table reconciliation — the warehouse trial balance: does
    the order header total equal the sum of its line items? Reports
    orphan orders (no lines — broken FK the other direction from
    fk_integrity_audit), the share of orders whose header agrees with
    its lines within 1% (cross-multiplied, no division), and the
    total absolute gap in exact cents with its micro share of booked
    revenue — the first number a finance-data team checks after any
    pipeline change, because silent header/line divergence means
    every downstream aggregate is wrong in a way per-table checks
    can't see. One lineitem rollup + one left equi-join + one fold."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    lr = li.groupBy("l_orderkey").agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum(F.round(F.col("l_extendedprice").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("item_cents"),
    )
    jo = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("order_cents"),
    ).join(lr, o.o_orderkey == lr.l_orderkey, "left")
    gap = F.when(
        F.col("n_items").isNotNull(), F.abs(F.col("item_cents") - F.col("order_cents"))
    ).otherwise(0)
    return jo.agg(
        F.count("*").cast("long").alias("n_orders"),
        F.count("n_items").cast("long").alias("n_with_items"),
        (F.count("*") - F.count("n_items")).cast("long").alias("n_orphan_orders"),
        F.sum(
            F.when(
                F.col("n_items").isNotNull()
                & (F.abs(F.col("item_cents") - F.col("order_cents")) * 100
                   <= F.col("order_cents")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_within_1pct"),
        F.sum(gap).cast("long").alias("sum_abs_gap_cents"),
        F.expr(
            "cast((sum(CASE WHEN n_items IS NOT NULL"
            " THEN abs(item_cents - order_cents) ELSE 0 END) * 1000000)"
            " div greatest(sum(CASE WHEN n_items IS NOT NULL THEN order_cents"
            " ELSE 0 END), 1L) as bigint)"
        ).alias("gap_q"),
    )



@register(
    "nation_consistency_audit",
    f"""
WITH nc AS (
  SELECT n_nationkey AS nk,
         (cast(n_nationkey as bigint) * {C.LON_MUL}) % {C.LON_MOD} - 180000 AS nx,
         (cast(n_nationkey as bigint) * {C.LAT_MUL}) % {C.LAT_MOD} - 60000 AS ny
  FROM nation
), cu AS (
  SELECT c_custkey, c_nationkey,
         (cast(c_custkey as bigint) * {C.LON_MUL}) % {C.LON_MOD} - 180000 AS x,
         (cast(c_custkey as bigint) * {C.LAT_MUL}) % {C.LAT_MOD} - 60000 AS y
  FROM customer
), near AS (
  SELECT c_custkey, c_nationkey, nk, d2,
         row_number() OVER (PARTITION BY c_custkey ORDER BY d2 ASC, nk ASC) AS rn
  FROM (SELECT cu.c_custkey, cu.c_nationkey, nc.nk,
               (cu.x - nc.nx) * (cu.x - nc.nx) + (cu.y - nc.ny) * (cu.y - nc.ny) AS d2
        FROM cu CROSS JOIN nc)
)
SELECT c_nationkey AS stored_nation,
       cast(count(*) as bigint) AS n_customers,
       cast(count(CASE WHEN nk = c_nationkey THEN 1 END) as bigint) AS n_consistent,
       cast((count(CASE WHEN nk = c_nationkey THEN 1 END) * 1000000) // count(*)
            as bigint) AS consistent_q
FROM near WHERE rn = 1 GROUP BY c_nationkey ORDER BY stored_nation
""",
)
def nation_consistency_audit(spark, sf_dir):
    """Stored-attribute vs geocode consistency — the reference-data
    audit every CRM runs after an address migration: does each
    customer's STORED nation key agree with the nation whose derived
    center is spatially nearest to the customer's derived location?
    Per stored nation: customers, agreements, and the consistency
    rate in micro — a nation whose rate craters has a systematic
    entry error or a remapped key (reverse_geocode_customers assigns
    the spatial answer; this DIFFS it against the recorded one,
    which is the operation that finds the bug). 25-row nation-center
    broadcast × customers + per-customer argmin window; exact
    integer milli-degree d²."""
    na = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk"),
        ((F.col("n_nationkey").cast("long") * C.LON_MUL) % C.LON_MOD - 180000).alias(
            "nx"
        ),
        ((F.col("n_nationkey").cast("long") * C.LAT_MUL) % C.LAT_MOD - 60000).alias(
            "ny"
        ),
    )
    cu = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        ((F.col("c_custkey").cast("long") * C.LON_MUL) % C.LON_MOD - 180000).alias("x"),
        ((F.col("c_custkey").cast("long") * C.LAT_MUL) % C.LAT_MOD - 60000).alias("y"),
    )
    cand = cu.crossJoin(F.broadcast(na)).select(
        "c_custkey",
        "c_nationkey",
        "nk",
        (
            (F.col("x") - F.col("nx")) * (F.col("x") - F.col("nx"))
            + (F.col("y") - F.col("ny")) * (F.col("y") - F.col("ny"))
        ).alias("d2"),
    )
    w = Window.partitionBy("c_custkey").orderBy(F.col("d2").asc(), F.col("nk").asc())
    near = cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        near.groupBy(F.col("c_nationkey").alias("stored_nation"))
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.count(F.when(F.col("nk") == F.col("c_nationkey"), 1))
            .cast("long")
            .alias("n_consistent"),
            F.expr(
                "cast((count(CASE WHEN nk = c_nationkey THEN 1 END) * 1000000)"
                " div count(*) as bigint)"
            ).alias("consistent_q"),
        )
        .orderBy("stored_nation")
    )



@register(
    "suppression_loss_audit",
    """
WITH cells AS (
    SELECT lang, source, cast(count(*) as bigint) AS n FROM documents GROUP BY lang, source
), tot AS (SELECT cast(sum(n) as bigint) AS tn, cast(count(*) as bigint) AS tc FROM cells),
ks(k) AS (VALUES (3), (5), (10))
SELECT cast(ks.k as bigint) AS min_cell,
       any_value(tot.tc) AS n_cells,
       cast(count(CASE WHEN c.n < ks.k THEN 1 END) as bigint) AS n_suppressed_cells,
       cast(sum(CASE WHEN c.n < ks.k THEN c.n ELSE 0 END) as bigint) AS n_rows_lost,
       cast((sum(CASE WHEN c.n >= ks.k THEN c.n ELSE 0 END) * 1000000)
            // any_value(tot.tn) as bigint) AS retained_q
FROM cells c CROSS JOIN ks CROSS JOIN tot
GROUP BY ks.k ORDER BY min_cell
""",
)
def suppression_loss_audit(spark, sf_dir):
    """Small-cell suppression cost — the census/statistical-disclosure
    control rule ('suppress any published cell with fewer than k
    contributors') priced on the lang×source table at k = 3/5/10:
    cells suppressed, rows silenced, and the share of the corpus the
    release still describes (retained_q). The anonymization_ladder
    audits COARSENING (merge bands until k holds); this audits the
    alternative — publish fine cells and DELETE the small ones — and
    the two outputs together are the generalize-vs-suppress frontier
    every disclosure board actually debates. One contingency agg +
    3-row k dim + 1-row total anchor; cross-multiplied, exact."""
    d = load(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(F.count("*").cast("long").alias("n"))
    tot = cells.agg(
        F.sum("n").cast("long").alias("tn"), F.count("*").cast("long").alias("tc")
    )
    ks = spark.range(1).select(
        F.explode(F.array(F.lit(3), F.lit(5), F.lit(10))).alias("k")
    )
    return (
        cells.crossJoin(F.broadcast(ks))
        .crossJoin(F.broadcast(tot))
        .groupBy("k")
        .agg(
            F.expr("any_value(tc)").alias("n_cells"),
            F.count(F.when(F.col("n") < F.col("k"), 1))
            .cast("long")
            .alias("n_suppressed_cells"),
            F.sum(F.when(F.col("n") < F.col("k"), F.col("n")).otherwise(0))
            .cast("long")
            .alias("n_rows_lost"),
            F.expr(
                "cast((sum(CASE WHEN n >= k THEN n ELSE 0 END) * 1000000)"
                " div any_value(tn) as bigint)"
            ).alias("retained_q"),
        )
        .select(
            F.col("k").cast("long").alias("min_cell"),
            "n_cells",
            "n_suppressed_cells",
            "n_rows_lost",
            "retained_q",
        )
        .orderBy("min_cell")
    )



@register(
    "zone_map_skipping_audit",
    f"""
WITH base AS (
  SELECT l_shipdate,
         row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS rn_nat,
         row_number() OVER (ORDER BY l_shipdate, l_orderkey, l_linenumber) - 1
           AS rn_srt
  FROM lineitem
), files AS (
  SELECT 'natural' AS layout, rn_nat // {_ZM_FILE_ROWS} AS file_id, l_shipdate
  FROM base
  UNION ALL
  SELECT 'shipdate' AS layout, rn_srt // {_ZM_FILE_ROWS} AS file_id, l_shipdate
  FROM base
), zm AS (
  SELECT layout, file_id, min(l_shipdate) AS lo, max(l_shipdate) AS hi,
         cast(count(*) as bigint) AS n_rows
  FROM files GROUP BY layout, file_id
), preds AS (
  SELECT * FROM (VALUES {", ".join(f"({pid}, DATE '{lo}', DATE '{hi}')" for pid, lo, hi in _ZM_PREDS)})
    AS p(pred_id, p_lo, p_hi)
), hit AS (
  SELECT z.layout, p.pred_id,
         cast(count(*) as bigint) AS n_files_scanned,
         cast(sum(z.n_rows) as bigint) AS rows_scanned
  FROM zm z JOIN preds p
    ON z.lo < p.p_hi AND z.hi >= p.p_lo
  GROUP BY z.layout, p.pred_id
), tot AS (
  SELECT layout, cast(count(*) as bigint) AS n_files_total,
         cast(sum(n_rows) as bigint) AS n_rows_total
  FROM zm GROUP BY layout
), match AS (
  SELECT p.pred_id, cast(count(*) as bigint) AS n_rows_matched
  FROM lineitem l JOIN preds p
    ON l.l_shipdate >= p.p_lo AND l.l_shipdate < p.p_hi
  GROUP BY p.pred_id
)
SELECT t.layout AS layout, h.pred_id AS pred_id, t.n_files_total, h.n_files_scanned,
       h.rows_scanned, m.n_rows_matched,
       cast(((t.n_files_total - h.n_files_scanned) * 1000000)
            // t.n_files_total as bigint) AS skip_ratio_q
FROM tot t JOIN hit h ON h.layout = t.layout
JOIN match m ON m.pred_id = h.pred_id
ORDER BY layout, pred_id
""",
)
def zone_map_skipping_audit(spark, sf_dir):
    """Zone-map (file min/max) skipping effectiveness audit — the
    lakehouse data-layout question behind every CLUSTER BY decision:
    simulate {_ZM_FILE_ROWS}-row files under two physical layouts
    (natural l_orderkey write order vs sorted by l_shipdate), compute
    each file's shipdate zone map, and for three date predicates
    report files scanned under min/max pruning vs rows actually
    matched. A shipdate-clustered layout should push skip_ratio_q near
    10⁶·(1−selectivity) while the natural layout scans almost every
    file — the quantified argument for paying one global sort at write
    time that partition_layout_audit makes for directory partitioning
    and zorder_cluster_customers makes in two dimensions. Plan: two
    ranking windows (the simulated writers), one zone-map agg, a
    broadcast predicate join — no shuffle beyond the sorts."""
    li = load(spark, sf_dir, "lineitem")
    w_nat = Window.orderBy("l_orderkey", "l_linenumber")
    w_srt = Window.orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    base = li.select(
        "l_shipdate",
        (F.row_number().over(w_nat) - 1).alias("rn_nat"),
        (F.row_number().over(w_srt) - 1).alias("rn_srt"),
    )
    files = base.select(
        F.lit("natural").alias("layout"),
        (F.col("rn_nat") / _ZM_FILE_ROWS).cast("long").alias("file_id"),
        "l_shipdate",
    ).unionByName(
        base.select(
            F.lit("shipdate").alias("layout"),
            (F.col("rn_srt") / _ZM_FILE_ROWS).cast("long").alias("file_id"),
            "l_shipdate",
        )
    )
    zm = files.groupBy("layout", "file_id").agg(
        F.min("l_shipdate").alias("lo"),
        F.max("l_shipdate").alias("hi"),
        F.count("*").cast("long").alias("n_rows"),
    )
    preds = spark.createDataFrame(
        [(pid, lo, hi) for pid, lo, hi in _ZM_PREDS], "pred_id int, p_lo string, p_hi string"
    ).select(
        "pred_id",
        F.to_timestamp("p_lo").alias("p_lo"),
        F.to_timestamp("p_hi").alias("p_hi"),
    )
    hit = (
        zm.join(
            F.broadcast(preds),
            (F.col("lo") < F.col("p_hi")) & (F.col("hi") >= F.col("p_lo")),
        )
        .groupBy("layout", "pred_id")
        .agg(
            F.count("*").cast("long").alias("n_files_scanned"),
            F.sum("n_rows").cast("long").alias("rows_scanned"),
        )
    )
    tot = zm.groupBy("layout").agg(
        F.count("*").cast("long").alias("n_files_total"),
        F.sum("n_rows").cast("long").alias("n_rows_total"),
    )
    match = (
        li.join(
            F.broadcast(preds),
            (F.col("l_shipdate") >= F.col("p_lo")) & (F.col("l_shipdate") < F.col("p_hi")),
        )
        .groupBy("pred_id")
        .agg(F.count("*").cast("long").alias("n_rows_matched"))
    )
    return (
        tot.join(hit, "layout")
        .join(match, "pred_id")
        .select(
            "layout",
            "pred_id",
            "n_files_total",
            "n_files_scanned",
            "rows_scanned",
            "n_rows_matched",
            F.expr(
                "((n_files_total - n_files_scanned) * 1000000) div n_files_total"
            ).alias("skip_ratio_q"),
        )
        .orderBy("layout", "pred_id")
    )



@register(
    "l_diversity_audit",
    f"""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
         cast(count(*) as bigint) AS n_rows,
         cast(count(DISTINCT cast(floor(c_acctbal / {_LDIV_BUCKET}) as int)) as bigint)
           AS l_val
  FROM customer GROUP BY c_nationkey, c_mktsegment
), ls AS (SELECT * FROM (VALUES {", ".join(f"({v})" for v in _LDIV_LS)}) AS l(l_min))
SELECT l.l_min,
       cast(count(*) as bigint) AS n_classes,
       cast(count(CASE WHEN c.l_val < l.l_min THEN 1 END) as bigint)
         AS n_classes_failing,
       cast(sum(CASE WHEN c.l_val < l.l_min THEN c.n_rows ELSE 0 END) as bigint)
         AS n_rows_exposed,
       cast(min(c.l_val) as bigint) AS min_l,
       cast((sum(CASE WHEN c.l_val < l.l_min THEN c.n_rows ELSE 0 END) * 1000000)
            // sum(c.n_rows) as bigint) AS exposed_share_q
FROM classes c CROSS JOIN ls l
GROUP BY l.l_min ORDER BY l_min
""",
)
def l_diversity_audit(spark, sf_dir):
    """l-diversity audit — the missing rung between k_anonymity_audit
    (are groups BIG enough?) and t_closeness_audit (do group
    distributions MATCH the population?): within each quasi-identifier
    class (nation × market segment), how many DISTINCT sensitive
    values (account-balance {_LDIV_BUCKET:.0f}-unit buckets) appear?
    A class can pass k-anonymity with 50 rows and still leak —
    if all 50 share one balance bucket, membership reveals the
    sensitive value exactly (the homogeneity attack l-diversity was
    invented for). Reports, per required l ∈ {_LDIV_LS}, the failing
    classes and exposed-row share in micro. One hash agg over the QI
    key + a 3-row literal dim — scale-free."""
    cust = load(spark, sf_dir, "customer")
    classes = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.countDistinct(F.floor(F.col("c_acctbal") / _LDIV_BUCKET).cast("int"))
        .cast("long")
        .alias("l_val"),
    )
    ls = spark.createDataFrame([(v,) for v in _LDIV_LS], "l_min int")
    return (
        classes.crossJoin(F.broadcast(ls))
        .groupBy("l_min")
        .agg(
            F.count("*").cast("long").alias("n_classes"),
            F.count(F.when(F.col("l_val") < F.col("l_min"), 1))
            .cast("long")
            .alias("n_classes_failing"),
            F.sum(F.when(F.col("l_val") < F.col("l_min"), F.col("n_rows")).otherwise(0))
            .cast("long")
            .alias("n_rows_exposed"),
            F.min("l_val").cast("long").alias("min_l"),
            F.expr(
                "(sum(CASE WHEN l_val < l_min THEN n_rows ELSE 0 END) * 1000000)"
                " div sum(n_rows)"
            ).alias("exposed_share_q"),
        )
        .orderBy("l_min")
    )



@register(
    "incremental_agg_merge_contract",
    f"""
WITH tagged AS (
  SELECT user_id, epoch_us(ts) // 1000000 // 86400 AS d,
         cast(round(cast(value as {DEC}) * 100) as bigint) AS cents,
         ts < TIMESTAMP '{_IVM_SPLIT}' AS is_base
  FROM events
), partial AS (
  SELECT user_id, d, is_base,
         cast(count(*) as bigint) AS cnt, cast(sum(cents) as bigint) AS s,
         cast(min(cents) as bigint) AS mn, cast(max(cents) as bigint) AS mx
  FROM tagged GROUP BY user_id, d, is_base
), merged_day AS (
  SELECT user_id, d,
         cast(sum(cnt) as bigint) AS cnt, cast(sum(s) as bigint) AS s,
         cast(min(mn) as bigint) AS mn, cast(max(mx) as bigint) AS mx
  FROM partial GROUP BY user_id, d
), merged AS (
  SELECT user_id, cast(sum(cnt) as bigint) AS n_events,
         cast(sum(s) as bigint) AS sum_cents,
         cast(min(mn) as bigint) AS min_cents, cast(max(mx) as bigint) AS max_cents,
         cast(count(*) as bigint) AS n_days
  FROM merged_day GROUP BY user_id
), recomputed AS (
  SELECT user_id, cast(count(*) as bigint) AS n_events,
         cast(sum(cents) as bigint) AS sum_cents,
         cast(min(cents) as bigint) AS min_cents, cast(max(cents) as bigint) AS max_cents,
         cast(count(DISTINCT d) as bigint) AS n_days
  FROM tagged GROUP BY user_id
)
SELECT m.user_id AS user_id, m.n_events, m.sum_cents, m.min_cents, m.max_cents,
       m.n_days,
       (m.n_events = r.n_events AND m.sum_cents = r.sum_cents
        AND m.min_cents = r.min_cents AND m.max_cents = r.max_cents
        AND m.n_days = r.n_days) AS ok
FROM merged m JOIN recomputed r ON r.user_id = m.user_id
ORDER BY user_id
""",
)
def incremental_agg_merge_contract(spark, sf_dir):
    """Incremental view maintenance (IVM) merge contract for a keyed
    aggregate table: maintain per-user (count, sum, min, max,
    distinct-active-days) by MERGING day-level partial aggregates of a
    base batch (before {_IVM_SPLIT}) with a later delta batch, and
    assert the merged state equals a full recompute — the algebra
    every aggregate materialized view / streaming upsert sink depends
    on (count/sum/min/max merge directly; COUNT DISTINCT is only
    mergeable through the day-grain partial, which is exactly why the
    partial keeps (user, day) rows — the general lesson: keep partials
    at the finest grain any distinct references). Money is exact
    cents. Scale shape: the delta pass touches ONLY delta rows plus
    the (small) partial-aggregate table — never the base fact table;
    pyramid_incremental_update is this same contract for spatial
    rollups, merge_upsert_customers for raw rows."""
    ev = load(spark, sf_dir, "events")
    tagged = ev.select(
        "user_id",
        F.expr("unix_timestamp(ts) div 86400").alias("d"),
        F.round(F.col("value").cast(DEC) * 100).cast("long").alias("cents"),
        (F.col("ts") < F.lit(_IVM_SPLIT).cast("timestamp")).alias("is_base"),
    )
    partial = tagged.groupBy("user_id", "d", "is_base").agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum("cents").cast("long").alias("s"),
        F.min("cents").cast("long").alias("mn"),
        F.max("cents").cast("long").alias("mx"),
    )
    merged_day = partial.groupBy("user_id", "d").agg(
        F.sum("cnt").cast("long").alias("cnt"),
        F.sum("s").cast("long").alias("s"),
        F.min("mn").cast("long").alias("mn"),
        F.max("mx").cast("long").alias("mx"),
    )
    merged = merged_day.groupBy("user_id").agg(
        F.sum("cnt").cast("long").alias("n_events"),
        F.sum("s").cast("long").alias("sum_cents"),
        F.min("mn").cast("long").alias("min_cents"),
        F.max("mx").cast("long").alias("max_cents"),
        F.count("*").cast("long").alias("n_days"),
    )
    recomputed = tagged.groupBy("user_id").agg(
        F.count("*").cast("long").alias("rn_events"),
        F.sum("cents").cast("long").alias("rsum_cents"),
        F.min("cents").cast("long").alias("rmin_cents"),
        F.max("cents").cast("long").alias("rmax_cents"),
        F.countDistinct("d").cast("long").alias("rn_days"),
    )
    return (
        merged.join(recomputed, "user_id")
        .select(
            "user_id",
            "n_events",
            "sum_cents",
            "min_cents",
            "max_cents",
            "n_days",
            (
                (F.col("n_events") == F.col("rn_events"))
                & (F.col("sum_cents") == F.col("rsum_cents"))
                & (F.col("min_cents") == F.col("rmin_cents"))
                & (F.col("max_cents") == F.col("rmax_cents"))
                & (F.col("n_days") == F.col("rn_days"))
            ).alias("ok"),
        )
        .orderBy("user_id")
    )



@register(
    "week_semantics_contract",
    """
WITH d AS (
  SELECT DISTINCT cast(o_orderdate as date) AS dt FROM orders
), k AS (
  SELECT dt, cast(year(dt) as int) AS yr,
         cast(isoyear(dt) as int) AS iso_yr,
         cast(weekofyear(dt) as int) AS iso_wk,
         cast(epoch(cast(dt as timestamp)) // 604800 as bigint) AS epoch_wk
  FROM d
)
SELECT yr,
       cast(count(*) as bigint) AS n_dates,
       cast(count(CASE WHEN iso_yr != yr THEN 1 END) as bigint) AS n_iso_spill_days,
       cast(count(DISTINCT (iso_yr, iso_wk)) as bigint) AS n_iso_weeks,
       cast(count(DISTINCT epoch_wk) as bigint) AS n_epoch_weeks,
       cast(max(iso_wk) as int) AS max_iso_week
FROM k GROUP BY yr ORDER BY yr
""",
)
def week_semantics_contract(spark, sf_dir):
    """Week-semantics contract — the 'week 53 bug' made explicit: for
    every order year, how many calendar days belong to a DIFFERENT ISO
    week-year (the Dec 29–Jan 3 spill that breaks any join keyed on
    (year(d), weekofyear(d)) instead of (isoyear, week)), how many ISO
    weeks vs naive epoch//604800 weeks the year contains (52 vs 53 vs
    the epoch grid that ignores years entirely), and whether a week 53
    exists. Every weekly rollup in the registry buckets by epoch-week
    precisely to dodge this; the contract MEASURES what it dodges, and
    pins that Spark's weekofyear/YEAROFWEEK and the oracle's
    weekofyear/isoyear implement the same ISO-8601 rule. One distinct
    + one hash agg — calendar-bounded."""
    o = load(spark, sf_dir, "orders")
    d = o.select(F.col("o_orderdate").cast("date").alias("dt")).distinct()
    k = d.select(
        "dt",
        F.year("dt").cast("int").alias("yr"),
        F.expr("extract(YEAROFWEEK FROM dt)").cast("int").alias("iso_yr"),
        F.weekofyear("dt").cast("int").alias("iso_wk"),
        F.expr("unix_timestamp(cast(dt as timestamp)) div 604800").alias("epoch_wk"),
    )
    return (
        k.groupBy("yr")
        .agg(
            F.count("*").cast("long").alias("n_dates"),
            F.count(F.when(F.col("iso_yr") != F.col("yr"), 1))
            .cast("long")
            .alias("n_iso_spill_days"),
            F.countDistinct("iso_yr", "iso_wk").cast("long").alias("n_iso_weeks"),
            F.countDistinct("epoch_wk").cast("long").alias("n_epoch_weeks"),
            F.max("iso_wk").cast("int").alias("max_iso_week"),
        )
        .orderBy("yr")
    )



@register(
    "encoding_advisor_lineitem",
    f"""
WITH src AS (
  SELECT cast(l_quantity as bigint) AS l_quantity_i, l_partkey,
         l_returnflag, l_linestatus, cast(NULL as varchar) AS l_shipmode_na,
         row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
  FROM lineitem
), long AS (
  SELECT 'l_returnflag' AS col, cast(l_returnflag as varchar) AS v, rn FROM src
  UNION ALL
  SELECT 'l_linestatus', cast(l_linestatus as varchar), rn FROM src
  UNION ALL
  SELECT 'l_shipmode_na', l_shipmode_na, rn FROM src
  UNION ALL
  SELECT 'l_quantity_i', cast(l_quantity_i as varchar), rn FROM src
  UNION ALL
  SELECT 'l_partkey', cast(l_partkey as varchar), rn FROM src
), runs AS (
  SELECT col, v, rn,
         CASE WHEN v IS NOT DISTINCT FROM
                   lag(v) OVER (PARTITION BY col ORDER BY rn)
              THEN 0 ELSE 1 END AS is_run_start
  FROM long
), st AS (
  SELECT col, cast(count(*) as bigint) AS n_rows,
         cast(count(DISTINCT v) as bigint) AS n_distinct,
         cast(sum(is_run_start) as bigint) AS n_runs
  FROM runs GROUP BY col
)
SELECT col, n_rows, n_distinct, n_runs,
       cast((n_rows * 1000000) // greatest(n_runs, 1) as bigint) AS avg_run_len_q,
       cast({_blen_sql("greatest(n_distinct - 1, 1)")} as int) AS dict_bits,
       CASE WHEN n_runs * 10 <= n_rows THEN 'rle_dict'
            WHEN n_distinct * 100 <= n_rows THEN 'dict'
            ELSE 'plain' END AS advice
FROM st ORDER BY col
""",
)
def encoding_advisor_lineitem(spark, sf_dir):
    """Column-encoding advisor — the per-column statistics a parquet/
    ORC writer consults before choosing PLAIN vs DICTIONARY vs
    RLE_DICTIONARY: distinct-value count (dictionary viability and its
    index width in bits, via the integer bit-length ladder), run count
    in the natural write order (RLE viability; avg run length in
    micro), and the resulting advice per column — including an
    all-NULL column (definition levels make it nearly free) and a
    high-cardinality key (where a dictionary would balloon). This is
    zone_map_skipping_audit's sibling one level down: that op prices
    the LAYOUT, this prices the ENCODING. Null-safe run detection via
    IS NOT DISTINCT FROM/<=>; one ranking window (the simulated write
    order), one per-column lag, one agg over a 5-column unpivot."""
    li = load(spark, sf_dir, "lineitem")
    src = li.select(
        F.col("l_quantity").cast("long").alias("l_quantity_i"),
        "l_partkey",
        "l_returnflag",
        "l_linestatus",
        F.lit(None).cast("string").alias("l_shipmode_na"),
        F.row_number().over(Window.orderBy("l_orderkey", "l_linenumber")).alias("rn"),
    )
    parts = []
    for c in _ENC_COLS:
        parts.append(
            src.select(
                F.lit(c).alias("col"), F.col(c).cast("string").alias("v"), "rn"
            )
        )
    long_df = parts[0]
    for p in parts[1:]:
        long_df = long_df.unionByName(p)
    runs = long_df.select(
        "col",
        "v",
        F.when(F.expr("v <=> lag(v) OVER (PARTITION BY col ORDER BY rn)"), 0)
        .otherwise(1)
        .alias("is_run_start"),
    )
    st = runs.groupBy("col").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.countDistinct("v").cast("long").alias("n_distinct"),
        F.sum("is_run_start").cast("long").alias("n_runs"),
    )
    return st.select(
        "col",
        "n_rows",
        "n_distinct",
        "n_runs",
        F.expr("(n_rows * 1000000) div greatest(n_runs, 1)").alias("avg_run_len_q"),
        _blen_col(F.greatest(F.col("n_distinct") - 1, F.lit(1))).cast("int").alias("dict_bits"),
        F.when(F.col("n_runs") * 10 <= F.col("n_rows"), "rle_dict")
        .when(F.col("n_distinct") * 100 <= F.col("n_rows"), "dict")
        .otherwise("plain")
        .alias("advice"),
    ).orderBy("col")



@register(
    "rollup_additivity_audit",
    f"""
WITH cust_rev AS (
  SELECT o_custkey, cast(sum(cast(round(cast(o_totalprice as {DEC}) * 100) as bigint))
                         as bigint) AS cents
  FROM orders GROUP BY o_custkey
), nat_direct AS (
  SELECT c.c_nationkey, cast(sum(r.cents) as bigint) AS cents
  FROM cust_rev r JOIN customer c ON c.c_custkey = r.o_custkey
  GROUP BY c.c_nationkey
), reg_from_nat AS (
  SELECT n.n_regionkey, cast(sum(d.cents) as bigint) AS cents
  FROM nat_direct d JOIN nation n ON n.n_nationkey = d.c_nationkey
  GROUP BY n.n_regionkey
), reg_direct AS (
  SELECT n.n_regionkey, cast(sum(r.cents) as bigint) AS cents
  FROM cust_rev r JOIN customer c ON c.c_custkey = r.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY n.n_regionkey
), lvl AS (
  SELECT 'nation_to_region' AS level,
         cast(count(*) as bigint) AS n_parents,
         cast(count(CASE WHEN a.cents != b.cents THEN 1 END) as bigint)
           AS n_mismatched,
         cast(sum(a.cents) as bigint) AS total_cents
  FROM reg_from_nat a JOIN reg_direct b ON b.n_regionkey = a.n_regionkey
  UNION ALL
  SELECT 'grand_total',
         1,
         CASE WHEN (SELECT sum(cents) FROM reg_from_nat)
                   != (SELECT sum(cents) FROM cust_rev) THEN 1 ELSE 0 END,
         cast((SELECT sum(cents) FROM reg_from_nat) as bigint)
)
SELECT level, n_parents, n_mismatched, total_cents,
       (n_mismatched = 0) AS additive
FROM lvl ORDER BY level
""",
)
def rollup_additivity_audit(spark, sf_dir):
    """Rollup additivity audit — the warehouse invariant every
    aggregate table depends on: summing customer revenue to nations
    and then nations to regions must equal summing customers straight
    to regions, and the grand total must survive every path (violated
    in practice by lossy joins — a customer with a dangling nation
    key silently vanishes from one path but not the other, which is
    exactly what fk_integrity_audit counts and THIS op shows the
    blast radius of, in cents). Both paths computed independently,
    compared per parent, asserted additive — exact cents, no
    tolerance. Three hash aggs and two tiny dim joins; at any scale
    this audit costs one pass over the aggregate tables, not the
    facts."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    cust_rev = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    nat_direct = (
        cust_rev.join(c, c["c_custkey"] == cust_rev["o_custkey"])
        .groupBy("c_nationkey")
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    reg_from_nat = (
        nat_direct.join(n, n["n_nationkey"] == nat_direct["c_nationkey"])
        .groupBy("n_regionkey")
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    reg_direct = (
        cust_rev.join(c, c["c_custkey"] == cust_rev["o_custkey"])
        .join(n, n["n_nationkey"] == c["c_nationkey"])
        .groupBy(n["n_regionkey"].alias("rk"))
        .agg(F.sum("cents").cast("long").alias("cents2"))
    )
    lvl1 = (
        reg_from_nat.join(reg_direct, reg_direct["rk"] == reg_from_nat["n_regionkey"])
        .agg(
            F.count("*").cast("long").alias("n_parents"),
            F.count(F.when(F.col("cents") != F.col("cents2"), 1))
            .cast("long")
            .alias("n_mismatched"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
        .select(F.lit("nation_to_region").alias("level"), "n_parents", "n_mismatched", "total_cents")
    )
    t1 = reg_from_nat.agg(F.sum("cents").cast("long").alias("ta"))
    t2 = cust_rev.agg(F.sum("cents").cast("long").alias("tb"))
    lvl2 = (
        t1.crossJoin(F.broadcast(t2))
        .select(
            F.lit("grand_total").alias("level"),
            F.lit(1).cast("long").alias("n_parents"),
            F.when(F.col("ta") != F.col("tb"), 1).otherwise(0).cast("long").alias("n_mismatched"),
            F.col("ta").alias("total_cents"),
        )
    )
    return (
        lvl1.unionByName(lvl2)
        .select("level", "n_parents", "n_mismatched", "total_cents",
                (F.col("n_mismatched") == 0).alias("additive"))
        .orderBy("level")
    )



@register(
    "frame_semantics_contract",
    f"""
WITH daily AS (
  SELECT epoch_us(ts) // 1000000 // 86400 AS d,
         cast(count(*) as bigint) AS y,
         cast(count(*) % 3 as bigint) AS tie_key
  FROM events GROUP BY d
), framed AS (
  SELECT d, y, tie_key,
         sum(y) OVER (ORDER BY tie_key, d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rows_sum,
         sum(y) OVER (ORDER BY tie_key
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS range_sum,
         count(*) OVER (ORDER BY tie_key, d
                        ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS rows_win,
         count(*) OVER (ORDER BY tie_key
                        RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS range_win
  FROM daily
)
SELECT cast(count(*) as bigint) AS n_rows,
       cast(count(CASE WHEN rows_sum != range_sum THEN 1 END) as bigint)
         AS n_cumsum_diverge,
       cast(count(CASE WHEN rows_win != range_win THEN 1 END) as bigint)
         AS n_band_diverge,
       cast(max(range_sum - rows_sum) as bigint) AS max_peer_lookahead,
       cast(max(range_win - rows_win) as bigint) AS max_band_extra
FROM framed
""",
)
def frame_semantics_contract(spark, sf_dir):
    """ROWS vs RANGE window-frame semantics contract — the silent
    running-total bug this registry dodges everywhere by ordering on
    unique keys, made measurable: over a deliberately TIED ordering
    key, `ROWS UNBOUNDED..CURRENT` stops at the physical row while
    `RANGE` includes ALL PEERS of the current value (the cumulative
    sum 'jumps ahead'), and a `1 PRECEDING..1 FOLLOWING` band means
    one row under ROWS but one VALUE-unit under RANGE. The contract
    counts divergent rows and the worst peer-lookahead — nonzero BY
    DESIGN here, identical in both engines, zero only when the
    ordering key is unique (which is exactly the review rule:
    cumulative frames demand a total order). The ROWS frames
    themselves order by (tie_key, d) — the pinned tie-break the rule
    demands — because a ROWS frame over the bare tied key is
    shuffle-order-NONDETERMINISTIC, which is the very bug under
    measurement (it cost this query a value-hash flake in the round-5
    sweep before the pin); the RANGE frames stay on the bare key,
    whose peer semantics make them deterministic. One agg + four
    windows on the bounded day table."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.expr("unix_timestamp(ts) div 86400").alias("d")).agg(
        F.count("*").cast("long").alias("y"),
        (F.count("*") % 3).cast("long").alias("tie_key"),
    )
    w_rows = Window.orderBy("tie_key", "d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_range = Window.orderBy("tie_key").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_rows_b = Window.orderBy("tie_key", "d").rowsBetween(-1, 1)
    w_range_b = Window.orderBy("tie_key").rangeBetween(-1, 1)
    framed = daily.select(
        "d",
        "y",
        F.sum("y").over(w_rows).alias("rows_sum"),
        F.sum("y").over(w_range).alias("range_sum"),
        F.count("*").over(w_rows_b).alias("rows_win"),
        F.count("*").over(w_range_b).alias("range_win"),
    )
    return framed.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.count(F.when(F.col("rows_sum") != F.col("range_sum"), 1))
        .cast("long")
        .alias("n_cumsum_diverge"),
        F.count(F.when(F.col("rows_win") != F.col("range_win"), 1))
        .cast("long")
        .alias("n_band_diverge"),
        F.max(F.col("range_sum") - F.col("rows_sum")).cast("long").alias("max_peer_lookahead"),
        F.max(F.col("range_win") - F.col("rows_win")).cast("long").alias("max_band_extra"),
    )



@register(
    "try_cast_audit_props",
    """
WITH raw AS (
  SELECT event_id,
         CASE event_id % 6
           WHEN 0 THEN cast(event_id % 1000 as varchar)
           WHEN 1 THEN ' ' || cast(event_id % 100 as varchar) || ' '
           WHEN 2 THEN 'abc'
           WHEN 3 THEN ''
           WHEN 4 THEN cast(event_id % 100 as varchar) || '.75'
           ELSE '1e' || cast(event_id % 4 as varchar)
         END AS s,
         CASE event_id % 3
           WHEN 0 THEN '2024-02-29'
           WHEN 1 THEN '2023-02-29'
           ELSE 'not-a-date'
         END AS ds
  FROM events
)
SELECT cast(count(*) as bigint) AS n_rows,
       cast(count(TRY_CAST(CASE WHEN event_id % 6 <= 3 THEN s END AS BIGINT))
            as bigint) AS n_int_ok,
       cast(count(TRY_CAST(s AS DOUBLE)) as bigint) AS n_double_ok,
       cast(count(TRY_CAST(ds AS DATE)) as bigint) AS n_date_ok,
       cast(count(CASE WHEN event_id % 6 > 3
                        AND TRY_CAST(s AS DOUBLE) IS NOT NULL THEN 1 END) as bigint)
         AS n_numeric_not_integer,
       cast(sum(coalesce(TRY_CAST(CASE WHEN event_id % 6 <= 3 THEN s END AS BIGINT),
                         0)) as bigint) AS sum_int_values
FROM raw
""",
)
def try_cast_audit_props(spark, sf_dir):
    """try_cast ingestion-safety contract — schema-on-read's load-
    bearing primitive, pinned on a deterministic mess of synthetic
    strings (clean ints, padded ints, garbage, empties, decimals,
    scientific notation, invalid calendar dates): how many survive
    each typed cast, how many are double-parseable but not
    int-parseable (the '123.75' column that silently halves your row
    count if you declare it INT), and the exact sum of the
    successfully-cast integers (NULL-skipping arithmetic on the
    survivors). Verified engine DIVERGENCES deliberately excluded
    from the contract, documented here: DuckDB TRY_CAST ROUNDS decimal
    strings to INT ('12.5' → 13) and accepts scientific notation as
    INT where Spark yields NULL, and Spark accepts 'YES' as boolean
    where DuckDB does not — so the INT metrics gate to the
    integer-shaped classes both engines agree on, and decimal/
    scientific classes count under the DOUBLE metric instead. One scan, one agg."""
    ev = load(spark, sf_dir, "events")
    raw = ev.select(
        "event_id",
        F.expr(
            """CASE event_id % 6
                 WHEN 0 THEN cast(event_id % 1000 as string)
                 WHEN 1 THEN ' ' || cast(event_id % 100 as string) || ' '
                 WHEN 2 THEN 'abc'
                 WHEN 3 THEN ''
                 WHEN 4 THEN cast(event_id % 100 as string) || '.75'
                 ELSE '1e' || cast(event_id % 4 as string)
               END"""
        ).alias("s"),
        F.expr(
            """CASE event_id % 3
                 WHEN 0 THEN '2024-02-29'
                 WHEN 1 THEN '2023-02-29'
                 ELSE 'not-a-date'
               END"""
        ).alias("ds"),
    )
    return raw.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.count(F.expr("try_cast(CASE WHEN event_id % 6 <= 3 THEN s END as bigint)"))
        .cast("long")
        .alias("n_int_ok"),
        F.count(F.expr("try_cast(s as double)")).cast("long").alias("n_double_ok"),
        F.count(F.expr("try_cast(ds as date)")).cast("long").alias("n_date_ok"),
        F.count(
            F.when(
                F.expr("event_id % 6 > 3 AND try_cast(s as double) IS NOT NULL"), 1
            )
        )
        .cast("long")
        .alias("n_numeric_not_integer"),
        F.sum(
            F.expr(
                "coalesce(try_cast(CASE WHEN event_id % 6 <= 3 THEN s END as bigint), 0L)"
            )
        )
        .cast("long")
        .alias("sum_int_values"),
    )



@register(
    "coordinate_precision_audit",
    f"""
WITH pts AS (
  SELECT c_custkey, {_LAT.format(k='c_custkey')} AS lat, {_LON.format(k='c_custkey')} AS lon
  FROM customer
), dec AS (
  SELECT cast(d as int) AS nd, cast(power(10.0, d) as double) AS scale
  FROM (VALUES {", ".join(f"({d})" for d in _CPA_DECIMALS)}) AS t(d)
), trunc AS (
  SELECT p.c_custkey, d.nd, p.lat, p.lon,
         round(p.lat * d.scale, 0) / d.scale AS tlat,
         round(p.lon * d.scale, 0) / d.scale AS tlon
  FROM pts p CROSS JOIN dec d
), err AS (
  SELECT nd,
         cast(round({HAVERSINE_SQL.format(lat1='lat', lon1='lon', lat2='tlat', lon2='tlon')}, 0) as bigint)
           AS disp_m,
         (cast(floor((90.0 - lat) / 2.5) as int) != cast(floor((90.0 - tlat) / 2.5) as int)
          OR cast(floor((lon + 180.0) / 2.5) as int)
             != cast(floor((tlon + 180.0) / 2.5) as int)) AS cell_flip
  FROM trunc
)
SELECT nd AS n_decimals,
       cast(count(*) as bigint) AS n_points,
       cast(sum(disp_m) // count(*) as bigint) AS mean_disp_m,
       cast(max(disp_m) as bigint) AS max_disp_m,
       cast(count(CASE WHEN cell_flip THEN 1 END) as bigint) AS n_cell_flips
FROM err GROUP BY nd ORDER BY n_decimals
""",
)
def coordinate_precision_audit(spark, sf_dir):
    """Coordinate-precision truncation audit — 'how many decimals do
    you actually need' with numbers instead of folklore: round stored
    lat/lon to 1/2/3 decimals and measure the haversine displacement
    (whole meters) plus how many points FLIP their 2.5° analysis cell
    — the two costs of precision-truncating a petabyte point table
    (1 decimal ≈ 11 km errors and real cell flips; 3 decimals ≈
    110 m, flips only at cell borders). The flip count is the one
    that silently corrupts joins: displacement is an error BAND, a
    flipped cell is a WRONG KEY. The storage counterpart of
    webmercator's pixel ticks and the decision input for
    embedding_int8_quantize-style compression of coordinates. One
    3-row literal dim fan-out, coarse-tick distances."""
    cust = load(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        C.derived_lat(F.col("c_custkey")).alias("lat"),
        C.derived_lon(F.col("c_custkey")).alias("lon"),
    )
    decs = spark.createDataFrame(
        [(d, float(10**d)) for d in _CPA_DECIMALS], "nd int, scale double"
    )
    trunc = pts.crossJoin(F.broadcast(decs)).select(
        "nd",
        "lat",
        "lon",
        (F.round(F.col("lat") * F.col("scale"), 0) / F.col("scale")).alias("tlat"),
        (F.round(F.col("lon") * F.col("scale"), 0) / F.col("scale")).alias("tlon"),
    )
    from gipspark.geo.haversine import haversine_col

    err = trunc.select(
        "nd",
        F.round(
            haversine_col(F.col("lat"), F.col("lon"), F.col("tlat"), F.col("tlon")), 0
        )
        .cast("long")
        .alias("disp_m"),
        (
            (
                F.floor((F.lit(90.0) - F.col("lat")) / F.lit(2.5)).cast("int")
                != F.floor((F.lit(90.0) - F.col("tlat")) / F.lit(2.5)).cast("int")
            )
            | (
                F.floor((F.col("lon") + F.lit(180.0)) / F.lit(2.5)).cast("int")
                != F.floor((F.col("tlon") + F.lit(180.0)) / F.lit(2.5)).cast("int")
            )
        ).alias("cell_flip"),
    )
    return (
        err.groupBy(F.col("nd").alias("n_decimals"))
        .agg(
            F.count("*").cast("long").alias("n_points"),
            F.expr("sum(disp_m) div count(*)").alias("mean_disp_m"),
            F.max("disp_m").cast("long").alias("max_disp_m"),
            F.count(F.when(F.col("cell_flip"), 1)).cast("long").alias("n_cell_flips"),
        )
        .orderBy("n_decimals")
    )



@register(
    "gorilla_timestamp_audit",
    """
WITH deltas AS (
  SELECT user_id, t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS d
  FROM (SELECT user_id, event_id, epoch_us(ts) // 1000000 AS t FROM events)
), dod AS (
  SELECT user_id, d - lag(d) OVER (PARTITION BY user_id ORDER BY d, user_id) AS x
  FROM deltas WHERE d IS NOT NULL
), bits AS (
  SELECT user_id,
         CASE WHEN x = 0 THEN 1
              WHEN x BETWEEN -63 AND 64 THEN 9
              WHEN x BETWEEN -255 AND 256 THEN 12
              WHEN x BETWEEN -2047 AND 2048 THEN 16
              ELSE 36 END AS b
  FROM dod WHERE x IS NOT NULL
)
SELECT cast(count(*) as bigint) AS n_samples,
       cast(count(CASE WHEN b = 1 THEN 1 END) as bigint) AS n_zero,
       cast(count(CASE WHEN b = 9 THEN 1 END) as bigint) AS n_7bit,
       cast(count(CASE WHEN b = 12 THEN 1 END) as bigint) AS n_9bit,
       cast(count(CASE WHEN b = 16 THEN 1 END) as bigint) AS n_12bit,
       cast(count(CASE WHEN b = 36 THEN 1 END) as bigint) AS n_32bit,
       cast(sum(b) as bigint) AS gorilla_bits,
       cast(count(*) * 64 as bigint) AS raw_bits,
       cast((sum(b) * 1000000) // (count(*) * 64) as bigint) AS ratio_q
FROM bits
""",
)
def gorilla_timestamp_audit(spark, sf_dir):
    """Gorilla delta-of-delta timestamp encoding audit (the Facebook
    Gorilla / Prometheus TSDB scheme): second differences of per-user
    event times priced under the paper's bucket ladder ('0' = 1 bit
    for perfectly regular ticks, then 7/9/12-bit windows, 32-bit
    escape) vs raw 64-bit stamps. Regular telemetry compresses ~50×;
    this human-bursty stream (see fano_burstiness_events) lands
    mostly in the escape bucket, and the histogram SHOWS why the
    TSDB assumption fails on behavioral data — the time-axis sibling
    of graph_gap_encoding_links' space audit. Pure integer range
    ladder, no libm; the ladder order is the same textual CASE both
    engines. Two lag windows sharing one user shuffle + one census."""
    ev = load(spark, sf_dir, "events")
    base = ev.select("user_id", "event_id", F.expr("unix_timestamp(ts)").alias("t"))
    w1 = Window.partitionBy("user_id").orderBy("t", "event_id")
    deltas = base.select(
        "user_id", (F.col("t") - F.lag("t").over(w1)).alias("d")
    ).filter(F.col("d").isNotNull())
    w2 = Window.partitionBy("user_id").orderBy("d", "user_id")
    dod = deltas.select(
        "user_id", (F.col("d") - F.lag("d").over(w2)).alias("x")
    ).filter(F.col("x").isNotNull())
    b = (
        F.when(F.col("x") == 0, 1)
        .when(F.col("x").between(-63, 64), 9)
        .when(F.col("x").between(-255, 256), 12)
        .when(F.col("x").between(-2047, 2048), 16)
        .otherwise(36)
    )
    bits = dod.select(b.alias("b"))
    return bits.agg(
        F.count("*").cast("long").alias("n_samples"),
        F.count(F.when(F.col("b") == 1, 1)).cast("long").alias("n_zero"),
        F.count(F.when(F.col("b") == 9, 1)).cast("long").alias("n_7bit"),
        F.count(F.when(F.col("b") == 12, 1)).cast("long").alias("n_9bit"),
        F.count(F.when(F.col("b") == 16, 1)).cast("long").alias("n_12bit"),
        F.count(F.when(F.col("b") == 36, 1)).cast("long").alias("n_32bit"),
        F.sum("b").cast("long").alias("gorilla_bits"),
        (F.count("*") * 64).cast("long").alias("raw_bits"),
        F.expr("(sum(b) * 1000000) div (count(*) * 64)").alias("ratio_q"),
    )



@register(
    "equalized_odds_audit",
    f"""
WITH scored AS (
  SELECT lang,
         (n_chars % 97) < 60 AS relevant,
         {T.quality_score_sql('text')} >= 0.2 AS kept
  FROM documents
), rates AS (
  SELECT lang,
         cast(count(CASE WHEN relevant AND kept THEN 1 END) as bigint) AS tp,
         cast(count(CASE WHEN relevant THEN 1 END) as bigint) AS pos,
         cast(count(CASE WHEN NOT relevant AND kept THEN 1 END) as bigint) AS fp,
         cast(count(CASE WHEN NOT relevant THEN 1 END) as bigint) AS neg
  FROM scored GROUP BY lang
), q AS (
  SELECT lang, tp, pos, fp, neg,
         (tp * 1000000) // greatest(pos, 1) AS tpr_q,
         (fp * 1000000) // greatest(neg, 1) AS fpr_q
  FROM rates
), ext AS (
  SELECT max(tpr_q) AS max_tpr, min(tpr_q) AS min_tpr,
         max(fpr_q) AS max_fpr, min(fpr_q) AS min_fpr
  FROM q
)
SELECT q.lang, q.tpr_q, q.fpr_q,
       cast(e.max_tpr - e.min_tpr as bigint) AS tpr_gap_q,
       cast(e.max_fpr - e.min_fpr as bigint) AS fpr_gap_q,
       (e.max_tpr - e.min_tpr <= 100000 AND e.max_fpr - e.min_fpr <= 100000)
         AS within_tolerance
FROM q CROSS JOIN ext e ORDER BY lang
""",
)
def equalized_odds_audit(spark, sf_dir):
    """Equalized-odds fairness audit of the quality filter across
    language groups: TPR (relevant docs kept) and FPR (irrelevant
    docs kept) per lang, plus the max pairwise gaps — the
    OUTCOME-CONDITIONED fairness criterion that demographic parity
    (filter_parity_audit's four-fifths rule) cannot see: a filter can
    keep equal SHARES per language while systematically missing the
    relevant docs of one language and admitting the junk of another.
    The relevance label is a deterministic length-hash surrogate (the
    audit's MECHANICS are the deliverable; swap in human labels at
    will). Exact integer rates in micro, gaps against a 0.1 tolerance.
    One scan + two tiny aggs."""
    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "lang",
        ((F.col("n_chars") % 97) < 60).alias("relevant"),
        (T.quality_score(F.col("text")) >= 0.2).alias("kept"),
    )
    rates = scored.groupBy("lang").agg(
        F.count(F.when(F.col("relevant") & F.col("kept"), 1)).cast("long").alias("tp"),
        F.count(F.when(F.col("relevant"), 1)).cast("long").alias("pos"),
        F.count(F.when(~F.col("relevant") & F.col("kept"), 1)).cast("long").alias("fp"),
        F.count(F.when(~F.col("relevant"), 1)).cast("long").alias("neg"),
    )
    q = rates.select(
        "lang",
        F.expr("(tp * 1000000) div greatest(pos, 1)").alias("tpr_q"),
        F.expr("(fp * 1000000) div greatest(neg, 1)").alias("fpr_q"),
    )
    ext = q.agg(
        F.max("tpr_q").alias("max_tpr"),
        F.min("tpr_q").alias("min_tpr"),
        F.max("fpr_q").alias("max_fpr"),
        F.min("fpr_q").alias("min_fpr"),
    )
    return (
        q.crossJoin(F.broadcast(ext))
        .select(
            "lang",
            "tpr_q",
            "fpr_q",
            (F.col("max_tpr") - F.col("min_tpr")).cast("long").alias("tpr_gap_q"),
            (F.col("max_fpr") - F.col("min_fpr")).cast("long").alias("fpr_gap_q"),
            (
                (F.col("max_tpr") - F.col("min_tpr") <= 100000)
                & (F.col("max_fpr") - F.col("min_fpr") <= 100000)
            ).alias("within_tolerance"),
        )
        .orderBy("lang")
    )




# ---------------------------------------------------------------------------
# round-4 batch (session 3t): ordering contract, birthday calibration,
# roaring containers, median-of-medians
# ---------------------------------------------------------------------------


@register(
    "ordering_semantics_contract",
    """
WITH probe AS (
  SELECT CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END AS s,
         CASE WHEN event_id % 5 = 0 THEN NULL
              ELSE cast(event_id % 100 as bigint) END AS x
  FROM events
), rk AS (
  SELECT s, x,
         row_number() OVER (ORDER BY x ASC NULLS FIRST, s ASC NULLS FIRST) AS r_nf,
         row_number() OVER (ORDER BY x ASC NULLS LAST, s ASC NULLS LAST) AS r_nl,
         row_number() OVER (ORDER BY s DESC NULLS LAST, x DESC NULLS LAST) AS r_dnl
  FROM probe
)
SELECT cast(count(*) as bigint) AS n_rows,
       cast(min(CASE WHEN x IS NULL THEN r_nf END) as bigint) AS first_null_rank_nf,
       cast(max(CASE WHEN x IS NULL THEN r_nl END) as bigint) AS last_null_rank_nl,
       cast(count(CASE WHEN x IS NULL AND r_nf <= (SELECT count(*)
                       FROM probe WHERE x IS NULL) THEN 1 END) as bigint)
         AS nulls_lead_under_nf,
       (min(CASE WHEN s = 'purchase' THEN r_dnl END)
          < min(CASE WHEN s = 'click' THEN r_dnl END)) AS desc_orders_reverse,
       cast(count(CASE WHEN s IS NULL AND r_dnl > (SELECT count(*)
                       FROM probe WHERE s IS NOT NULL) THEN 1 END) as bigint)
         AS nulls_trail_under_dnl
FROM rk
""",
)
def ordering_semantics_contract(spark, sf_dir):
    """ORDER BY semantics contract — pinning what this registry's
    hundreds of windows rely on: with EXPLICIT NULLS FIRST/LAST both
    engines place every NULL in a contiguous leading/trailing block
    (counted exactly), and DESC reverses the binary string order
    ('purchase' before 'click'). Pinned by verified necessity: the
    DEFAULT null position genuinely DIVERGES (Spark = NULLS FIRST on
    ASC, DuckDB = NULLS LAST — the same query silently reorders when
    ported), which is why every ORDER BY over a nullable key in this
    file would spell the position out; and binary (code-point) string
    comparison agrees ('A' < 'Z' < 'a'), so no collation clause is
    ever needed. Three windows + one census agg."""
    ev = load(spark, sf_dir, "events")
    probe = ev.select(
        F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("event_type"))
        .alias("s"),
        F.when(F.col("event_id") % 5 == 0, F.lit(None).cast("long"))
        .otherwise((F.col("event_id") % 100).cast("long"))
        .alias("x"),
    )
    w_nf = Window.orderBy(F.col("x").asc_nulls_first(), F.col("s").asc_nulls_first())
    w_nl = Window.orderBy(F.col("x").asc_nulls_last(), F.col("s").asc_nulls_last())
    w_dnl = Window.orderBy(F.col("s").desc_nulls_last(), F.col("x").desc_nulls_last())
    rk = probe.select(
        "s",
        "x",
        F.row_number().over(w_nf).alias("r_nf"),
        F.row_number().over(w_nl).alias("r_nl"),
        F.row_number().over(w_dnl).alias("r_dnl"),
    )
    n_null_x = probe.filter(F.col("x").isNull()).count()
    n_s_notnull = probe.filter(F.col("s").isNotNull()).count()
    return rk.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min(F.when(F.col("x").isNull(), F.col("r_nf"))).cast("long").alias(
            "first_null_rank_nf"
        ),
        F.max(F.when(F.col("x").isNull(), F.col("r_nl"))).cast("long").alias(
            "last_null_rank_nl"
        ),
        F.count(F.when(F.col("x").isNull() & (F.col("r_nf") <= n_null_x), 1))
        .cast("long")
        .alias("nulls_lead_under_nf"),
        (
            F.min(F.when(F.col("s") == "purchase", F.col("r_dnl")))
            < F.min(F.when(F.col("s") == "click", F.col("r_dnl")))
        ).alias("desc_orders_reverse"),
        F.count(F.when(F.col("s").isNull() & (F.col("r_dnl") > n_s_notnull), 1))
        .cast("long")
        .alias("nulls_trail_under_dnl"),
    )



@register(
    "birthday_collision_contract",
    f"""
WITH ks AS (
  SELECT cast(k as bigint) AS k
  FROM (VALUES {", ".join(f"({k})" for k in _BDAY_BUCKETS)}) AS t(k)
), hashed AS (
  SELECT k.k,
         {D.MD5_LONG_SQL.format(x="concat('bd:', cast(o_orderkey as varchar))")} % k.k
           AS b
  FROM orders o CROSS JOIN ks k
), occ AS (
  SELECT k, b, cast(count(*) as bigint) AS c FROM hashed GROUP BY k, b
), tot AS (SELECT cast(count(*) as bigint) AS n FROM orders)
SELECT o.k AS n_buckets,
       cast(max(t.n) as bigint) AS n_keys,
       cast(sum(o.c * (o.c - 1)) // 2 as bigint) AS observed_pairs,
       cast((max(t.n) * (max(t.n) - 1)) // (2 * o.k) as bigint) AS expected_pairs,
       cast(abs(sum(o.c * (o.c - 1)) // 2
                - (max(t.n) * (max(t.n) - 1)) // (2 * o.k)) * 1000000
            // greatest((max(t.n) * (max(t.n) - 1)) // (2 * o.k), 1) as bigint)
         AS rel_dev_q,
       (abs(sum(o.c * (o.c - 1)) // 2
            - (max(t.n) * (max(t.n) - 1)) // (2 * o.k)) * 10
          <= (max(t.n) * (max(t.n) - 1)) // (2 * o.k)) AS within_10pct
FROM occ o CROSS JOIN tot t GROUP BY o.k ORDER BY n_buckets
""",
)
def birthday_collision_contract(spark, sf_dir):
    """Birthday-collision calibration of the repo's md5 bucketing —
    the META-contract under every md5-derived op in this registry
    (LSH bands, fold seeds, samplers, shard assigners, bootstrap
    weights): hashing order keys into k buckets must produce same-
    bucket pair counts Σc(c−1)/2 within 10% of the uniform-hash
    expectation n(n−1)/2k, for k ∈ {_BDAY_BUCKETS}. A biased hash
    would silently skew every banded join's candidate volume and
    every deterministic sample's coverage — this is the cheap canary
    that says the 60-bit md5 slice behaves uniformly on THIS key
    population. Exact integer pair counting; one fan-out agg per k."""
    o = load(spark, sf_dir, "orders")
    ks = spark.createDataFrame([(k,) for k in _BDAY_BUCKETS], "k long")
    hashed = o.crossJoin(F.broadcast(ks)).select(
        "k",
        (
            D.md5_long(F.concat(F.lit("bd:"), F.col("o_orderkey").cast("string"))) % F.col("k")
        ).alias("b"),
    )
    occ = hashed.groupBy("k", "b").agg(F.count("*").cast("long").alias("c"))
    tot = o.agg(F.count("*").cast("long").alias("n"))
    return (
        occ.crossJoin(F.broadcast(tot))
        .groupBy(F.col("k").alias("n_buckets"))
        .agg(
            F.max("n").cast("long").alias("n_keys"),
            F.expr("cast(sum(c * (c - 1)) div 2 as bigint)").alias("observed_pairs"),
            F.expr("cast((max(n) * (max(n) - 1)) div (2 * k) as bigint)").alias(
                "expected_pairs"
            ),
            F.expr(
                "cast(abs(sum(c * (c - 1)) div 2 - (max(n) * (max(n) - 1)) div (2 * k))"
                " * 1000000 div greatest((max(n) * (max(n) - 1)) div (2 * k), 1) as bigint)"
            ).alias("rel_dev_q"),
            F.expr(
                "abs(sum(c * (c - 1)) div 2 - (max(n) * (max(n) - 1)) div (2 * k)) * 10"
                " <= (max(n) * (max(n) - 1)) div (2 * k)"
            ).alias("within_10pct"),
        )
        .orderBy("n_buckets")
    )



@register(
    "roaring_container_audit",
    """
WITH keys AS (
  SELECT DISTINCT cast(CASE o_orderkey % 3
           WHEN 0 THEN o_orderkey // 3
           WHEN 1 THEN o_orderkey * 50
           ELSE 40000000 + o_orderkey % 1024 END as bigint) AS v
  FROM orders
), chunks AS (
  SELECT v // 4096 AS chunk, v % 4096 AS lo FROM keys
), per_chunk AS (
  SELECT chunk,
         cast(count(DISTINCT lo) as bigint) AS card,
         cast(count(DISTINCT lo // 64) as bigint) AS words_touched
  FROM chunks GROUP BY chunk
), classed AS (
  SELECT chunk, card,
         CASE WHEN card <= 256 THEN 'array'
              WHEN card >= 3840 THEN 'run_or_full' ELSE 'bitmap' END AS container,
         CASE WHEN card <= 256 THEN 2 * card ELSE 512 END AS bytes_est
  FROM per_chunk
)
SELECT container,
       cast(count(*) as bigint) AS n_chunks,
       cast(sum(card) as bigint) AS n_values,
       cast(sum(bytes_est) as bigint) AS bytes_est,
       cast(sum(card * 8) as bigint) AS raw_bytes
FROM classed GROUP BY container ORDER BY container
""",
)
def roaring_container_audit(spark, sf_dir):
    """Roaring-bitmap container-choice audit — the per-64Ki-chunk
    decision rule inside every modern bitmap index (Lucene, Druid,
    ClickHouse): chunks with ≤256 set bits store a sorted ARRAY
    (2 bytes/value), dense chunks a fixed 512-byte BITMAP, and
    near-full chunks run-encode — applied to a synthetic key set
    mixing dense, sparse, and packed chunk populations, with the resulting container census and byte estimate vs raw
    8-byte keys (tile_presence_bitmap builds such bitmaps; this op
    prices their physical layout, the gap_encoding/Gorilla sibling
    for the SET-membership axis). The 256 threshold IS Roaring's
    published crossover (512 bytes / 2). Exact integer census, one
    chunk agg."""
    o = load(spark, sf_dir, "orders")
    keys = o.select(
        F.expr(
            """cast(CASE o_orderkey % 3
                 WHEN 0 THEN o_orderkey div 3
                 WHEN 1 THEN o_orderkey * 50
                 ELSE 40000000 + o_orderkey % 1024 END as bigint)"""
        ).alias("v")
    ).distinct()
    chunks = keys.select(
        F.expr("v div 4096").alias("chunk"), (F.col("v") % 4096).alias("lo")
    )
    per_chunk = chunks.groupBy("chunk").agg(
        F.countDistinct("lo").cast("long").alias("card"),
        F.countDistinct(F.expr("lo div 64")).cast("long").alias("words_touched"),
    )
    classed = per_chunk.select(
        "chunk",
        "card",
        F.when(F.col("card") <= 256, "array")
        .when(F.col("card") >= 3840, "run_or_full")
        .otherwise("bitmap")
        .alias("container"),
        F.when(F.col("card") <= 256, 2 * F.col("card")).otherwise(512).alias("bytes_est"),
    )
    return (
        classed.groupBy("container")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum("card").cast("long").alias("n_values"),
            F.sum("bytes_est").cast("long").alias("bytes_est"),
            F.sum(F.col("card") * 8).cast("long").alias("raw_bytes"),
        )
        .orderBy("container")
    )



@register(
    "median_of_medians_contract",
    f"""
WITH vals AS (
  SELECT cast(round(cast(o_totalprice as {DEC}) * 100) as bigint) AS v,
         {D.MD5_LONG_SQL.format(x="concat('mom:', cast(o_orderkey as varchar))")}
           % {_MOM_PARTS} AS part
  FROM orders
), pm AS (
  SELECT part, v AS med FROM (
    SELECT part, v,
           row_number() OVER (PARTITION BY part ORDER BY v, part) AS r,
           count(*) OVER (PARTITION BY part) AS n
    FROM vals
  ) WHERE r = (n + 1) // 2
), mom AS (
  SELECT med AS m FROM (
    SELECT med, row_number() OVER (ORDER BY med) AS r,
           count(*) OVER () AS n
    FROM pm
  ) WHERE r = (n + 1) // 2
), ranked AS (
  SELECT cast(count(CASE WHEN v.v < mm.m THEN 1 END) as bigint) AS n_below,
         cast(count(*) as bigint) AS n_total,
         cast(max(mm.m) as bigint) AS mom_value
  FROM vals v CROSS JOIN mom mm
), true_med AS (
  SELECT v AS tm FROM (
    SELECT v, row_number() OVER (ORDER BY v) AS r, count(*) OVER () AS n
    FROM vals
  ) WHERE r = (n + 1) // 2
)
SELECT r.mom_value, t.tm AS true_median,
       cast((r.n_below * 1000000) // r.n_total as bigint) AS mom_rank_q,
       (r.n_below * 10 >= r.n_total * 2
        AND r.n_below * 10 <= r.n_total * 8) AS within_guarantee
FROM ranked r CROSS JOIN true_med t
""",
)
def median_of_medians_contract(spark, sf_dir):
    """Median-of-medians contract — the distributed-median shortcut
    quantified: hash rows into {_MOM_PARTS} 'partitions', take each
    partition's exact median, take the median of those, and measure
    where that value actually ranks in the full distribution. Theory
    guarantees the MoM lands strictly inside the (roughly) 25th–75th
    percentile band — asserted here with a slack [20%, 80%] gate —
    which is exactly why MoM is a fine PIVOT (quickselect) but NOT a
    median estimate, the design note behind this registry computing
    exact medians via rank windows (weighted_median, speed_field)
    instead of averaging partition medians. Deterministic md5
    partitioning, exact integer ranks, one 1-row combine."""
    o = load(spark, sf_dir, "orders")
    vals = o.select(
        F.round(F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("v"),
        (
            D.md5_long(F.concat(F.lit("mom:"), F.col("o_orderkey").cast("string")))
            % _MOM_PARTS
        ).alias("part"),
    )
    wp = Window.partitionBy("part").orderBy("v", "part")
    wpn = Window.partitionBy("part")
    pm = (
        vals.select(
            "part",
            "v",
            F.row_number().over(wp).alias("r"),
            F.count("*").over(wpn).alias("n"),
        )
        .filter(F.col("r") == F.expr("(n + 1) div 2"))
        .select("part", F.col("v").alias("med"))
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    mom = (
        pm.select(
            "med",
            F.row_number().over(Window.orderBy("med")).alias("r"),
            F.count("*").over(w_all).alias("n"),
        )
        .filter(F.col("r") == F.expr("(n + 1) div 2"))
        .select(F.col("med").alias("m"))
    )
    ranked = vals.crossJoin(F.broadcast(mom)).agg(
        F.count(F.when(F.col("v") < F.col("m"), 1)).cast("long").alias("n_below"),
        F.count("*").cast("long").alias("n_total"),
        F.max("m").cast("long").alias("mom_value"),
    )
    true_med = (
        vals.select(
            "v",
            F.row_number().over(Window.orderBy("v")).alias("r"),
            F.count("*").over(w_all).alias("n"),
        )
        .filter(F.col("r") == F.expr("(n + 1) div 2"))
        .select(F.col("v").alias("true_median"))
    )
    return ranked.crossJoin(F.broadcast(true_med)).select(
        "mom_value",
        "true_median",
        F.expr("(n_below * 1000000) div n_total").alias("mom_rank_q"),
        F.expr(
            "n_below * 10 >= n_total * 2 AND n_below * 10 <= n_total * 8"
        ).alias("within_guarantee"),
    )



# ---------------------------------------------------------------------------
# round-4 batch (session 3u): join-order costs, radix quantiles, tries,
# bipartite parity
# ---------------------------------------------------------------------------


@register(
    "join_order_cost_audit",
    """
WITH oc AS (
  SELECT cast(count(*) as bigint) AS rows_oc
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_acctbal > 5000
), cn AS (
  SELECT cast(count(*) as bigint) AS rows_cn
  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
  WHERE c.c_acctbal > 5000 AND n.n_regionkey = 0
), onj AS (
  SELECT cast(count(*) as bigint) AS rows_on
  FROM orders o, nation n WHERE n.n_regionkey = 0
), fin AS (
  SELECT cast(count(*) as bigint) AS rows_final
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  WHERE c.c_acctbal > 5000 AND n.n_regionkey = 0
)
SELECT ord.ord AS join_order, ord.intermediate_rows, f.rows_final
FROM (
  SELECT '1_oc_then_n' AS ord, (SELECT rows_oc FROM oc) AS intermediate_rows
  UNION ALL
  SELECT '2_cn_then_o', (SELECT rows_cn FROM cn)
  UNION ALL
  SELECT '3_on_then_c', (SELECT rows_on FROM onj)
) ord CROSS JOIN fin f
ORDER BY join_order
""",
)
def join_order_cost_audit(spark, sf_dir):
    """Join-order cost audit — Selinger's lesson with TRUE numbers:
    for orders ⋈ customer ⋈ nation (balance and region filters), the
    exact intermediate cardinality each of the three join orders
    materializes before the final result. Starting with the
    filtered dimension pair (customer⋈nation) carries hundreds of
    rows into the big fact join; starting with orders⋈customer
    carries tens of thousands; joining the non-adjacent pair
    (orders × nation) degenerates to a cross product — the measured
    spread IS why optimizers reorder joins and why join_card_estimate
    exists (estimation) while this op provides the ground truth the
    estimator is judged against. Exact counts, bounded dims."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    n = load(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    rows_oc = o.join(c, c["c_custkey"] == o["o_custkey"]).count()
    rows_cn = c.join(n, n["n_nationkey"] == c["c_nationkey"]).count()
    rows_on = o.count() * n.count()
    rows_final = (
        o.join(c, c["c_custkey"] == o["o_custkey"])
        .join(n, n["n_nationkey"] == c["c_nationkey"])
        .count()
    )
    return spark.createDataFrame(
        [
            ("1_oc_then_n", rows_oc, rows_final),
            ("2_cn_then_o", rows_cn, rows_final),
            ("3_on_then_c", rows_on, rows_final),
        ],
        "join_order string, intermediate_rows long, rows_final long",
    ).orderBy("join_order")



@register(
    "regex_dialect_contract",
    """
WITH d AS (
  SELECT text, lang FROM documents
)
SELECT cast(count(*) as bigint) AS n_docs,
       cast(count(CASE WHEN regexp_extract(text, '[0-9]+', 0) != ''
                  THEN 1 END) as bigint) AS n_has_digits,
       cast(sum(len(regexp_extract_all(text, '[a-z]{4,}'))) as bigint)
         AS n_long_words,
       cast(count(CASE WHEN regexp_matches(text, '(?i)THE') THEN 1 END) as bigint)
         AS n_ci_the,
       cast(count(CASE WHEN regexp_matches(text, '^[a-z]') THEN 1 END) as bigint)
         AS n_starts_lower,
       cast(sum(length(regexp_replace(text, '[aeiou]', '', 'g'))) as bigint)
         AS n_chars_no_vowels
FROM d
""",
)
def regex_dialect_contract(spark, sf_dir):
    """Regex dialect contract (Java regex vs DuckDB's RE2) — the
    meta-contract under every tokenizer, PII scrubber, and URL parser
    in this registry: character classes, bounded quantifiers, global
    match counting, the inline (?i) flag, and ^ anchoring agree
    exactly on the corpus (each pinned by an exact count). The ONE
    spelling divergence is encoded in the op itself rather than
    documented away: global regexp_replace is DEFAULT in Spark but
    needs the explicit 'g' flag in DuckDB — so the two sides of this
    oracle pair are deliberately different TEXT for identical
    SEMANTICS, the only such sanctioned divergence in the file
    (everywhere else text identity is the discipline; here the
    dialects make that impossible and the contract proves the
    translation). One scan + one agg."""
    docs = load(spark, sf_dir, "documents")
    return docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count(F.when(F.expr("regexp_extract(text, '[0-9]+', 0) != ''"), 1))
        .cast("long")
        .alias("n_has_digits"),
        F.sum(F.expr("size(regexp_extract_all(text, '[a-z]{4,}', 0))"))
        .cast("long")
        .alias("n_long_words"),
        F.count(F.when(F.expr("text rlike '(?i)THE'"), 1)).cast("long").alias("n_ci_the"),
        F.count(F.when(F.expr("text rlike '^[a-z]'"), 1))
        .cast("long")
        .alias("n_starts_lower"),
        F.sum(F.length(F.expr("regexp_replace(text, '[aeiou]', '')")))
        .cast("long")
        .alias("n_chars_no_vowels"),
    )



@register(
    "step_turn_joint_census",
    f"""
WITH fixes AS (
  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS t,
         {_LAT.format(k='event_id')} AS lat, {_LON.format(k='event_id')} AS lon
  FROM events
), legs AS (
  SELECT user_id, t, lat, lon, plat, plon,
         cast(round({HAVERSINE_SQL.format(lat1='plat', lon1='plon', lat2='lat', lon2='lon')}, 0) as bigint) AS step_m,
         cast(round(atan2(lon - plon, lat - plat) * 1000000.0, 0) as bigint) AS h_urad
  FROM (
    SELECT user_id, t, lat, lon,
           lag(lat) OVER (PARTITION BY user_id ORDER BY t, event_id) AS plat,
           lag(lon) OVER (PARTITION BY user_id ORDER BY t, event_id) AS plon
    FROM fixes
  ) WHERE plat IS NOT NULL
), turns AS (
  SELECT step_m,
         h_urad - lag(h_urad) OVER (PARTITION BY user_id ORDER BY t, step_m, h_urad)
           AS dh
  FROM legs
), binned AS (
  SELECT {_blen_sql('greatest(step_m, 1)', 26)} AS step_bucket,
         cast((((dh + 3141593) % 6283185 + 6283185) % 6283185)
              * {_STJ_TURN_BUCKETS} // 6283185 as int) AS turn_bucket
  FROM turns WHERE dh IS NOT NULL
)
SELECT step_bucket, turn_bucket, cast(count(*) as bigint) AS n
FROM binned GROUP BY step_bucket, turn_bucket
ORDER BY step_bucket, turn_bucket
""",
)
def step_turn_joint_census(spark, sf_dir):
    """Joint step-length × turning-angle census — movement ecology's
    fingerprint (the correlated-random-walk signature): each leg's
    doubling-bucket step length (jump_size_spectrum's axis) CROSSED
    with the 45°-bucketed turn since the previous heading (turn_stats'
    axis). The JOINT shape is what the marginals can't show: real
    movement concentrates mass at (short step, small turn) — the
    directional-persistence ridge — while shuffled or bot traces are
    uniform across turn buckets at every step scale. Headings quantize
    to integer MICRO-RADIANS immediately after the one atan2 call (a
    last-ulp libm disagreement flips a micro-radian tick with
    probability ~10⁻¹⁰ instead of flipping a 45° bucket — the module's
    coarse-tick rule applied at the earliest possible point), so the
    wrap and binning are pure integer modular arithmetic. Two lag windows on one user shuffle + one 2-D census."""
    ev = load(spark, sf_dir, "events")
    fixes = ev.select(
        "user_id",
        "event_id",
        F.expr("unix_timestamp(ts)").alias("t"),
        C.derived_lat(F.col("event_id")).alias("lat"),
        C.derived_lon(F.col("event_id")).alias("lon"),
    )
    from gipspark.geo.haversine import haversine_col

    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    legs = (
        fixes.select(
            "user_id",
            "t",
            "lat",
            "lon",
            F.lag("lat").over(w).alias("plat"),
            F.lag("lon").over(w).alias("plon"),
        )
        .filter(F.col("plat").isNotNull())
        .select(
            "user_id",
            "t",
            F.round(
                haversine_col(F.col("plat"), F.col("plon"), F.col("lat"), F.col("lon")), 0
            )
            .cast("long")
            .alias("step_m"),
            F.round(
                F.atan2(F.col("lon") - F.col("plon"), F.col("lat") - F.col("plat"))
                * F.lit(1000000.0),
                0,
            )
            .cast("long")
            .alias("h_urad"),
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("t", "step_m", "h_urad")
    turns = legs.select(
        "step_m", (F.col("h_urad") - F.lag("h_urad").over(w2)).alias("dh")
    ).filter(F.col("dh").isNotNull())
    turn_bucket = F.expr(
        f"cast((((dh + 3141593) % 6283185 + 6283185) % 6283185)"
        f" * {_STJ_TURN_BUCKETS} div 6283185 as int)"
    )
    binned = turns.select(
        _blen_col(F.greatest(F.col("step_m"), F.lit(1)), 26).alias("step_bucket"),
        turn_bucket.alias("turn_bucket"),
    )
    return (
        binned.groupBy("step_bucket", "turn_bucket")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("step_bucket", "turn_bucket")
    )



@register(
    "rowgroup_size_advisor",
    f"""
WITH widths AS (
  SELECT cast(count(*) as bigint) AS n_rows,
         cast(8 + 8 + 1 + 8 + 8 as bigint) AS fixed_bytes,
         cast(sum(length(o_orderstatus) + length(o_orderpriority)) as bigint)
           AS var_bytes
  FROM orders
)
SELECT n_rows,
       cast(fixed_bytes + (var_bytes + n_rows - 1) // n_rows as bigint)
         AS est_row_bytes,
       cast({_RG_TARGET_BYTES} //
            (fixed_bytes + (var_bytes + n_rows - 1) // n_rows) as bigint)
         AS rows_per_group,
       cast((n_rows * (fixed_bytes + (var_bytes + n_rows - 1) // n_rows)
             + {_RG_TARGET_BYTES} - 1) // {_RG_TARGET_BYTES} as bigint)
         AS n_groups_est
FROM widths
""",
)
def rowgroup_size_advisor(spark, sf_dir):
    """Parquet row-group sizing advisor: estimate the uncompressed row
    width of the orders table (fixed-width columns by type + measured
    average string bytes, ceil'd), derive how many rows fit a 128 MB
    row group and how many groups the table needs — the writer knob
    that decides scan parallelism and zone-map granularity
    (zone_map_skipping_audit measures the CONSEQUENCE of group
    boundaries; this op sets them; spark.sql.files.maxPartitionBytes
    is the read-side mirror). Real writers apply a compression factor
    on top — the advisor's output is the conservative upper bound.
    One scan, one agg, exact integer ceilings."""
    o = load(spark, sf_dir, "orders")
    w = o.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.lit(8 + 8 + 1 + 8 + 8).cast("long").alias("fixed_bytes"),
        F.sum(F.length("o_orderstatus") + F.length("o_orderpriority"))
        .cast("long")
        .alias("var_bytes"),
    )
    return w.select(
        "n_rows",
        F.expr("fixed_bytes + (var_bytes + n_rows - 1) div n_rows").alias("est_row_bytes"),
        F.expr(
            f"{_RG_TARGET_BYTES} div (fixed_bytes + (var_bytes + n_rows - 1) div n_rows)"
        ).alias("rows_per_group"),
        F.expr(
            f"(n_rows * (fixed_bytes + (var_bytes + n_rows - 1) div n_rows)"
            f" + {_RG_TARGET_BYTES} - 1) div {_RG_TARGET_BYTES}"
        ).alias("n_groups_est"),
    )



@register(
    "semi_join_semantics_contract",
    """
WITH hot AS (
  SELECT DISTINCT l_partkey FROM lineitem WHERE l_quantity >= 45
)
SELECT cast((SELECT count(*) FROM part p
             WHERE p.p_partkey IN (SELECT l_partkey FROM lineitem
                                   WHERE l_quantity >= 45)) as bigint) AS n_in,
       cast((SELECT count(*) FROM part p
             WHERE EXISTS (SELECT 1 FROM lineitem l
                           WHERE l.l_partkey = p.p_partkey
                             AND l.l_quantity >= 45)) as bigint) AS n_exists,
       cast((SELECT count(*) FROM part p JOIN hot h
             ON h.l_partkey = p.p_partkey) as bigint) AS n_join_distinct,
       cast((SELECT count(*) FROM part p JOIN lineitem l
             ON l.l_partkey = p.p_partkey AND l.l_quantity >= 45) as bigint)
         AS n_join_raw,
       cast((SELECT count(*) FROM part p JOIN lineitem l
             ON l.l_partkey = p.p_partkey AND l.l_quantity >= 45) as bigint)
         - cast((SELECT count(*) FROM part p
                 WHERE EXISTS (SELECT 1 FROM lineitem l
                               WHERE l.l_partkey = p.p_partkey
                                 AND l.l_quantity >= 45)) as bigint)
         AS fanout_inflation
""",
)
def semi_join_semantics_contract(spark, sf_dir):
    """Semi-join vs inner-join fan-out contract — the row-count bug
    that ships to production weekly: 'which parts had a high-quantity
    sale' via IN, EXISTS, and JOIN-on-distinct all agree (one row per
    qualifying part — pinned equal), while the naive INNER JOIN
    against the raw fact table multiplies each part by its MATCH
    COUNT — fanout_inflation is exactly the phantom rows a SUM over
    that join would double-count (the reason bloom_semi_join_orders
    and semi_anti_join exist as operators, here stated as a measured
    identity). Three formulations, one measured divergence, exact
    counts."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    p = load(spark, sf_dir, "part")
    hot = li.select("l_partkey").distinct()
    n_in = p.join(hot, hot["l_partkey"] == p["p_partkey"], "left_semi").count()
    n_exists = n_in  # Catalyst plans IN and EXISTS to the same semi join
    n_join_distinct = p.join(hot, hot["l_partkey"] == p["p_partkey"]).count()
    n_join_raw = p.join(li, li["l_partkey"] == p["p_partkey"]).count()
    return spark.createDataFrame(
        [
            (
                n_in,
                n_exists,
                n_join_distinct,
                n_join_raw,
                n_join_raw - n_exists,
            )
        ],
        "n_in long, n_exists long, n_join_distinct long, n_join_raw long,"
        " fanout_inflation long",
    )



# ---------------------------------------------------------------------------
# round-4 batch (session 3aa): type widening, quantile methods, null keys,
# shuffle sizing
# ---------------------------------------------------------------------------


@register(
    "type_widening_contract",
    """
WITH keys AS (
  SELECT cast(o_orderkey as bigint) * 1200000 + 9007199254740993 AS big_k,
         cast(o_orderkey as bigint) AS small_k
  FROM orders
), rt AS (
  SELECT big_k, small_k,
         cast(cast(big_k as double) as bigint) AS big_rt,
         cast(cast(small_k as double) as bigint) AS small_rt
  FROM keys
)
SELECT cast(count(*) as bigint) AS n_rows,
       cast(count(CASE WHEN small_rt != small_k THEN 1 END) as bigint)
         AS n_small_corrupted,
       cast(count(CASE WHEN big_rt != big_k THEN 1 END) as bigint)
         AS n_big_corrupted,
       cast(max(abs(big_rt - big_k)) as bigint) AS max_key_drift,
       cast(count(DISTINCT big_k) - count(DISTINCT big_rt) as bigint)
         AS n_keys_merged
FROM rt
""",
)
def type_widening_contract(spark, sf_dir):
    """BIGINT→DOUBLE widening-loss contract — the silent join-key
    corruption above 2⁵³: keys shifted past 9,007,199,254,740,993
    round-trip through DOUBLE with measurable drift (max_key_drift)
    and DISTINCT keys MERGE (n_keys_merged — two ids becoming one is
    a wrong-answer join, not a precision footnote), while keys below
    2⁵³ survive exactly (n_small_corrupted = 0, also pinned). Both
    engines widen a bigint∪double UNION to DOUBLE identically
    (verified probe), so the registry's discipline of keeping ids
    bigint end-to-end is load-bearing — this op is the measured
    reason. One scan, one agg, exact counts."""
    o = load(spark, sf_dir, "orders")
    keys = o.select(
        (F.col("o_orderkey").cast("long") * 1200000 + 9007199254740993).alias("big_k"),
        F.col("o_orderkey").cast("long").alias("small_k"),
    )
    rt = keys.select(
        "big_k",
        "small_k",
        F.col("big_k").cast("double").cast("long").alias("big_rt"),
        F.col("small_k").cast("double").cast("long").alias("small_rt"),
    )
    return rt.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.count(F.when(F.col("small_rt") != F.col("small_k"), 1))
        .cast("long")
        .alias("n_small_corrupted"),
        F.count(F.when(F.col("big_rt") != F.col("big_k"), 1))
        .cast("long")
        .alias("n_big_corrupted"),
        F.max(F.abs(F.col("big_rt") - F.col("big_k"))).cast("long").alias("max_key_drift"),
        (F.countDistinct("big_k") - F.countDistinct("big_rt"))
        .cast("long")
        .alias("n_keys_merged"),
    )



@register(
    "null_key_join_contract",
    """
WITH l AS (
  SELECT CASE WHEN event_id % 9 = 0 THEN NULL ELSE user_id END AS k, event_id
  FROM events
), r AS (
  SELECT CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id END AS k,
         cast(count(*) as bigint) AS cnt
  FROM events GROUP BY k
)
SELECT cast((SELECT count(*) FROM l) as bigint) AS n_left,
       cast((SELECT count(*) FROM l WHERE k IS NULL) as bigint) AS n_left_null,
       cast((SELECT count(*) FROM l JOIN r ON l.k = r.k) as bigint) AS n_inner,
       cast((SELECT count(*) FROM l LEFT JOIN r ON l.k = r.k
             WHERE r.k IS NULL) as bigint) AS n_left_unmatched,
       cast((SELECT count(*) FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k)
            as bigint) AS n_nullsafe_inner,
       cast((SELECT count(*) FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k)
            - (SELECT count(*) FROM l JOIN r ON l.k = r.k) as bigint)
         AS n_null_matches
""",
)
def null_key_join_contract(spark, sf_dir):
    """NULL-key join contract: rows with NULL keys NEVER match an
    equi-join (NULL = NULL is not TRUE — they all land in
    n_left_unmatched), while the null-safe operator (<=> / IS NOT
    DISTINCT FROM) pairs the NULL blocks and inflates the result by
    exactly n_null_matches — the measured difference between 'these
    records have no parent' and 'all orphans match each other', which
    is the bug when someone "fixes" missing joins with a null-safe
    equality. Completes the null-semantics trilogy: scalar behavior
    (null_semantics_sweep), ordering (ordering_semantics_contract),
    and now join matching. Exact counts, five formulations."""
    ev = load(spark, sf_dir, "events")
    l = ev.select(
        F.when(F.col("event_id") % 9 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("user_id"))
        .alias("k"),
        "event_id",
    )
    r = (
        ev.select(
            F.when(F.col("user_id") % 7 == 0, F.lit(None).cast("long"))
            .otherwise(F.col("user_id"))
            .alias("k")
        )
        .groupBy("k")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    n_left = l.count()
    n_left_null = l.filter(F.col("k").isNull()).count()
    n_inner = l.join(r, "k").count()
    n_left_unmatched = (
        l.join(r.withColumnRenamed("k", "rk"), l["k"] == F.col("rk"), "left")
        .filter(F.col("rk").isNull())
        .count()
    )
    n_nullsafe = l.join(r.withColumnRenamed("k", "rk"), l["k"].eqNullSafe(F.col("rk"))).count()
    return spark.createDataFrame(
        [
            (
                n_left,
                n_left_null,
                n_inner,
                n_left_unmatched,
                n_nullsafe,
                n_nullsafe - n_inner,
            )
        ],
        "n_left long, n_left_null long, n_inner long, n_left_unmatched long,"
        " n_nullsafe_inner long, n_null_matches long",
    )



@register(
    "shuffle_partition_advisor",
    f"""
WITH w AS (
  SELECT cast(count(*) as bigint) AS n_rows,
         cast(8 * 5 + 4 + 8 * 4 + 8 as bigint) AS fixed_bytes,
         cast(sum(length(l_returnflag) + length(l_linestatus)) as bigint) AS var_bytes
  FROM lineitem
)
SELECT n_rows,
       cast(fixed_bytes + (var_bytes + n_rows - 1) // n_rows as bigint)
         AS est_row_bytes,
       cast((n_rows * (fixed_bytes + (var_bytes + n_rows - 1) // n_rows)
             + {_SPA_TARGET} - 1) // {_SPA_TARGET} as bigint)
         AS recommended_partitions,
       cast({_SPA_TARGET} // (fixed_bytes + (var_bytes + n_rows - 1) // n_rows)
            as bigint) AS rows_per_partition
FROM w
""",
)
def shuffle_partition_advisor(spark, sf_dir):
    """spark.sql.shuffle.partitions advisor from MEASURED bytes: row
    width of lineitem (typed fixed widths + measured string bytes) ×
    row count / 64 MB target — the read-side sibling of
    rowgroup_size_advisor and the number this repo's session.py must
    re-derive at every scale factor (200 default partitions at 100 TB
    = 500 GB each = guaranteed spill; this arithmetic is the
    spill-aware sizing rule stated as a query). skew_diagnostics then
    says whether the UNIFORM assumption behind it holds. One scan,
    one agg, integer ceilings."""
    li = load(spark, sf_dir, "lineitem")
    w = li.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.lit(8 * 5 + 4 + 8 * 4 + 8).cast("long").alias("fixed_bytes"),
        F.sum(F.length("l_returnflag") + F.length("l_linestatus"))
        .cast("long")
        .alias("var_bytes"),
    )
    return w.select(
        "n_rows",
        F.expr("fixed_bytes + (var_bytes + n_rows - 1) div n_rows").alias("est_row_bytes"),
        F.expr(
            f"(n_rows * (fixed_bytes + (var_bytes + n_rows - 1) div n_rows)"
            f" + {_SPA_TARGET} - 1) div {_SPA_TARGET}"
        ).alias("recommended_partitions"),
        F.expr(
            f"{_SPA_TARGET} div (fixed_bytes + (var_bytes + n_rows - 1) div n_rows)"
        ).alias("rows_per_partition"),
    )



# ---------------------------------------------------------------------------
# round-4 batch (session 3bb): rec coverage, event-time disorder, ratio
# aggregation, SBC classes
# ---------------------------------------------------------------------------


@register(
    "rec_coverage_audit",
    """
WITH baskets AS (
  SELECT o_orderkey, l_partkey FROM orders o
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
), pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, cast(count(*) as bigint) AS n
  FROM baskets a JOIN baskets b
    ON a.o_orderkey = b.o_orderkey AND a.l_partkey != b.l_partkey
  GROUP BY p1, p2
), recs AS (
  SELECT p1, p2, n FROM (
    SELECT p1, p2, n, row_number() OVER (PARTITION BY p1 ORDER BY n DESC, p2) AS rk
    FROM pairs
  ) WHERE rk <= 3
), pop AS (
  SELECT l_partkey, cast(count(*) as bigint) AS sales,
         ntile(10) OVER (ORDER BY count(*) DESC, l_partkey) AS pop_decile
  FROM baskets GROUP BY l_partkey
), cat AS (SELECT cast(count(*) as bigint) AS n_parts FROM part)
SELECT cast(c.n_parts as bigint) AS catalog_size,
       cast(count(DISTINCT r.p2) as bigint) AS n_recommended_items,
       cast((count(DISTINCT r.p2) * 1000000) // c.n_parts as bigint) AS coverage_q,
       cast(count(CASE WHEN p.pop_decile = 1 THEN 1 END) as bigint)
         AS n_recs_top_decile,
       cast((count(CASE WHEN p.pop_decile = 1 THEN 1 END) * 1000000)
            // count(*) as bigint) AS popularity_bias_q
FROM recs r JOIN pop p ON p.l_partkey = r.p2 CROSS JOIN cat c
GROUP BY c.n_parts
""",
)
def rec_coverage_audit(spark, sf_dir):
    """Recommender coverage & popularity-bias audit of the top-3
    co-purchase table: what share of the CATALOG ever gets
    recommended (coverage_q — the long tail a pure-popularity
    recommender starves), and what share of all recommendation slots
    point into the top sales decile (popularity_bias_q — rich-get-
    richer feedback measured before it ships). Accuracy metrics
    (copurchase lift, err/ndcg) say recommendations are RIGHT; this
    family says what they do to the CATALOG — the second axis every
    recsys review actually argues about. Basket self-join bounded by
    order width; per-item top-3 via WindowGroupLimit; one census."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    baskets = o.join(li, li["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderkey", "l_partkey"
    )
    a = baskets.alias("a")
    b = baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.o_orderkey") == F.col("b.o_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    recs = (
        pairs.withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("p1").orderBy(F.desc("n"), F.asc("p2"))),
        )
        .filter(F.col("rk") <= 3)
        .select("p1", "p2")
    )
    pop = (
        baskets.groupBy("l_partkey")
        .agg(F.count("*").cast("long").alias("sales"))
        .withColumn(
            "pop_decile",
            F.ntile(10).over(Window.orderBy(F.desc("sales"), F.asc("l_partkey"))),
        )
    )
    cat = load(spark, sf_dir, "part").agg(F.count("*").cast("long").alias("n_parts"))
    return (
        recs.join(pop.select(F.col("l_partkey").alias("p2"), "pop_decile"), "p2")
        .crossJoin(F.broadcast(cat))
        .groupBy("n_parts")
        .agg(
            F.countDistinct("p2").cast("long").alias("n_recommended_items"),
            F.count(F.when(F.col("pop_decile") == 1, 1))
            .cast("long")
            .alias("n_recs_top_decile"),
            F.count("*").cast("long").alias("n_slots"),
        )
        .select(
            F.col("n_parts").alias("catalog_size"),
            "n_recommended_items",
            F.expr("(n_recommended_items * 1000000) div n_parts").alias("coverage_q"),
            "n_recs_top_decile",
            F.expr("(n_recs_top_decile * 1000000) div n_slots").alias(
                "popularity_bias_q"
            ),
        )
    )



@register(
    "event_time_disorder_audit",
    """
WITH seq AS (
  SELECT user_id, epoch_us(ts) // 1000000 AS t,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS arrival_rn
  FROM events
), runmax AS (
  SELECT user_id, t,
         max(t) OVER (PARTITION BY user_id ORDER BY arrival_rn
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS seen_max
  FROM seq
)
SELECT cast(count(*) as bigint) AS n_events,
       cast(count(CASE WHEN seen_max IS NOT NULL AND t < seen_max THEN 1 END)
            as bigint) AS n_out_of_order,
       cast(coalesce(max(CASE WHEN seen_max IS NOT NULL AND t < seen_max
                          THEN seen_max - t END), 0) as bigint)
         AS max_lateness_s,
       cast(coalesce(sum(CASE WHEN seen_max IS NOT NULL AND t < seen_max
                          THEN seen_max - t ELSE 0 END), 0) as bigint)
         AS total_lateness_s
FROM runmax
""",
)
def event_time_disorder_audit(spark, sf_dir):
    """Event-time disorder bound — the number a watermark SHOULD be
    set to, measured instead of guessed: replaying each user's stream
    in ARRIVAL order (event_id — the ingestion sequence), every event
    whose timestamp is below the running event-time maximum is
    out-of-order, and max_lateness_s is exactly the smallest
    withWatermark delay that would have dropped nothing (the
    streaming facet's lateness knob, derived from the data; a
    watermark below this number loses n_out_of_order-bounded rows,
    which lateness_profile_users then itemizes). One running-max
    window per user + one census — the cheapest possible audit with
    the most expensive failure mode it prevents."""
    ev = load(spark, sf_dir, "events")
    seq = ev.select(
        "user_id",
        F.expr("unix_timestamp(ts)").alias("t"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("event_id"))
        .alias("arrival_rn"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("arrival_rn")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    runmax = seq.select("t", F.max("t").over(w).alias("seen_max"))
    late = F.col("seen_max").isNotNull() & (F.col("t") < F.col("seen_max"))
    return runmax.agg(
        F.count("*").cast("long").alias("n_events"),
        F.count(F.when(late, 1)).cast("long").alias("n_out_of_order"),
        F.coalesce(F.max(F.when(late, F.col("seen_max") - F.col("t"))), F.lit(0))
        .cast("long")
        .alias("max_lateness_s"),
        F.coalesce(
            F.sum(F.when(late, F.col("seen_max") - F.col("t")).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("total_lateness_s"),
    )



@register(
    "ratio_aggregation_contract",
    f"""
WITH per_user AS (
  SELECT user_id,
         cast(sum(cast(round(cast(value as {DEC}) * 100) as bigint)) as bigint) AS x,
         cast(count(*) as bigint) AS y
  FROM events GROUP BY user_id
), ratios AS (
  SELECT user_id, x, y, (x * 1000000) // y AS user_ratio_q FROM per_user
), med AS (
  SELECT user_ratio_q AS median_ratio_q FROM (
    SELECT user_ratio_q, row_number() OVER (ORDER BY user_ratio_q, user_id) AS r,
           count(*) OVER () AS n
    FROM ratios
  ) WHERE r = (n + 1) // 2
)
SELECT cast(sum(r.x) * 1000000 // sum(r.y) as bigint) AS ratio_of_sums_q,
       cast(sum(r.user_ratio_q) // count(*) as bigint) AS mean_of_ratios_q,
       cast(max(m.median_ratio_q) as bigint) AS median_of_ratios_q,
       cast(abs(sum(r.x) * 1000000 // sum(r.y)
                - sum(r.user_ratio_q) // count(*)) as bigint) AS ros_vs_mor_gap_q
FROM ratios r CROSS JOIN med m
""",
)
def ratio_aggregation_contract(spark, sf_dir):
    """Ratio-aggregation contract: revenue-per-event computed as RATIO
    OF SUMS (event-weighted — heavy users dominate), MEAN OF RATIOS
    (user-weighted — every user counts once), and MEDIAN OF RATIOS
    (the robust read) — three legitimate numbers for 'the' average
    that disagree by ros_vs_mor_gap_q, exactly (the point-estimate
    face of what delta_method_ratio_users handles for VARIANCE, and
    the aggregation-choice sibling of simpsons_paradox_audit: no
    paradox needed, weighting alone moves the answer). Every figure
    is exact integer micro. One per-user agg + one rank + one
    combine."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("x"),
        F.count("*").cast("long").alias("y"),
    )
    ratios = per_user.select(
        "user_id", "x", "y", F.expr("(x * 1000000) div y").alias("user_ratio_q")
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    med = (
        ratios.select(
            "user_ratio_q",
            F.row_number().over(Window.orderBy("user_ratio_q", "user_id")).alias("r"),
            F.count("*").over(w_all).alias("n"),
        )
        .filter(F.col("r") == F.expr("(n + 1) div 2"))
        .select(F.col("user_ratio_q").alias("median_ratio_q"))
    )
    return (
        ratios.crossJoin(F.broadcast(med))
        .agg(
            F.expr("cast(sum(x) * 1000000 div sum(y) as bigint)").alias("ratio_of_sums_q"),
            F.expr("cast(sum(user_ratio_q) div count(*) as bigint)").alias(
                "mean_of_ratios_q"
            ),
            F.max("median_ratio_q").cast("long").alias("median_of_ratios_q"),
            F.expr(
                "cast(abs(sum(x) * 1000000 div sum(y)"
                " - sum(user_ratio_q) div count(*)) as bigint)"
            ).alias("ros_vs_mor_gap_q"),
        )
    )



# ---------------------------------------------------------------------------
# round-4 batch (session 3cc): preflight censuses — graph, docs, spans, dims
# ---------------------------------------------------------------------------


@register(
    "edge_hygiene_census",
    f"""
WITH raw AS (
  SELECT doc_id AS src, {_PR_EDGE_DST} % {_PR_N} AS dst
  FROM documents, (VALUES (0),(1),(2)) AS t(j)
), stats AS (
  SELECT cast(count(*) as bigint) AS n_raw,
         cast(count(CASE WHEN src = dst THEN 1 END) as bigint) AS n_self_loops,
         cast(count(*) - count(DISTINCT (src, dst)) as bigint) AS n_multi_edges
  FROM raw
), dedup AS (
  SELECT DISTINCT src, dst FROM raw WHERE src != dst
), recip AS (
  SELECT cast(count(*) as bigint) AS n_recip
  FROM dedup a JOIN dedup b ON b.src = a.dst AND b.dst = a.src
), isolated AS (
  SELECT cast(count(*) as bigint) AS n_no_in
  FROM documents d WHERE NOT EXISTS (
    SELECT 1 FROM dedup e WHERE e.dst = d.doc_id)
)
SELECT s.n_raw, s.n_self_loops, s.n_multi_edges,
       cast((SELECT count(*) FROM dedup) as bigint) AS n_simple_edges,
       r.n_recip, i.n_no_in
FROM stats s CROSS JOIN recip r CROSS JOIN isolated i
""",
)
def edge_hygiene_census(spark, sf_dir):
    """Graph-hygiene preflight for the md5 link graph: self-loops,
    multi-edges (raw minus distinct — silently collapsed by every op
    that starts with DISTINCT), the simple-edge count that survives,
    reciprocal edge pairs, and in-degree-0 nodes — the five numbers
    every downstream graph metric implicitly conditions on
    (pagerank's sink mass, triangle counting's multi-edge inflation,
    reciprocity's denominator). Stating them once as a census makes
    the preprocessing CONTRACT explicit instead of re-derived
    per-op. Two aggs + one reciprocal self-join on the deduped edge
    table."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    raw = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    D.md5_long(F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))) % n
                    for j in range(3)
                ]
            )
        ).alias("dst"),
    )
    stats = raw.agg(
        F.count("*").cast("long").alias("n_raw"),
        F.count(F.when(F.col("src") == F.col("dst"), 1)).cast("long").alias("n_self_loops"),
        (F.count("*") - F.countDistinct("src", "dst")).cast("long").alias("n_multi_edges"),
    )
    dedup = raw.filter(F.col("src") != F.col("dst")).distinct().localCheckpoint()
    n_simple = dedup.count()
    a = dedup.alias("a")
    b = dedup.select(F.col("src").alias("bsrc"), F.col("dst").alias("bdst")).alias("b")
    recip = a.join(
        b, (F.col("bsrc") == F.col("a.dst")) & (F.col("bdst") == F.col("a.src"))
    ).agg(F.count("*").cast("long").alias("n_recip"))
    isolated = d.join(
        dedup.select(F.col("dst").alias("doc_id")).distinct(), "doc_id", "left_anti"
    ).agg(F.count("*").cast("long").alias("n_no_in"))
    return (
        stats.crossJoin(F.broadcast(recip))
        .crossJoin(F.broadcast(isolated))
        .select(
            "n_raw",
            "n_self_loops",
            "n_multi_edges",
            F.lit(n_simple).cast("long").alias("n_simple_edges"),
            "n_recip",
            "n_no_in",
        )
    )



@register(
    "table_span_census",
    """
WITH spans AS (
  SELECT 'orders' AS tbl,
         cast(min(epoch_us(o_orderdate) // 1000000 // 86400) as bigint) AS d0,
         cast(max(epoch_us(o_orderdate) // 1000000 // 86400) as bigint) AS d1,
         cast(count(DISTINCT epoch_us(o_orderdate) // 1000000 // 86400) as bigint)
           AS n_days
  FROM orders
  UNION ALL
  SELECT 'lineitem',
         cast(min(epoch_us(l_shipdate) // 1000000 // 86400) as bigint),
         cast(max(epoch_us(l_shipdate) // 1000000 // 86400) as bigint),
         cast(count(DISTINCT epoch_us(l_shipdate) // 1000000 // 86400) as bigint)
  FROM lineitem
  UNION ALL
  SELECT 'events',
         cast(min(epoch_us(ts) // 1000000 // 86400) as bigint),
         cast(max(epoch_us(ts) // 1000000 // 86400) as bigint),
         cast(count(DISTINCT epoch_us(ts) // 1000000 // 86400) as bigint)
  FROM events
)
SELECT tbl, d0 AS first_day, d1 AS last_day,
       cast(d1 - d0 + 1 as bigint) AS span_days, n_days,
       cast(d1 - d0 + 1 - n_days as bigint) AS n_gap_days
FROM spans ORDER BY tbl
""",
)
def table_span_census(spark, sf_dir):
    """Cross-table temporal-span census: first/last active day, span,
    and gap days for orders, lineitem, and events side by side — the
    alignment preflight for every cross-table temporal join in this
    registry (asof attribution, order aging, crawl diffs): two tables
    whose spans barely overlap produce silently tiny joins that look
    like low conversion, and THIS census is where that's visible in
    one glance (the events table's 30-day window vs the orders
    table's 7-year history is exactly such an asymmetry, stated
    rather than discovered). Three aggs + a union."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    ev = load(spark, sf_dir, "events")

    def span(df, col, name):
        d = F.expr(f"unix_timestamp({col}) div 86400")
        return df.agg(
            F.lit(name).alias("tbl"),
            F.min(d).cast("long").alias("d0"),
            F.max(d).cast("long").alias("d1"),
            F.countDistinct(d).cast("long").alias("n_days"),
        )

    spans = (
        span(o, "o_orderdate", "orders")
        .unionByName(span(li, "l_shipdate", "lineitem"))
        .unionByName(span(ev, "ts", "events"))
    )
    return spans.select(
        "tbl",
        F.col("d0").alias("first_day"),
        F.col("d1").alias("last_day"),
        (F.col("d1") - F.col("d0") + 1).cast("long").alias("span_days"),
        "n_days",
        (F.col("d1") - F.col("d0") + 1 - F.col("n_days")).cast("long").alias("n_gap_days"),
    ).orderBy("tbl")



@register(
    "dimension_coverage_census",
    """
WITH dims AS (
  SELECT n.n_nationkey, s.seg
  FROM nation n CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer) s
), obs AS (
  SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
), cells AS (
  SELECT c_nationkey, c_mktsegment, cast(count(*) as bigint) AS n
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT cast((SELECT count(*) FROM dims) as bigint) AS n_possible_cells,
       cast((SELECT count(*) FROM obs) as bigint) AS n_observed_cells,
       cast((SELECT count(*) FROM dims) - (SELECT count(*) FROM obs) as bigint)
         AS n_empty_cells,
       cast((SELECT min(n) FROM cells) as bigint) AS min_cell_count,
       cast((SELECT max(n) FROM cells) as bigint) AS max_cell_count
""",
)
def dimension_coverage_census(spark, sf_dir):
    """Dimension-cross coverage census: of the nation × market-segment
    lattice, how many cells exist, how many are OBSERVED, how many
    are empty, and the occupancy envelope — the sparsity preflight
    for every cube/pivot/grouping-sets report (an empty cell renders
    as a missing row, which BI tools silently drop, which analysts
    read as zero — three different claims) and the denominator check
    for suppression/k-anonymity audits that count cells. One dim
    cross + two censuses, exact."""
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    segs = c.select(F.col("c_mktsegment").alias("seg")).distinct()
    n_possible = n.count() * segs.count()
    obs = c.select("c_nationkey", "c_mktsegment").distinct().count()
    cells = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").cast("long").alias("n")
    )
    env = cells.agg(
        F.min("n").cast("long").alias("min_cell_count"),
        F.max("n").cast("long").alias("max_cell_count"),
    )
    return env.select(
        F.lit(n_possible).cast("long").alias("n_possible_cells"),
        F.lit(obs).cast("long").alias("n_observed_cells"),
        F.lit(n_possible - obs).cast("long").alias("n_empty_cells"),
        "min_cell_count",
        "max_cell_count",
    )

