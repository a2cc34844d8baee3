"""Registry family: curation (split from the single-file registry; query names and behavior unchanged)."""

from __future__ import annotations

from gipspark.queries._base import (  # noqa: F401
    C,
    D,
    DEC,
    F,
    Window,
    _LAT,
    _LON,
    knn_join,
    load,
    register,
    table_rows,
)
from gipspark.queries._shared import (  # noqa: F401
    _KF_FOLDS,
    _LSM_DENSE_MIN,
    _MATCH_ROUNDS,
    _RESAMPLE_STEP,
    _SSA_A,
    _SSA_B,
    _WSS_K,
    _match_oracle_sql,
)



@register(
    "resample_linear_user",
    f"""
WITH ev AS (
  SELECT user_id, cast(floor(epoch(ts)) as bigint) AS t,
         cast(round(value * 100) as bigint) AS cents,
         event_id
  FROM events
), bounds AS (
  SELECT user_id,
         (min(t) // {_RESAMPLE_STEP}) * {_RESAMPLE_STEP} AS lo,
         (max(t) // {_RESAMPLE_STEP}) * {_RESAMPLE_STEP} AS hi
  FROM ev GROUP BY user_id
), grid AS (
  SELECT user_id, unnest(range(lo, hi + 1, {_RESAMPLE_STEP})) AS t FROM bounds
), u AS (
  SELECT user_id, t, 1 AS kind, cents, t AS et, event_id FROM ev
  UNION ALL
  SELECT user_id, t, 0 AS kind, NULL AS cents, NULL AS et, NULL AS event_id FROM grid
), f AS (
  SELECT user_id, t, kind,
         last_value(cents IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t, kind DESC, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pc,
         last_value(et IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t, kind DESC, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
         first_value(cents IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t, kind DESC, event_id
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nc,
         first_value(et IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t, kind DESC, event_id
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
  FROM u
)
SELECT user_id, t AS t_s,
       CASE WHEN nt IS NULL THEN cast(pc as double) / 100.0
            ELSE (cast(pc as double)
                  + cast(nc - pc as double) * cast(t - pt as double)
                    / cast(nt - pt as double)) / 100.0 END AS v
FROM f
WHERE kind = 0 AND pt IS NOT NULL
""",
)
def resample_linear_user(spark, sf_dir):
    """Time-series resampling with linear interpolation (the
    TimescaleDB ``interpolate`` shape): a fixed 6 h grid per user,
    each grid instant valued by interpolating between the bracketing
    readings (hold-last beyond the final reading, grid points before
    the first reading dropped). Grid rows union with readings and TWO
    ignore-nulls window fills (last previous / first next) resolve both
    brackets in ONE shuffle on user_id — no asof join, no range join.
    Interpolation arithmetic: integer cents/seconds differences widen
    to double in a fixed textual order, one division — bit-identical
    across engines."""
    ev = load(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("t"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    step = F.lit(_RESAMPLE_STEP)
    bounds = e.groupBy("user_id").agg(
        (F.floor(F.min("t") / step) * step).cast("long").alias("lo"),
        (F.floor(F.max("t") / step) * step).cast("long").alias("hi"),
    )
    grid = bounds.select(
        "user_id", F.explode(F.sequence("lo", "hi", step)).alias("t")
    )
    u = e.select(
        "user_id", "t", F.lit(1).alias("kind"), "cents", F.col("t").alias("et"), "event_id"
    ).unionByName(
        grid.select(
            "user_id",
            "t",
            F.lit(0).alias("kind"),
            F.lit(None).cast("long").alias("cents"),
            F.lit(None).cast("long").alias("et"),
            F.lit(None).cast("long").alias("event_id"),
        )
    )
    # event_id breaks same-second event ties identically on both engines
    # (grid rows are unique per (user, t), so their NULL id never ties)
    w = Window.partitionBy("user_id").orderBy(F.col("t"), F.col("kind").desc(), F.col("event_id"))
    back = w.rowsBetween(Window.unboundedPreceding, 0)
    fwd = w.rowsBetween(1, Window.unboundedFollowing)
    f = u.select(
        "user_id",
        "t",
        "kind",
        F.last("cents", ignorenulls=True).over(back).alias("pc"),
        F.last("et", ignorenulls=True).over(back).alias("pt"),
        F.first("cents", ignorenulls=True).over(fwd).alias("nc"),
        F.first("et", ignorenulls=True).over(fwd).alias("nt"),
    )
    v = F.when(F.col("nt").isNull(), F.col("pc").cast("double") / F.lit(100.0)).otherwise(
        (
            F.col("pc").cast("double")
            + (F.col("nc") - F.col("pc")).cast("double")
            * (F.col("t") - F.col("pt")).cast("double")
            / (F.col("nt") - F.col("pt")).cast("double")
        )
        / F.lit(100.0)
    )
    return (
        f.filter((F.col("kind") == 0) & F.col("pt").isNotNull())
        .select("user_id", F.col("t").alias("t_s"), v.alias("v"))
    )



@register(
    "sample_k_per_group",
    f"""
WITH keyed AS (
  SELECT doc_id, source,
         {D.MD5_LONG_SQL.format(x="concat('smp:', cast(doc_id as varchar))")} AS hk
  FROM documents
)
SELECT doc_id, source, rk FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY hk, doc_id) AS rk
  FROM keyed
) WHERE rk <= 20
""",
)
def sample_k_per_group(spark, sf_dir):
    """Exact-k uniform sample per stratum, reproducible: rank rows
    inside each group by a salted md5 of the id (a fixed random
    permutation) and keep the first k — unlike fraction-based
    stratified_sample_docs this guarantees EXACTLY k per group, the
    contract eval-set builders need. The rank ≤ k predicate plans as
    WindowGroupLimit (top-k per key without materializing full
    partitions), one shuffle on the stratum key."""
    d = load(spark, sf_dir, "documents")
    hk = D.md5_long(F.concat(F.lit("smp:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(hk.asc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
    )



@register(
    "weighted_systematic_sample",
    f"""
WITH w AS (
  SELECT o_orderkey, cast(round(cast(o_totalprice as {DEC}) * 100) as bigint) AS cents
  FROM orders
), c AS (
  SELECT o_orderkey, cents,
         cast(sum(cents) OVER (ORDER BY o_orderkey
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              as bigint) AS cum
  FROM w
), g AS (SELECT cast(sum(cents) as bigint) // {_WSS_K} AS step FROM w)
SELECT c.o_orderkey, c.cents, c.cum
FROM c, g
WHERE g.step > 0 AND c.cum // g.step > (c.cum - c.cents) // g.step
ORDER BY c.o_orderkey
""",
)
def weighted_systematic_sample(spark, sf_dir):
    """Systematic probability-proportional-to-size sampling of orders
    weighted by price — the classic PPS design (one pass, fixed grid
    of k={_WSS_K} equally spaced skip points over the cumulative
    weight axis; a row is drawn iff its weight interval
    (cum−w, cum] covers a grid multiple). Fully deterministic and
    integer-exact: weights are integer cents, the inclusive running
    total is the two-phase distributed cumsum
    (operators/ranking.py global_cumsum — NO single-partition window;
    per-partition sums + driver prefix offsets, integer so
    re-association is exact), and the draw test is pure integer
    division. Heavy rows (w ≥ step) are always drawn — the PPS
    certainty stratum — so the sample size is ≥k−1 but not fixed."""
    from gipspark.operators.ranking import global_cumsum

    w = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"),
    )
    c = global_cumsum(w, ["o_orderkey"], "cents", out="cum")
    g = w.agg((F.sum("cents").cast("long") / F.lit(_WSS_K)).cast("long").alias("step"))
    return (
        c.crossJoin(F.broadcast(g))
        .filter(
            (F.col("step") > 0)
            & (
                F.expr("cum div step")
                > F.expr("(cum - cents) div step")
            )
        )
        .select("o_orderkey", "cents", "cum")
        .orderBy("o_orderkey")
    )



@register("capacity_matching_customers", _match_oracle_sql())
def capacity_matching_customers(spark, sf_dir):
    """Capacity-constrained nearest matching (deferred-acceptance
    rounds): customers propose to their nearest supplier that still
    has slots, each supplier accepts its closest proposals up to
    remaining capacity, and rejected customers re-propose next round —
    the facility-assignment problem Voronoi catchments ignore
    (catchment_counts assigns by distance alone; real depots have
    finite capacity). Fully deterministic: haversine shared textually
    with the oracle, (dist, id) tie-breaks on both window ranks, fixed
    {_MATCH_ROUNDS} rounds. Scale shape per round: proposals ride the
    SAME exact k-ring kNN kernel as every other nearest query (never a
    customer×supplier cross join — the oracle's CROSS JOIN is the
    spec, not the plan); acceptance is a per-supplier window over its
    own proposals; capacities update via one dim-scale agg. matched is
    localCheckpointed so round plans don't nest."""
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("q_id"),
        C.derived_lat(F.col("c_custkey")).alias("q_lat"),
        C.derived_lon(F.col("c_custkey")).alias("q_lon"),
    )
    sk = F.col("s_suppkey") * 31 + 7
    sup = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("p_id"),
        (F.lit(1) + F.col("s_suppkey") % 3).cast("long").alias("cap"),
        C.derived_lat(sk).alias("p_lat"),
        C.derived_lon(sk).alias("p_lon"),
    )
    n_sup = table_rows(sf_dir, "supplier")
    matched = None
    unmatched = cust
    for i in range(1, _MATCH_ROUNDS + 1):
        if matched is None:
            rem = sup.withColumn("rem", F.col("cap"))
        else:
            taken = matched.groupBy(F.col("p_id")).agg(F.count(F.lit(1)).alias("cnt"))
            rem = sup.join(taken, "p_id", "left").withColumn(
                "rem", F.col("cap") - F.coalesce("cnt", F.lit(0))
            )
        avail = rem.filter(F.col("rem") > 0)
        if avail.limit(1).count() == 0:  # dim-scale probe, bounded
            break
        prop = knn_join(
            unmatched,
            avail.select("p_id", "p_lat", "p_lon"),
            k=1,
            n_points_hint=n_sup,
        )
        wacc = Window.partitionBy("p_id").orderBy("dist_m", "q_id")
        acc = (
            prop.withColumn("srn", F.row_number().over(wacc))
            .join(F.broadcast(avail.select("p_id", "rem")), "p_id")
            .filter(F.col("srn") <= F.col("rem"))
            .select("q_id", "p_id", "dist_m", F.lit(i).cast("long").alias("rnd"))
        )
        matched = acc if matched is None else matched.unionByName(acc)
        matched = matched.localCheckpoint()
        unmatched = unmatched.join(matched.select("q_id"), "q_id", "left_anti")
    return matched.select(
        F.col("q_id").alias("c_custkey"),
        F.col("p_id").cast("long").alias("s_suppkey"),
        "rnd",
        # 0-dp round: the engines' haversines can differ by 1 ULP
        # (same rule as knn_join_nations' dist_m0)
        F.round("dist_m", 0).cast("double").alias("dist_m0"),
    )



@register(
    "mixture_temperature_weights",
    """
WITH g AS (
  SELECT lang, source,
         cast(count(*) as bigint) AS n_docs,
         cast(sum(n_chars) as bigint) AS chars
  FROM documents GROUP BY lang, source
), w AS (
  SELECT lang, source, n_docs, chars,
         sqrt(cast(chars as double)) AS weight
  FROM g
), tot AS (
  SELECT list_reduce(list_sort(list(weight)), (a, b) -> a + b) AS total FROM w
)
SELECT lang, source, n_docs, chars, weight,
       weight / total AS share
FROM w CROSS JOIN tot
""",
)
def mixture_temperature_weights(spark, sf_dir):
    """Temperature-scaled data-mixture weights (T=2 ⇒ weight ∝ √chars),
    the sampling table a pretraining run derives before drawing a
    token-budgeted mixture — up-weights small languages/sources the
    way multilingual LMs do.  Exactness trick: √ is correctly-rounded
    IEEE in both engines, and the normalizer is a LEFT FOLD over the
    VALUE-SORTED weight list (array_sort + aggregate here, list_sort +
    list_reduce in the oracle) — a plain SUM() of doubles hashes
    differently because each engine's partial-aggregation order is its
    own (a cumulative-window variant failed by 1–2 ulp: DuckDB does
    not accumulate running frames strictly left-to-right either).
    The folded list is the GROUP table (|langs|×|sources| entries,
    data-independent), so the 1-row collect is a constant-size
    broadcast no matter the input scale."""
    d = load(spark, sf_dir, "documents")
    g = d.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars"),
    )
    w = g.select(
        "lang", "source", "n_docs", "chars",
        F.sqrt(F.col("chars").cast("double")).alias("weight"),
    )
    tot = w.agg(
        F.aggregate(
            F.array_sort(F.collect_list("weight")), F.lit(0.0), lambda acc, x: acc + x
        ).alias("total")
    )
    return w.crossJoin(F.broadcast(tot)).select(
        "lang", "source", "n_docs", "chars", "weight",
        (F.col("weight") / F.col("total")).alias("share"),
    )



@register(
    "landscape_edge_metrics",
    f"""
WITH pts AS (
  SELECT {_LAT.format(k='event_id')} AS lat, {_LON.format(k='event_id')} AS lon FROM events
), grid AS (
  SELECT cast(floor((lon + 180.0) / 2.5) as int) AS cx,
         cast(floor((90.0 - lat) / 2.5) as int) AS cy,
         cast(count(*) as bigint) AS v
  FROM pts GROUP BY cx, cy
), fg AS (SELECT cx, cy FROM grid WHERE v >= {_LSM_DENSE_MIN}),
inter AS (
  SELECT cast(count(*) as bigint) AS interior_edges
  FROM fg a JOIN fg b
    ON (b.cx = a.cx + 1 AND b.cy = a.cy) OR (b.cx = a.cx AND b.cy = a.cy + 1)
), base AS (
  SELECT cast(count(*) as bigint) AS n_cells,
         cast(count(CASE WHEN v >= {_LSM_DENSE_MIN} THEN 1 END) as bigint) AS n_fg
  FROM grid
)
SELECT base.n_cells, base.n_fg, inter.interior_edges,
       cast(4 * base.n_fg - 2 * inter.interior_edges as bigint) AS perimeter_edges,
       cast(base.n_fg * 1000000 // base.n_cells as bigint) AS fg_share_q,
       cast(CASE WHEN base.n_fg > 0
                 THEN (4 * base.n_fg - 2 * inter.interior_edges) * 1000000 // base.n_fg
                 ELSE 0 END as bigint) AS edge_density_q
FROM base, inter
""",
)
def landscape_edge_metrics(spark, sf_dir):
    """FRAGSTATS-style landscape metrics of the dense-cell mask (the
    fragmentation observables ecology and urban-form analysis read
    off a binarized raster, here the ≥3-events foreground that
    grid_cluster/raster_regions also use): interior 4-adjacency edge
    count from ONE foreground self-join on the two forward neighbor
    offsets, exact perimeter by the lattice identity 4·n_fg −
    2·interior (unobserved neighbors ARE background, so no background
    table is ever materialized), foreground share and edge density in
    1e6 ticks. High edge density at fixed share = fragmented sprawl;
    low = compact cores. Two 1-row aggregates cross-combined."""
    ev = load(spark, sf_dir, "events")
    grid = (
        ev.select(
            F.floor((C.derived_lon(F.col("event_id")) + 180.0) / 2.5).cast("int").alias("cx"),
            F.floor((90.0 - C.derived_lat(F.col("event_id"))) / 2.5).cast("int").alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.count("*").cast("long").alias("v"))
    )
    fg = grid.filter(F.col("v") >= _LSM_DENSE_MIN).select("cx", "cy")
    a = fg.select(F.col("cx").alias("ax"), F.col("cy").alias("ay"))
    b = fg.select(F.col("cx").alias("bx"), F.col("cy").alias("by"))
    right = a.join(b, (F.col("bx") == F.col("ax") + 1) & (F.col("by") == F.col("ay")))
    down = a.join(b, (F.col("bx") == F.col("ax")) & (F.col("by") == F.col("ay") + 1))
    inter = right.unionAll(down).agg(F.count("*").cast("long").alias("interior_edges"))
    base = grid.agg(
        F.count("*").cast("long").alias("n_cells"),
        F.count(F.when(F.col("v") >= _LSM_DENSE_MIN, True)).cast("long").alias("n_fg"),
    )
    return (
        base.crossJoin(F.broadcast(inter))
        .select(
            "n_cells",
            "n_fg",
            "interior_edges",
            (4 * F.col("n_fg") - 2 * F.col("interior_edges")).cast("long").alias("perimeter_edges"),
            F.expr("(n_fg * 1000000) div n_cells").cast("long").alias("fg_share_q"),
            F.expr(
                "CASE WHEN n_fg > 0 THEN ((4 * n_fg - 2 * interior_edges) * 1000000) div n_fg "
                "ELSE 0 END"
            )
            .cast("long")
            .alias("edge_density_q"),
        )
    )



@register(
    "stratified_kfold_assign",
    f"""
WITH a AS (
  SELECT label, {D.MD5_LONG_SQL.format(x="'kf:' || cast(vec_id as varchar)")} % {_KF_FOLDS}
           AS fold
  FROM embeddings
), lt AS (SELECT label, cast(count(*) as bigint) AS n_label FROM a GROUP BY label)
SELECT a.label, cast(a.fold as int) AS fold, cast(count(*) as bigint) AS n,
       cast(count(*) * 1000000 // any_value(lt.n_label) as bigint) AS fold_share_q
FROM a JOIN lt ON lt.label = a.label
GROUP BY a.label, a.fold
""",
)
def stratified_kfold_assign(spark, sf_dir):
    """Deterministic stratified k-fold assignment contract — the
    cross-validation split every evaluation pipeline needs to be
    REPRODUCIBLE and label-balanced (an RNG split differs per run and
    per partition order; the md5 assignment is a pure function of the
    row key): fold = md5(vec_id) mod 5, and the output is the per-
    (label, fold) census with exact within-label shares — the
    imbalance audit (each share should sit near 200000 ticks; a
    skewed stratum is visible immediately). One scan, two hash aggs.
    The same keyed-hash split convention as ab_welch / diff-in-diff,
    here elevated to the k-way contract."""
    e = load(spark, sf_dir, "embeddings")
    a = e.select(
        "label",
        (
            D.md5_long(F.concat(F.lit("kf:"), F.col("vec_id").cast("string"))) % _KF_FOLDS
        ).alias("fold"),
    )
    lt = a.groupBy("label").agg(F.count("*").cast("long").alias("n_label"))
    return (
        a.join(lt, "label")
        .groupBy("label", F.col("fold").cast("int").alias("fold"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.expr("(count(*) * 1000000) div any_value(n_label)")
            .cast("long")
            .alias("fold_share_q"),
        )
    )



@register(
    "sample_stability_audit",
    f"""
WITH lab AS (
  SELECT doc_id,
         CASE WHEN {_SSA_A} % 10 = 0 THEN 1 ELSE 0 END AS in_a,
         CASE WHEN {_SSA_B} % 10 = 0 THEN 1 ELSE 0 END AS in_b
  FROM documents
)
SELECT cast(count(*) as bigint) AS n_docs,
       cast(sum(in_a) as bigint) AS n_a, cast(sum(in_b) as bigint) AS n_b,
       cast(sum(in_a * in_b) as bigint) AS n_both,
       cast((sum(in_a * in_b) * count(*) * 1000000)
            // greatest(sum(in_a) * sum(in_b), 1) as bigint) AS independence_q
FROM lab
""",
)
def sample_stability_audit(spark, sf_dir):
    """Hash-sampling independence audit: two 10% samples under
    independent md5 salts, and the observed/expected overlap ratio
    obs·N/(n_a·n_b) in micro — 10⁶ means the salts behave as
    independent coins (overlap ≈ 1% of the corpus), while a ratio far
    above means the two 'independent' samples share structure and
    every A/A test or holdout built from salted hashing inherits the
    correlation (the silent failure mode of reusing one hash with
    different mod buckets instead of distinct salts — exactly the
    mistake this audit exists to catch before srm_check blames the
    randomizer). One projection + one fold; cross-multiplied,
    division-free comparison."""
    d = load(spark, sf_dir, "documents")
    lab = d.select(
        F.when(
            D.md5_long(F.concat(F.lit("sa:"), F.col("doc_id").cast("string"))) % 10 == 0,
            1,
        )
        .otherwise(0)
        .alias("in_a"),
        F.when(
            D.md5_long(F.concat(F.lit("sb:"), F.col("doc_id").cast("string"))) % 10 == 0,
            1,
        )
        .otherwise(0)
        .alias("in_b"),
    )
    return lab.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("in_a").cast("long").alias("n_a"),
        F.sum("in_b").cast("long").alias("n_b"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_both"),
        F.expr(
            "cast((sum(in_a * in_b) * count(*) * 1000000)"
            " div greatest(sum(in_a) * sum(in_b), 1L) as bigint)"
        ).alias("independence_q"),
    )



@register(
    "token_budget_select",
    """
WITH scored AS (
  SELECT doc_id,
         cast(len(regexp_split_to_array(lower(trim(text)), '\\s+')) as bigint) AS n_tok,
         """
    + __import__("gipspark.functions.text", fromlist=["x"]).quality_score_sql("text")
    + """ AS q
  FROM documents
), tot AS (
  SELECT cast(sum(n_tok) as bigint) AS total_tok FROM scored
), cum AS (
  SELECT s.doc_id, s.n_tok, s.q, t.total_tok,
         sum(s.n_tok) OVER (ORDER BY s.q DESC, s.doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM scored s CROSS JOIN tot t
), sel AS (
  SELECT *, c <= total_tok * 6 // 10 AS keep FROM cum
)
SELECT cast((SELECT total_tok * 6 // 10 FROM tot) as bigint) AS budget_tokens,
       cast(count(*) FILTER (WHERE keep) as bigint) AS n_selected,
       cast(count(*) FILTER (WHERE NOT keep) as bigint) AS n_rejected,
       cast(coalesce(sum(n_tok) FILTER (WHERE keep), 0) as bigint) AS tokens_selected,
       cast(min(CASE WHEN keep THEN doc_id END) as bigint) AS min_kept_doc,
       cast(max(CASE WHEN keep THEN doc_id END) as bigint) AS max_kept_doc
FROM sel
""",
)
def token_budget_select(spark, sf_dir):
    """Greedy quality-first token-budget selection (r5): rank docs by
    the deterministic quality score (tie-break doc_id), keep the
    prefix whose cumulative token count fits a 60%-of-corpus budget —
    the curation step that turns 'we can afford N tokens' into an
    actual document subset (the greedy rank-cut is how quality-
    filtered data mixes are built in practice; mixture_upsampling and
    per-source caps then rebalance within the kept set). Exact: the
    cumulative sum orders by (q DESC, doc_id) — q is the shared exact-
    double score, doc_id the total tie-break — and the budget is an
    integer floor-div of the corpus token total. Scale shape: one
    score pass, one 1-row total broadcast, one global cumulative
    window — a global ORDER BY, whose documented big-corpus
    alternative is the two-phase range-partitioned rank (the RFM
    swap): partial sums per range partition, prefix-offset broadcast,
    local cumsum; this op adopts it verbatim past the single-window
    scale."""
    from gipspark.functions.text import quality_score

    d = load(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).cast("long").alias("n_tok"),
        quality_score(F.col("text")).alias("q"),
    )
    tot = scored.agg(F.sum("n_tok").cast("long").alias("total_tok"))
    w = Window.orderBy(F.desc("q"), F.asc("doc_id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = scored.crossJoin(F.broadcast(tot)).withColumn("c", F.sum("n_tok").over(w))
    sel = cum.withColumn("keep", F.expr("c <= (total_tok * 6) div 10"))
    return sel.agg(
        F.expr("cast(max((total_tok * 6) div 10) as bigint)").alias("budget_tokens"),
        F.count_if(F.col("keep")).cast("long").alias("n_selected"),
        F.count_if(~F.col("keep")).cast("long").alias("n_rejected"),
        F.coalesce(F.sum(F.when(F.col("keep"), F.col("n_tok"))), F.lit(0))
        .cast("long")
        .alias("tokens_selected"),
        F.min(F.when(F.col("keep"), F.col("doc_id"))).cast("long").alias("min_kept_doc"),
        F.max(F.when(F.col("keep"), F.col("doc_id"))).cast("long").alias("max_kept_doc"),
    )
