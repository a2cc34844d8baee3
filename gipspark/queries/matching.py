"""Registry family: matching (split from the single-file registry; query names and behavior unchanged)."""

from __future__ import annotations

from gipspark.queries._base import (  # noqa: F401
    C,
    D,
    F,
    Window,
    knn_join,
    load,
    register,
    table_rows,
)
from gipspark.queries._shared import (  # noqa: F401
    _GS_PREFS,
    _GS_ROUNDS,
    _IPF_ROUNDS,
    _MARKOV_TICKS,
    _MK_CHANNELS,
    _MK_STEPS,
    _MK_TICK,
    _PLA_PTS,
    _SHAP_TERMS,
    _WIN_H,
    _WIN_K,
    _WIN_P,
    _WIN_W,
    _gs_sql,
    _ipf_sql,
    _markov_round_sql,
    _markov_run_sql,
    _markov_trans_sql,
)



@register(
    "markov_stationary_events",
    # integer power iteration toward the stationary distribution of the
    # event-type transition chain: mass in bigint ticks, per-edge flow
    # = (mass·n)//row_n (floor division, deterministic), 3 unrolled
    # rounds — the same exact-iteration discipline as pagerank.
    f"""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
), t0 AS (
  SELECT event_type AS src, nxt AS dst, cast(count(*) as bigint) AS n
  FROM seq WHERE nxt IS NOT NULL GROUP BY src, dst
), t AS (
  SELECT src, dst, n, cast(sum(n) OVER (PARTITION BY src) as bigint) AS row_n FROM t0
), states AS (SELECT DISTINCT src AS state FROM t),
m0 AS (
  SELECT state, cast({_MARKOV_TICKS} // (SELECT count(*) FROM states) as bigint) AS mass
  FROM states
),
{_markov_round_sql(1, 0)},
{_markov_round_sql(2, 1)},
{_markov_round_sql(3, 2)}
SELECT state, mass, cast(mass as double) / {_MARKOV_TICKS}.0 AS prob
FROM m3
""",
)
def markov_stationary_events(spark, sf_dir):
    """Stationary distribution of the user-journey Markov chain (where
    does attention concentrate if users keep clicking): integer power
    iteration over the event-type transition matrix that
    event_transition_matrix estimates — mass carried in bigint ticks,
    per-edge flow floor-divided exactly as pagerank's damping is, 3
    unrolled rounds so the oracle replays bit-identically.

    Scale shape: the corpus-scale work is the lead() window (one
    user_id shuffle) and the (src,dst) hash-agg; the chain itself is
    |event_types|² — dim-scale — so every iteration round is a join
    between tiny tables. The big table is never rescanned across
    rounds."""
    ev = load(spark, sf_dir, "events")
    seq = ev.select(
        "event_type",
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("nxt"),
    )
    t0 = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    t = t0.withColumn("row_n", F.sum("n").over(Window.partitionBy("src")).cast("long"))
    states = t.select(F.col("src").alias("state")).distinct()
    n_states = states.count()  # dim-scale (|event_types|), bounded driver action
    m = states.select(
        "state", F.lit(_MARKOV_TICKS // n_states).cast("long").alias("mass")
    )
    for _ in range(3):
        m = (
            m.join(t, m["state"] == t["src"])
            .select(F.col("dst").alias("state"), ((F.col("mass") * F.col("n")) / F.col("row_n")).cast("long").alias("flow"))
            .groupBy("state")
            .agg(F.sum("flow").cast("long").alias("mass"))
        )
    return m.select(
        "state", "mass", (F.col("mass").cast("double") / F.lit(float(_MARKOV_TICKS))).alias("prob")
    )



# ---------------------------------------------------------------------------
# round-4 session-3 batch 8: isotonic calibration, ACF, Palma, return periods
# ---------------------------------------------------------------------------


def _pava_oracle_sql() -> str:
    """Recursive-CTE PAVA (round 5): unlike the hull's trailing-scan
    shortcut, PAVA's pop tests read MERGED pool values, so pops cannot
    be precomputed — instead the recursion performs exactly ONE stack
    operation per iteration (merge-top-into-cur, push-cur, or
    consume-next-bin), which keeps every expression single-level and
    terminates in ≤3n steps per group. Integer cross-multiplied mean
    comparisons mirror operators/isotonic.pava_pools verbatim; the
    terminal state per group is selected by max step. Verified
    bit-identical on all 60 (source, bin) rows before wiring in."""
    return """
WITH RECURSIVE binned AS (
  SELECT source, least(n_chars // 200, 9) AS bin,
         cast(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) as bigint) AS sum_y,
         cast(count(*) as bigint) AS cnt
  FROM documents GROUP BY source, bin
), grp AS (
  SELECT source,
         list_transform(list_sort(list({'b': bin, 's': sum_y, 'c': cnt})), x -> x.b) AS bins,
         list_transform(list_sort(list({'b': bin, 's': sum_y, 'c': cnt})), x -> x.s) AS sums,
         list_transform(list_sort(list({'b': bin, 's': sum_y, 'c': cnt})), x -> x.c) AS cnts,
         len(list(bin)) AS n
  FROM binned GROUP BY source
), pava AS (
  SELECT source, bins, sums, cnts, n, 0 AS i,
         cast([] as struct(p bigint, s bigint, c bigint)[]) AS stack,
         {'p': cast(0 as bigint), 's': cast(0 as bigint), 'c': cast(0 as bigint)} AS cur,
         0 AS step
  FROM grp
  UNION ALL
  SELECT source, bins, sums, cnts, n,
         CASE WHEN cur.c > 0 THEN i ELSE i + 1 END AS i,
         CASE WHEN cur.c > 0 AND len(stack) > 0
                   AND stack[len(stack)].s * cur.c > cur.s * stack[len(stack)].c
              THEN stack[1:len(stack) - 1]
              WHEN cur.c > 0 THEN list_append(stack, cur)
              ELSE stack END AS stack,
         CASE WHEN cur.c > 0 AND len(stack) > 0
                   AND stack[len(stack)].s * cur.c > cur.s * stack[len(stack)].c
              THEN {'p': stack[len(stack)].p, 's': stack[len(stack)].s + cur.s,
                    'c': stack[len(stack)].c + cur.c}
              WHEN cur.c > 0
              THEN {'p': cast(0 as bigint), 's': cast(0 as bigint), 'c': cast(0 as bigint)}
              ELSE {'p': cast(i as bigint), 's': sums[i + 1], 'c': cnts[i + 1]} END AS cur,
         step + 1
  FROM pava
  WHERE cur.c > 0 OR i < n
), final AS (
  SELECT source, bins, n, stack
  FROM (SELECT *, row_number() OVER (PARTITION BY source ORDER BY step DESC) AS rn FROM pava)
  WHERE rn = 1
), outp AS (
  SELECT source, bins, n, stack, unnest(generate_series(1, n)) AS pos
  FROM final
), mapped AS (
  SELECT source, bins[pos] AS bin,
         len(list_filter(stack, x -> x.p <= pos - 1)) - 1 AS pool_id, stack
  FROM outp
)
SELECT source, cast(bin as int) AS bin,
       stack[pool_id + 1].s AS pool_sum,
       stack[pool_id + 1].c AS pool_cnt,
       cast(pool_id as int) AS pool_id,
       cast((stack[pool_id + 1].s * 1000000) // stack[pool_id + 1].c as bigint) AS fitted_q
FROM mapped ORDER BY source, bin
"""


@register("isotonic_calibration_sources", _pava_oracle_sql())
def isotonic_calibration_sources(spark, sf_dir):
    """Isotonic (PAVA) calibration curve per source: docs bin by length
    decile (global 10-bin grid), label = lang='en', and the per-source
    empirical P(en | length-bin) is made monotone by
    operators/isotonic.py — the post-hoc calibrator that turns a raw
    score into a monotone probability (the step after
    calibration_ece_docs measures miscalibration). Round 5 made this a
    BIT-EXACT oracle query: the DuckDB mirror runs PAVA as a recursive
    CTE performing one stack operation per iteration (_pava_oracle_sql
    — the merged-pool values forbid the hull's precomputed-pop
    shortcut), on top of tests/test_isotonic.py's method-independent
    repeated-sweep reference. Python sees only (source ×
    10) binned rows; the fact-table work is one aggregate."""
    from gipspark.operators.isotonic import isotonic_fit

    d = load(spark, sf_dir, "documents")
    binned = (
        d.select(
            "source",
            F.least(F.expr("n_chars div 200"), F.lit(9)).cast("int").alias("bin"),
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        )
        .groupBy("source", "bin")
        .agg(F.sum("y").cast("long").alias("sum_y"), F.count("*").cast("long").alias("cnt"))
    )
    return isotonic_fit(binned, ["source"]).orderBy("source", "bin")



@register(
    "multitouch_attribution_users",
    """
WITH ev AS (
  SELECT user_id, event_id, ts, event_type FROM events
  WHERE event_type IN ('click', 'view', 'purchase')
), seq AS (
  SELECT user_id, event_id, ts, event_type,
         first_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS np_id,
         first_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS np_ts
  FROM ev
), touches AS (
  SELECT user_id, event_id, event_type, np_id
  FROM seq
  WHERE event_type <> 'purchase' AND np_id IS NOT NULL
    AND epoch_us(np_ts) // 1000000 - epoch_us(ts) // 1000000 <= 604800
), ranked AS (
  SELECT user_id, event_type, np_id,
         cast(count(*) OVER (PARTITION BY user_id, np_id) as bigint) AS n_t,
         row_number() OVER (PARTITION BY user_id, np_id ORDER BY event_id) AS rf,
         row_number() OVER (PARTITION BY user_id, np_id ORDER BY event_id DESC) AS rl
  FROM touches
)
SELECT event_type,
       cast(count(*) as bigint) AS n_touch,
       cast(sum(1000000 // n_t) as bigint) AS linear_credit_q,
       cast(count(CASE WHEN rf = 1 THEN 1 END) as bigint) AS n_first_touch,
       cast(count(CASE WHEN rl = 1 THEN 1 END) as bigint) AS n_last_touch
FROM ranked GROUP BY event_type
""",
)
def multitouch_attribution_users(spark, sf_dir):
    """Multi-touch marketing attribution (first / last / linear — the
    three canonical credit rules, answered in one plan): every click
    or view assigns to the user's NEXT purchase within 7 days via one
    forward ignore-nulls window fill (the resample_linear_user
    machinery pointed forward — no as-of join, no range join, one
    user_id shuffle), then per-conversion touch counts turn into
    exact linear credits 1e6 // n_t plus first/last flags from two
    rank orders of the same partition. Credit conservation (Σ linear
    ≈ 1e6 per conversion, floor remainder documented) makes the
    result auditable; output is the 2-row per-channel credit table."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    seq = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.first(
            F.when(F.col("event_type") == "purchase", F.col("event_id")), ignorenulls=True
        )
        .over(w)
        .alias("np_id"),
        F.first(F.when(F.col("event_type") == "purchase", F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("np_ts"),
    )
    touches = seq.filter(
        (F.col("event_type") != "purchase")
        & F.col("np_id").isNotNull()
        & (
            F.unix_timestamp("np_ts") - F.unix_timestamp("ts") <= 604800
        )
    ).select("user_id", "event_id", "event_type", "np_id")
    wp = Window.partitionBy("user_id", "np_id")
    ranked = touches.select(
        "event_type",
        F.count("*").over(wp).cast("long").alias("n_t"),
        F.row_number().over(wp.orderBy("event_id")).alias("rf"),
        F.row_number().over(wp.orderBy(F.col("event_id").desc())).alias("rl"),
    )
    return ranked.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_touch"),
        F.sum(F.expr("1000000 div n_t")).cast("long").alias("linear_credit_q"),
        F.count(F.when(F.col("rf") == 1, True)).cast("long").alias("n_first_touch"),
        F.count(F.when(F.col("rl") == 1, True)).cast("long").alias("n_last_touch"),
    )



@register("ipf_od_balance", _ipf_sql())
def ipf_od_balance(spark, sf_dir):
    """Iterative proportional fitting (IPF / RAS / Sinkhorn balancing)
    of the daily origin→destination flow matrix — the transport-
    modeling primitive that reconciles a seed OD matrix with row and
    column control totals (here: its own marginals, so the contract
    is that three rounds of exact floor-scaled balancing stay within
    flooring error of a fixpoint — the classic doubly-constrained
    gravity calibration loop): each round multiplies every flow by
    target//rowsum then target//colsum in 128-bit integer ticks, so
    Spark and DuckDB replay bit-identically. The matrix is CELL×CELL
    (bounded dim after the one user-day min_by/max_by fold — the
    od_matrix_daily shape), each round is two dim-scale aggregates +
    two joins; rounds are unrolled, no driver loop."""
    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        F.expr("unix_timestamp(ts) div 86400").alias("d"),
        "ts",
        "event_id",
        F.floor((C.derived_lon(F.col("event_id")) + 180.0) / 30.0).cast("int").alias("cell"),
    )
    fl = pts.groupBy("user_id", "d").agg(
        F.expr("min_by(cell, struct(ts, event_id))").alias("o"),
        F.expr("max_by(cell, struct(ts, event_id))").alias("dst"),
    )
    od = fl.groupBy("o", "dst").agg((F.count("*") * 1000000).cast("long").alias("x0"))
    rt = od.groupBy("o").agg(F.sum("x0").cast("long").alias("r_target"))
    ct = od.groupBy("dst").agg(F.sum("x0").cast("long").alias("c_target"))
    cur, xcol = od, "x0"
    for t in range(1, _IPF_ROUNDS + 1):
        rs = cur.groupBy("o").agg(F.sum(xcol).cast("long").alias("rsum"))
        xr = (
            cur.join(rs, "o")
            .join(rt, "o")
            .select(
                "o",
                "dst",
                F.expr(f"(cast({xcol} as decimal(38,0)) * r_target) div rsum")
                .cast("long")
                .alias("xr"),
            )
        )
        cs = xr.groupBy("dst").agg(F.sum("xr").cast("long").alias("csum"))
        cur = (
            xr.join(cs, "dst")
            .join(ct, "dst")
            .select(
                "o",
                "dst",
                F.expr("(cast(xr as decimal(38,0)) * c_target) div csum")
                .cast("long")
                .alias(f"x{t}"),
            )
        )
        xcol = f"x{t}"
    return cur.select("o", "dst", F.col(xcol).alias("x_q"))



@register("gale_shapley_match", _gs_sql())
def gale_shapley_match(spark, sf_dir):
    """Gale-Shapley deferred acceptance between customers (proposers,
    preferring near suppliers) and unit-capacity suppliers (preferring
    near customers) — THE stable-matching algorithm (no customer-
    supplier pair would both rather defect), the principled
    counterpart to the greedy capacity matching: preference lists are
    the exact top-4 kNN (bounded — the list length is the contract,
    like truncated DA in school-choice practice), and four unrolled
    proposal rounds each do [unheld customers propose at their next
    rank, each supplier keeps the (dist, id)-best of held + new]. Per
    round: one rank join, one per-supplier window, one left join for
    the pointer bump — all hash shuffles on c or s, localCheckpoint
    cutting the 4-round lineage. Four waves is the bounded-round
    contract (the eigen/IPF/truss discipline): every unheld customer
    proposes each wave and list depth is 4, so only displacement
    chains longer than four waves stay open — they report as unheld,
    exactly as truncated DA does in school-choice practice."""
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("q_id"),
        C.derived_lat(F.col("c_custkey")).alias("q_lat"),
        C.derived_lon(F.col("c_custkey")).alias("q_lon"),
    )
    pk = F.col("s_suppkey") * 211 + 7
    sup = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("p_id"),
        C.derived_lat(pk).alias("p_lat"),
        C.derived_lon(pk).alias("p_lon"),
    )
    pref = (
        knn_join(cust, sup, k=_GS_PREFS, n_points_hint=table_rows(sf_dir, "supplier"))
        .select(
            F.col("q_id").alias("c"),
            F.col("p_id").alias("s"),
            F.col("dist_m").alias("dist"),
            F.col("rank").alias("rnk"),
        )
        .localCheckpoint(eager=True)
    )
    nr = pref.select("c").distinct().withColumn("nr", F.lit(1))
    held = pref.select("c", "s", "dist").filter(F.lit(False))
    for _t in range(_GS_ROUNDS):
        prop = (
            pref.join(nr, ["c"])
            .filter((F.col("rnk") == F.col("nr")) & (F.col("nr") <= _GS_PREFS))
            .join(held.select("c"), "c", "left_anti")
            .select("c", "s", "dist")
            .localCheckpoint(eager=True)
        )
        cand = prop.unionAll(held.select("c", "s", "dist"))
        ww = Window.partitionBy("s").orderBy("dist", "c")
        held = (
            cand.withColumn("w", F.row_number().over(ww))
            .filter(F.col("w") == 1)
            .select("c", "s", "dist")
            .localCheckpoint(eager=True)
        )
        nr = (
            nr.join(prop.select("c").withColumn("bump", F.lit(1)), "c", "left")
            .select("c", (F.col("nr") + F.coalesce(F.col("bump"), F.lit(0))).alias("nr"))
            .localCheckpoint(eager=True)
        )
    return held.select(
        F.col("s").alias("s_suppkey"),
        F.col("c").alias("c_custkey"),
        F.round("dist", 0).cast("long").alias("dist_m0"),
    )



@register(
    "winnow_match_sources",
    f"""
WITH toks AS (
  SELECT doc_id, source,
         unnest(list_transform(generate_series(1, len(arr)), i -> {{'pos': i, 'g': arr[i]}})) AS u
  FROM (SELECT doc_id, source, {D.shingles_all_sql('text', _WIN_K)} AS arr FROM documents)
), c AS (
  SELECT doc_id, source, u.pos AS pos,
         (({D.MD5_LONG_SQL.format(x='u.g')}) % {_WIN_H}) * {_WIN_P}
           + ({_WIN_P - 1} - u.pos) AS cval
  FROM toks
), w AS (
  SELECT doc_id, source, pos,
         min(cval) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN {_WIN_W - 1} PRECEDING AND CURRENT ROW) AS m
  FROM c
), fps AS MATERIALIZED (
  SELECT DISTINCT source, m // {_WIN_P} AS h
  FROM w WHERE pos >= {_WIN_W}
), sz AS (SELECT source, cast(count(*) as bigint) AS n_fp FROM fps GROUP BY source),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, cast(count(*) as bigint) AS n_shared
  FROM fps a JOIN fps b ON b.h = a.h AND b.source > a.source
  GROUP BY a.source, b.source
)
SELECT i.src_a, i.src_b, i.n_shared, sa.n_fp AS n_fp_a, sb.n_fp AS n_fp_b,
       cast(i.n_shared * 1000000 // least(sa.n_fp, sb.n_fp) as bigint) AS overlap_q
FROM inter i JOIN sz sa ON sa.source = i.src_a JOIN sz sb ON sb.source = i.src_b
""",
)
def winnow_match_sources(spark, sf_dir):
    """Cross-source winnowing-fingerprint overlap matrix — the MOSS
    match step on top of winnowing_docs' selection (that query stores
    per-doc fingerprints; THIS one joins them across sources to answer
    'which corpora share long verbatim spans', the contamination /
    syndication matrix a training-data curator checks before mixing):
    the selected hash is recovered from the winnow key by one floor
    division (the position tie-break strips off), distinct per-source
    fingerprint sets meet in ONE equi-join on the hash (shuffle ∝
    posting lists, never |S|²·docs), and the overlap coefficient
    |A∩B| / min(|A|,|B|) is exact 1e6 ticks over the bounded
    source-pair matrix."""
    d = load(spark, sf_dir, "documents")
    g = d.select(
        "doc_id",
        "source",
        F.posexplode(D.shingles_all(F.col("text"), _WIN_K)).alias("pos0", "gr"),
    )
    c = g.select(
        "doc_id",
        "source",
        (F.col("pos0") + 1).alias("pos"),
        (
            (D.md5_long(F.col("gr")) % F.lit(_WIN_H)) * F.lit(_WIN_P)
            + (F.lit(_WIN_P - 1) - (F.col("pos0") + 1))
        ).alias("cval"),
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-(_WIN_W - 1), 0)
    fps = (
        c.withColumn("m", F.min("cval").over(win))
        .filter(F.col("pos") >= _WIN_W)
        .select("source", F.expr(f"m div {_WIN_P}").alias("h"))
        .distinct()
    )
    sz = fps.groupBy("source").agg(F.count("*").cast("long").alias("n_fp"))
    a = fps.select(F.col("source").alias("src_a"), "h")
    b = fps.select(F.col("source").alias("src_b"), "h")
    inter = (
        a.join(b, "h")
        .filter(F.col("src_b") > F.col("src_a"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    return (
        inter.join(sz.select(F.col("source").alias("src_a"), F.col("n_fp").alias("n_fp_a")), "src_a")
        .join(sz.select(F.col("source").alias("src_b"), F.col("n_fp").alias("n_fp_b")), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            "n_fp_a",
            "n_fp_b",
            F.expr("(n_shared * 1000000) div least(n_fp_a, n_fp_b)")
            .cast("long")
            .alias("overlap_q"),
        )
    )



@register(
    "markov_attribution_channels",
    "WITH "
    + _markov_trans_sql()
    + ",\n"
    + _markov_run_sql("base", None)
    + ",\n"
    + ",\n".join(_markov_run_sql(ch, ch) for ch in _MK_CHANNELS)
    + f""",
eff AS (
{" UNION ALL ".join(
    f"SELECT '{ch}' AS channel, (SELECT p FROM p_base) AS p_base_q,"
    f" (SELECT p FROM p_{ch}) AS p_wo_q" for ch in _MK_CHANNELS
)}
)
SELECT channel, cast(p_base_q as bigint) AS p_base_q,
       cast(p_wo_q as bigint) AS p_wo_q,
       cast(p_base_q - p_wo_q as bigint) AS removal_q,
       cast(CASE WHEN sum(p_base_q - p_wo_q) OVER () = 0 THEN 0
                 ELSE ((p_base_q - p_wo_q) * 1000000)
                      // sum(p_base_q - p_wo_q) OVER () END as bigint) AS share_q
FROM eff ORDER BY channel
""",
)
def markov_attribution_channels(spark, sf_dir):
    """Markov-chain removal-effect attribution (Anderl et al.) — the
    data-driven alternative to multitouch_attribution_users' heuristic
    splits: build the first-order journey chain (START -> channels ->
    CONV on first purchase / DROP at path end), then credit each
    channel by how much total conversion mass DISAPPEARS when that
    channel's node is deleted (journeys entering it are lost, not
    rerouted — the standard removal convention). Absorption runs as a
    {_MK_STEPS}-step truncated propagation in 1e-12 ticks with the
    per-term floor (m*cnt)//total, so every number is an exact integer
    both engines reproduce; removal mass is provably <= base mass, so
    shares are non-negative. Scale shape: ONE big-table window+agg
    builds the transition counts — the only data-scale work; the
    matrix itself is bounded by SCHEMA, not data ((channels+2)² <= 36
    rows), so the five propagation runs execute as exact Python-bigint
    arithmetic on the driver after a bounded collect (the kNN-loop /
    compact-promotion bounded-driver-action pattern). The earlier form
    unrolled 5 runs × {_MK_STEPS} steps of tiny join+agg stages whose
    fixed scheduling cost dominated the query 100:1 (VERDICT r4
    next-round #2)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seqd = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("seq")
    )
    ps = seqd.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "purchase", F.col("seq"))).alias("pseq"),
        F.max("seq").alias("mseq"),
    )
    kept = (
        seqd.join(ps, "user_id")
        .filter(F.col("seq") <= F.coalesce(F.col("pseq"), F.col("mseq")))
        .withColumn(
            "nxt",
            F.lead("event_type").over(Window.partitionBy("user_id").orderBy("seq")),
        )
    )
    steps = (
        kept.filter(F.col("seq") == 1)
        .select(
            F.lit("START").alias("s"),
            F.when(F.col("event_type") == "purchase", "CONV")
            .otherwise(F.col("event_type"))
            .alias("t"),
        )
        .unionAll(
            kept.filter(F.col("nxt").isNotNull()).select(
                F.col("event_type").alias("s"),
                F.when(F.col("nxt") == "purchase", "CONV")
                .otherwise(F.col("nxt"))
                .alias("t"),
            )
        )
        .unionAll(
            kept.filter(F.col("nxt").isNull() & F.col("pseq").isNull()).select(
                F.col("event_type").alias("s"), F.lit("DROP").alias("t")
            )
        )
    )
    trans = steps.groupBy("s", "t").agg(F.count("*").cast("long").alias("cnt"))
    # Bounded collect: the matrix has at most (|channels|+2)² rows by
    # schema — the per-state totals and the propagation are exact
    # Python-bigint arithmetic, identical to the oracle's HUGEINT
    # floor-div chain.
    matrix = [(r["s"], r["t"], int(r["cnt"])) for r in trans.collect()]
    totals: dict[str, int] = {}
    for s, _, c in matrix:
        totals[s] = totals.get(s, 0) + c

    def run(removed: str | None) -> int:
        tr = [
            (s, t, c)
            for s, t, c in matrix
            if removed is None or (s != removed and t != removed)
        ]
        m = {"START": _MK_TICK}
        absorbed = 0
        for _ in range(_MK_STEPS):
            contrib: dict[str, int] = {}
            for s, t, c in tr:
                if s in m:
                    contrib[t] = contrib.get(t, 0) + (m[s] * c) // totals[s]
            absorbed += contrib.get("CONV", 0)
            m = {t: v for t, v in contrib.items() if t not in ("CONV", "DROP")}
        return absorbed

    p_base = run(None)
    removals = {ch: p_base - run(ch) for ch in _MK_CHANNELS}
    tot_removal = sum(removals.values())
    out = [
        (
            ch,
            p_base,
            p_base - removals[ch],
            removals[ch],
            0 if tot_removal == 0 else (removals[ch] * 1_000_000) // tot_removal,
        )
        for ch in sorted(_MK_CHANNELS)
    ]
    return spark.createDataFrame(
        out, "channel string, p_base_q long, p_wo_q long, removal_q long, share_q long"
    ).orderBy("channel")



@register(
    "markov_order_chi2",
    """
WITH seq AS (
  SELECT user_id, event_type AS e,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
         lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
  FROM events
), tri AS (
  SELECT e AS a, e2 AS b, e3 AS c, cast(count(*) as bigint) AS n_abc
  FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
  GROUP BY e, e2, e3
), bi AS (
  SELECT b, c, cast(sum(n_abc) as bigint) AS n_bc FROM tri GROUP BY b, c
), ab AS (
  SELECT a, b, cast(sum(n_abc) as bigint) AS n_ab FROM tri GROUP BY a, b
), bmarg AS (
  SELECT b, cast(sum(n_abc) as bigint) AS n_b FROM tri GROUP BY b
), contrib AS (
  SELECT t.a, t.b, t.c, t.n_abc, ab.n_ab, bi.n_bc, bm.n_b,
         cast(t.n_abc * bm.n_b - ab.n_ab * bi.n_bc as bigint) AS dev_num
  FROM tri t JOIN ab ON t.a = ab.a AND t.b = ab.b
  JOIN bi ON t.b = bi.b AND t.c = bi.c
  JOIN bmarg bm ON t.b = bm.b
)
SELECT a, b, c, n_abc,
       cast(n_ab * n_bc as bigint) AS exp_num, n_b AS exp_den,
       cast(CASE WHEN dev_num >= 0 THEN dev_num * dev_num // (n_ab * n_bc * n_b)
                 ELSE dev_num * dev_num // (n_ab * n_bc * n_b) END as bigint) AS chi2_contrib_scaled
FROM contrib ORDER BY a, b, c
""",
)
def markov_order_chi2(spark, sf_dir):
    """Markov order test components: does the next event depend on TWO
    steps of history, or is the first-order chain of
    event_transition_matrix sufficient? Under first-order, E[n_abc] =
    n_ab·n_bc/n_b — all integer marginals of the trigram table — so
    the χ² deviation (n_abc − E)²/E cross-multiplies to the exact
    integer (n_abc·n_b − n_ab·n_bc)² // (n_ab·n_bc·n_b) per (a,b,c)
    cell (the squared numerator makes the sign-safe guard vacuous but
    explicit). One window pass builds overlapping trigrams; the
    25-row trigram dim carries all marginals. Scale shape: one
    user-partitioned double-lead window (shuffle ∝ events once), then
    dim-scale hash joins on the 5³-bounded state space."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("a"),
        F.lead("event_type").over(w).alias("b"),
        F.lead("event_type", 2).over(w).alias("c"),
    ).filter(F.col("b").isNotNull() & F.col("c").isNotNull())
    tri = seq.groupBy("a", "b", "c").agg(F.count("*").cast("long").alias("n_abc"))
    bi = tri.groupBy("b", "c").agg(F.sum("n_abc").cast("long").alias("n_bc"))
    ab = tri.groupBy("a", "b").agg(F.sum("n_abc").cast("long").alias("n_ab"))
    bm = tri.groupBy("b").agg(F.sum("n_abc").cast("long").alias("n_b"))
    contrib = (
        tri.join(F.broadcast(ab), ["a", "b"])
        .join(F.broadcast(bi), ["b", "c"])
        .join(F.broadcast(bm), "b")
        .withColumn(
            "dev_num",
            (F.col("n_abc") * F.col("n_b") - F.col("n_ab") * F.col("n_bc")).cast("long"),
        )
    )
    return contrib.select(
        "a",
        "b",
        "c",
        "n_abc",
        (F.col("n_ab") * F.col("n_bc")).cast("long").alias("exp_num"),
        F.col("n_b").alias("exp_den"),
        F.expr(
            "cast(dev_num * dev_num div (n_ab * n_bc * n_b) as bigint)"
        ).alias("chi2_contrib_scaled"),
    ).orderBy("a", "b", "c")



@register(
    "shapley_attribution_channels",
    f"""
WITH fp AS (
  SELECT user_id, min(ts) AS pts FROM events WHERE event_type = 'purchase'
  GROUP BY user_id
), mk AS (
  SELECT fp.user_id,
         cast(coalesce(max(CASE WHEN e.event_type = 'view' THEN 1 ELSE 0 END), 0)
            + 2 * coalesce(max(CASE WHEN e.event_type = 'click' THEN 1 ELSE 0 END), 0)
            + 4 * coalesce(max(CASE WHEN e.event_type = 'signup' THEN 1 ELSE 0 END), 0)
            as int) AS m
  FROM fp LEFT JOIN events e ON e.user_id = fp.user_id AND e.ts < fp.pts
  GROUP BY fp.user_id
), nm AS (SELECT m, cast(count(*) as bigint) AS c FROM mk GROUP BY m),
masks(S) AS (VALUES (0),(1),(2),(3),(4),(5),(6),(7)),
v AS (
  SELECT masks.S,
         cast(coalesce(sum(CASE WHEN (nm.m & masks.S) = nm.m THEN nm.c END), 0) as bigint) AS v
  FROM masks LEFT JOIN nm ON true GROUP BY masks.S
), terms(i, S, w) AS (VALUES {', '.join(f'({i}, {s}, {w})' for i, s, w in _SHAP_TERMS)})
SELECT CASE t.i WHEN 1 THEN 'view' WHEN 2 THEN 'click' ELSE 'signup' END AS channel,
       cast(sum(t.w * (vi.v - vs.v)) as bigint) AS phi6
FROM terms t JOIN v vs ON vs.S = t.S JOIN v vi ON vi.S = t.S + t.i
GROUP BY t.i ORDER BY channel
""",
)
def shapley_attribution_channels(spark, sf_dir):
    """Shapley-value channel attribution — the game-theoretic credit
    split the marketing stack treats as ground truth (markov
    _attribution gives removal effects, multitouch gives positional
    heuristics; Shapley is the axiomatic one): each converted user's
    pre-purchase channel SET {{view, click, signup}} is a coalition
    sample, v(S) = converted users whose set ⊆ S, and channel i's
    credit is the factorial-weighted mean marginal contribution — kept
    exact as phi6 = 6·φ (weights 2/1/1/2 are |S|!(2-|S|)! with the 3!
    denominator cleared, so the only operations are integer
    subtraction and sums; Σ phi6 = 6·(v(C) − v(∅)) is an auditable
    conservation law). Scale shape: one per-user mask agg collapses
    the corpus to ≤ 8 coalition counts; everything after is literal
    8-row dim algebra."""
    e = load(spark, sf_dir, "events")
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    mk = (
        fp.join(
            e.select(
                "user_id", F.col("ts").alias("ets"), F.col("event_type").alias("et")
            ),
            ["user_id"],
            "left",
        )
        .select(
            "user_id",
            F.when(F.col("ets") < F.col("pts"), F.col("et")).alias("et"),
        )
        .groupBy("user_id")
        .agg(
            (
                F.coalesce(F.max(F.when(F.col("et") == "view", 1).otherwise(0)), F.lit(0))
                + 2
                * F.coalesce(
                    F.max(F.when(F.col("et") == "click", 1).otherwise(0)), F.lit(0)
                )
                + 4
                * F.coalesce(
                    F.max(F.when(F.col("et") == "signup", 1).otherwise(0)), F.lit(0)
                )
            )
            .cast("int")
            .alias("m")
        )
    )
    nm = mk.groupBy("m").agg(F.count("*").cast("long").alias("c"))
    masks = spark.range(8).select(F.col("id").cast("int").alias("S"))
    v = (
        masks.join(nm, F.expr("(m & S) = m"), "left")
        .groupBy("S")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("v"))
    )
    terms = (
        spark.range(1)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("i"), F.lit(s).alias("S"), F.lit(w).alias("w")
                        )
                        for i, s, w in _SHAP_TERMS
                    ]
                )
            ).alias("t")
        )
        .select("t.*")
    )
    vs = v.select(F.col("S").alias("S0"), F.col("v").alias("v0"))
    vi = v.select(F.col("S").alias("S1"), F.col("v").alias("v1"))
    return (
        terms.join(vs, F.col("S") == F.col("S0"))
        .join(vi, F.col("S") + F.col("i") == F.col("S1"))
        .groupBy("i")
        .agg(F.sum(F.col("w") * (F.col("v1") - F.col("v0"))).cast("long").alias("phi6"))
        .select(
            F.when(F.col("i") == 1, "view")
            .when(F.col("i") == 2, "click")
            .otherwise("signup")
            .alias("channel"),
            "phi6",
        )
        .orderBy("channel")
    )



@register(
    "pseudonym_linkage_audit",
    f"""
WITH pts AS ({_PLA_PTS}),
qi AS (
  SELECT user_id, CASE WHEN sec * 2 < (SELECT min(sec) + max(sec) FROM pts) THEN 0 ELSE 1 END AS half,
         h // 6 AS hblock, zx, zy
  FROM pts
), prof AS (
  SELECT user_id, half,
         cast(any_value(tot) // 8 as bigint) AS act_band,
         max(CASE WHEN r = 1 THEN hb END) AS modal_hblock,
         max(CASE WHEN r = 1 THEN mzx END) AS modal_zx,
         max(CASE WHEN r = 1 THEN mzy END) AS modal_zy
  FROM (
    SELECT user_id, half, hb, mzx, mzy,
           row_number() OVER (PARTITION BY user_id, half ORDER BY c DESC, hb, mzx, mzy) AS r,
           cast(sum(c) OVER (PARTITION BY user_id, half) as bigint) AS tot
    FROM (SELECT user_id, half, hblock AS hb, zx AS mzx, zy AS mzy,
                 cast(count(*) as bigint) AS c
          FROM qi GROUP BY user_id, half, hblock, zx, zy)
  ) GROUP BY user_id, half
), a AS (SELECT * FROM prof WHERE half = 0), b AS (SELECT * FROM prof WHERE half = 1),
links AS (
  SELECT a.user_id AS uid_a, b.user_id AS uid_b
  FROM a JOIN b ON a.act_band = b.act_band AND a.modal_hblock = b.modal_hblock
             AND a.modal_zx = b.modal_zx AND a.modal_zy = b.modal_zy
), cand AS (
  SELECT uid_a, cast(count(*) as bigint) AS n_matches,
         cast(max(CASE WHEN uid_a = uid_b THEN 1 ELSE 0 END) as bigint) AS self_in
  FROM links GROUP BY uid_a
)
SELECT cast((SELECT count(*) FROM a) as bigint) AS n_first_half_users,
       cast(count(*) as bigint) AS n_linked,
       cast(count(CASE WHEN n_matches = 1 AND self_in = 1 THEN 1 END) as bigint)
         AS n_unique_correct,
       cast((count(CASE WHEN n_matches = 1 AND self_in = 1 THEN 1 END) * 1000000)
            // (SELECT greatest(count(*), 1) FROM a) as bigint) AS reid_q
FROM cand
""",
)
def pseudonym_linkage_audit(spark, sf_dir):
    """Behavioral re-identification audit — the attack k-anonymity
    ladders don't model: rotate every pseudonym at the observation
    midpoint and ask how many first-half users an adversary re-links
    to their second-half selves using ONLY behavior (activity band,
    modal 6-hour block, modal 30° macro-zone). n_unique_correct
    counts users whose behavioral fingerprint matches EXACTLY ONE
    second-half profile and it is genuinely them — the true
    re-identification rate that says whether pseudonym rotation
    actually protects anyone once timing+location habits are public
    (the Golle/de Montjoye result as a registry op). Deterministic
    argmax profiles, exact set joins; one profile agg per half + one
    QI equi-join."""
    e = load(spark, sf_dir, "events")
    pts = e.select(
        "user_id",
        F.unix_timestamp("ts").alias("sec"),
        (F.hour("ts").cast("int") / 6).cast("int").alias("hblock"),
        F.floor((C.derived_lon(F.col("event_id")) + 180.0) / 30.0)
        .cast("long")
        .alias("zx"),
        F.floor((90.0 - C.derived_lat(F.col("event_id"))) / 30.0)
        .cast("long")
        .alias("zy"),
    )
    sp = pts.agg((F.min("sec") + F.max("sec")).alias("ssum"))
    qi = pts.crossJoin(F.broadcast(sp)).select(
        "user_id",
        F.when(F.col("sec") * 2 < F.col("ssum"), 0).otherwise(1).alias("half"),
        "hblock",
        "zx",
        "zy",
    )
    cell = qi.groupBy("user_id", "half", "hblock", "zx", "zy").agg(
        F.count("*").cast("long").alias("c")
    )
    w = Window.partitionBy("user_id", "half").orderBy(
        F.col("c").desc(), F.col("hblock"), F.col("zx"), F.col("zy")
    )
    wt = Window.partitionBy("user_id", "half")
    prof = (
        cell.withColumn("r", F.row_number().over(w))
        .withColumn("tot", F.sum("c").over(wt).cast("long"))
        .groupBy("user_id", "half")
        .agg(
            F.expr("any_value(tot) div 8").cast("long").alias("act_band"),
            F.max(F.when(F.col("r") == 1, F.col("hblock"))).alias("modal_hblock"),
            F.max(F.when(F.col("r") == 1, F.col("zx"))).alias("modal_zx"),
            F.max(F.when(F.col("r") == 1, F.col("zy"))).alias("modal_zy"),
        )
    )
    a = prof.filter(F.col("half") == 0).select(
        F.col("user_id").alias("uid_a"),
        "act_band",
        "modal_hblock",
        "modal_zx",
        "modal_zy",
    ).localCheckpoint()
    b = prof.filter(F.col("half") == 1).select(
        F.col("user_id").alias("uid_b"),
        F.col("act_band").alias("ab"),
        F.col("modal_hblock").alias("hb"),
        F.col("modal_zx").alias("bx"),
        F.col("modal_zy").alias("by_"),
    )
    links = a.join(
        b,
        (F.col("act_band") == F.col("ab"))
        & (F.col("modal_hblock") == F.col("hb"))
        & (F.col("modal_zx") == F.col("bx"))
        & (F.col("modal_zy") == F.col("by_")),
    )
    cand = links.groupBy("uid_a").agg(
        F.count("*").cast("long").alias("n_matches"),
        F.max(F.when(F.col("uid_a") == F.col("uid_b"), 1).otherwise(0))
        .cast("long")
        .alias("self_in"),
    )
    na = a.agg(F.count("*").cast("long").alias("n_first_half_users"))
    return (
        cand.agg(
            F.count("*").cast("long").alias("n_linked"),
            F.count(F.when((F.col("n_matches") == 1) & (F.col("self_in") == 1), 1))
            .cast("long")
            .alias("n_unique_correct"),
        )
        .crossJoin(F.broadcast(na))
        .select(
            "n_first_half_users",
            "n_linked",
            "n_unique_correct",
            F.expr(
                "cast((n_unique_correct * 1000000)"
                " div greatest(n_first_half_users, 1L) as bigint)"
            ).alias("reid_q"),
        )
    )

