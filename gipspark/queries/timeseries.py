"""Registry family: timeseries (split from the single-file registry; query names and behavior unchanged)."""

from __future__ import annotations

from gipspark.queries._base import (  # noqa: F401
    D,
    DEC,
    F,
    T,
    Window,
    load,
    register,
)
from gipspark.queries._shared import (  # noqa: F401
    _BD_ANCHOR,
    _BURST_FLAT,
    _BURST_SWITCH,
    _CUSUM_H,
    _EWMA_W,
    _F445_EPOCH,
    _GALL_SEATS,
    _HAMPEL_K,
    _KF_GAIN,
    _KM_HORIZONS,
    _NA_SCALE,
    _PACF_LAGS,
    _RANSAC_K,
    _RANSAC_TOL,
    _RS_WINDOWS,
    _SPRT_F,
    _SPRT_S,
    _VAR_PCT,
    _acf_pacf_oracle_sql,
    _dl_levels,
    _merge_intervals_sql,
)



@register(
    "window_lag_events",
    """
SELECT event_id, user_id,
       epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap_us
FROM events WHERE user_id < 20
""",
)
def window_lag_events(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # parquet naive ts loads as TIMESTAMP_NTZ; session tz is UTC so the
    # cast makes unix_micros == DuckDB's epoch_us exactly
    us = F.unix_micros(F.col("ts").cast("timestamp")).cast("long")
    return ev.select(
        "event_id", "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    )



@register(
    "rollup_order_calendar",
    """
SELECT coalesce(yr0, '(all)') AS yr, coalesce(prio0, '(all)') AS prio,
       count(*) AS n, cast(sum(cast(price as decimal(18,2))) as double) AS price_sum
FROM (SELECT strftime(cast(o_orderdate as date), '%Y') AS yr0,
             o_orderpriority AS prio0, o_totalprice AS price FROM orders)
GROUP BY ROLLUP (yr0, prio0)
""",
)
def rollup_order_calendar(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.withColumn("yr", F.date_format(F.col("o_orderdate"), "yyyy"))
        .withColumn("prio", F.col("o_orderpriority"))
        .rollup("yr", "prio")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("price_sum"),
        )
        .select(
            F.coalesce(F.col("yr"), F.lit("(all)")).alias("yr"),
            F.coalesce(F.col("prio"), F.lit("(all)")).alias("prio"),
            "n",
            "price_sum",
        )
    )



@register(
    "distinct_users_daily",
    """
SELECT cast(ts as date) AS day, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY day
""",
)
def distinct_users_daily(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count_distinct("user_id").alias("n_users"), F.count("*").alias("n_events")
    )



@register(
    "gapfill_daily_events",
    """
WITH ev AS (SELECT CAST(ts AS DATE) AS day, event_type FROM events),
b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
cal AS (SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM b),
ty AS (SELECT DISTINCT event_type FROM ev),
pd AS (SELECT day, event_type, count(*) AS n FROM ev GROUP BY day, event_type)
SELECT c.day, t.event_type, coalesce(pd.n, 0) AS n
FROM cal c CROSS JOIN ty t
LEFT JOIN pd ON pd.day = c.day AND pd.event_type = t.event_type
""",
)
def gapfill_daily_events(spark, sf_dir):
    """Dense calendar gap-fill: every (day, event_type) slot in the data
    span, zero-filled where no events landed — GIPS's inventory
    semantics need explicit no-coverage rows, not absent ones.
    sequence()+explode builds the calendar from the data's own bounds
    (one tiny agg), the type dim is broadcast, and only the per-day agg
    touches the fact table."""
    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type"
    )
    per_day = ev.groupBy("day", "event_type").agg(F.count(F.lit(1)).alias("n"))
    cal = ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1")).select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day")
    )
    types = ev.select("event_type").distinct()
    return (
        cal.crossJoin(F.broadcast(types))
        .join(per_day, ["day", "event_type"], "left")
        .select("day", "event_type", F.coalesce(F.col("n"), F.lit(0)).alias("n"))
    )



@register(
    "funnel_view_click_purchase",
    """
WITH w1 AS (
  SELECT user_id, ts, event_type,
         min(CASE WHEN event_type = 'view' THEN ts END) OVER (PARTITION BY user_id) AS v
  FROM events
), w2 AS (
  SELECT user_id, ts, event_type, v,
         min(CASE WHEN event_type = 'click' AND ts >= v THEN ts END) OVER (PARTITION BY user_id) AS c
  FROM w1
), w3 AS (
  SELECT user_id, v, c,
         min(CASE WHEN event_type = 'purchase' AND ts >= c THEN ts END) OVER (PARTITION BY user_id) AS p
  FROM w2
), per_user AS (
  SELECT user_id, min(v) AS v, min(c) AS c, min(p) AS p FROM w3 GROUP BY user_id
)
SELECT count(*) AS n_users,
       count(v) AS n_viewed, count(c) AS n_clicked, count(p) AS n_purchased,
       cast(coalesce(sum(epoch_us(c) - epoch_us(v)), 0) as bigint) AS click_lag_us,
       cast(coalesce(sum(epoch_us(p) - epoch_us(c)), 0) as bigint) AS purchase_lag_us
FROM per_user
""",
)
def funnel_view_click_purchase(spark, sf_dir):
    """Ordered conversion funnel (view → first click after the view →
    first purchase after that click), the standard web-analytics op.

    Three window passes over the SAME user_id partitioning — Catalyst
    plans one exchange + one sort for all of them, then a partial/final
    aggregate; no self-joins, no driver state. Lags are exact integer
    micros (epoch_us == unix_micros convention)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    v = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    ev1 = ev.select("user_id", "ts", "event_type", v.alias("v"))
    c = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts") >= F.col("v")), F.col("ts"))
    ).over(w)
    ev2 = ev1.select("user_id", "ts", "event_type", "v", c.alias("c"))
    p = F.min(
        F.when((F.col("event_type") == "purchase") & (F.col("ts") >= F.col("c")), F.col("ts"))
    ).over(w)
    per_user = (
        ev2.select("user_id", "v", "c", p.alias("p"))
        .groupBy("user_id")
        .agg(F.min("v").alias("v"), F.min("c").alias("c"), F.min("p").alias("p"))
    )

    def us(col):
        return F.unix_micros(col.cast("timestamp")).cast("long")

    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("v").alias("n_viewed"),
        F.count("c").alias("n_clicked"),
        F.count("p").alias("n_purchased"),
        F.coalesce(F.sum(us(F.col("c")) - us(F.col("v"))), F.lit(0)).cast("long").alias("click_lag_us"),
        F.coalesce(F.sum(us(F.col("p")) - us(F.col("c"))), F.lit(0)).cast("long").alias("purchase_lag_us"),
    )



@register(
    "concurrent_sessions_daily",
    """
WITH iv AS (
  SELECT cast(ts as date) AS day, ts AS start_ts,
         ts + INTERVAL 15 MINUTE AS end_ts
  FROM events
), marks AS (
  SELECT day, start_ts AS t, 1 AS delta FROM iv
  UNION ALL
  SELECT day, end_ts AS t, -1 AS delta FROM iv
), sweep AS (
  SELECT day,
         sum(delta) OVER (PARTITION BY day ORDER BY t, delta
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
  FROM marks
)
SELECT day, cast(max(conc) as bigint) AS max_concurrent
FROM sweep GROUP BY day
""",
)
def concurrent_sessions_daily(spark, sf_dir):
    """Peak concurrency per day via the sweep-line trick: each event
    opens a 15-minute presence interval; +1/-1 marks, running sum
    ordered by (t, delta) — delta first so an interval ending exactly
    when another starts never counts as overlap, and duplicate marks
    are interchangeable, keeping the running max deterministic.
    Partitioned by day (the interval's start day), so the sort is
    per-day, never global — the sweep scales with the widest single
    day, not the table."""
    ev = load(spark, sf_dir, "events")
    iv = ev.select(
        F.col("ts").cast("date").alias("day"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("end_ts"),
    )
    marks = iv.select("day", F.col("start_ts").alias("t"), F.lit(1).alias("delta")).unionAll(
        iv.select("day", F.col("end_ts").alias("t"), F.lit(-1).alias("delta"))
    )
    w = (
        Window.partitionBy("day")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sweep = marks.select("day", F.sum("delta").over(w).alias("conc"))
    return sweep.groupBy("day").agg(F.max("conc").cast("long").alias("max_concurrent"))



@register(
    "cohort_retention_weekly",
    """
WITH firstw AS (
  SELECT user_id, min(cast(date_trunc('week', ts) as date)) AS cohort
  FROM events GROUP BY user_id
), act AS (
  SELECT DISTINCT e.user_id, f.cohort,
         cast(datediff('day', f.cohort, cast(date_trunc('week', e.ts) as date)) // 7 as int)
           AS week_offset
  FROM events e JOIN firstw f ON e.user_id = f.user_id
)
SELECT cohort, week_offset, count(*) AS n_users
FROM act GROUP BY cohort, week_offset
""",
)
def cohort_retention_weekly(spark, sf_dir):
    """Weekly cohort retention (the standard web-analytics triangle):
    cohort = Monday of each user's first-seen week, then distinct
    active users per (cohort, week-offset). Both engines truncate weeks
    to Monday and offsets are exact integer day-diffs // 7 (both dates
    are Mondays, so the quotient is exact).

    Plan: first-week agg and the activity join BOTH hash-partition on
    user_id — Catalyst reuses the exchange, so the big table shuffles
    once; the distinct collapses to (user, cohort, offset) map-side
    before the final small aggregate."""
    ev = load(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts")).cast("date")
    firstw = ev.groupBy("user_id").agg(F.min(wk).alias("cohort"))
    act = (
        ev.select("user_id", wk.alias("wk"))
        .join(firstw, "user_id")
        .select(
            "user_id",
            "cohort",
            F.floor(F.datediff(F.col("wk"), F.col("cohort")) / 7).cast("int").alias("week_offset"),
        )
        .distinct()
    )
    return act.groupBy("cohort", "week_offset").agg(F.count(F.lit(1)).alias("n_users"))



@register("merge_intervals_sessions", _merge_intervals_sql())
def merge_intervals_sessions(spark, sf_dir):
    """Interval dissolve (operators/intervals.py): each fix opens a
    30-min presence interval; overlapping intervals per user merge into
    maximal spans — the time-axis analog of polygon dissolve, and the
    exact-arithmetic cousin of session_window_batch. One shuffle on
    user_id shared by both windows and both aggregates."""
    from gipspark.operators.intervals import dissolve_intervals

    ev = load(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.unix_timestamp(F.col("ts")).alias("start_s"),
        (F.unix_timestamp(F.col("ts")) + F.lit(1800)).alias("end_s"),
    )
    spans = dissolve_intervals(iv, "user_id")
    return spans.groupBy("user_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start")).cast("long").alias("covered_s"),
        F.max(F.col("span_end") - F.col("span_start")).cast("long").alias("max_span_s"),
    )



@register(
    "twa_value_user",
    """
WITH iv AS (
  SELECT user_id,
         cast(round(value * 100) as bigint) AS cents,
         cast(floor(epoch(ts)) as bigint) AS t,
         lead(cast(floor(epoch(ts)) as bigint)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS t_next
  FROM events
)
SELECT user_id,
       cast(sum(t_next - t) as bigint) AS span_s,
       cast(sum(cents * (t_next - t)) as bigint) AS weighted_cents_s,
       cast(sum(cents * (t_next - t)) as double)
         / cast(sum(t_next - t) as double) / 100.0 AS twa_value
FROM iv WHERE t_next IS NOT NULL
GROUP BY user_id
""",
)
def twa_value_user(spark, sf_dir):
    """Time-weighted average value per user (the telemetry/IoT
    aggregate: each reading holds until the next one): value·Δt sums in
    exact integer cents·seconds, so parallel summation order can't
    drift; the only double is the final ratio. One shuffle on user_id
    shared by the lead window and the aggregate."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_timestamp(F.col("ts"))
    iv = ev.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        t.alias("t"),
        F.lead(t).over(w).alias("t_next"),
    ).filter(F.col("t_next").isNotNull())
    dt = F.col("t_next") - F.col("t")
    return iv.groupBy("user_id").agg(
        F.sum(dt).cast("long").alias("span_s"),
        F.sum(F.col("cents") * dt).cast("long").alias("weighted_cents_s"),
        (
            F.sum(F.col("cents") * dt).cast("double")
            / F.sum(dt).cast("double")
            / F.lit(100.0)
        ).alias("twa_value"),
    )



@register(
    "lagged_xcorr_events",
    """
WITH s AS (
  SELECT cast(floor(epoch(ts)) as bigint) // 86400 AS day,
         cast(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) as bigint) AS x,
         cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) as bigint) AS y
  FROM events GROUP BY day
), lags(lag_days) AS (VALUES (0), (1), (2), (3), (4), (5), (6), (7)),
p AS (
  SELECT l.lag_days, a.x, b.y
  FROM lags l JOIN s a ON true JOIN s b ON b.day = a.day + l.lag_days
), agg AS (
  SELECT lag_days,
         cast(count(*) as bigint) AS n_days,
         cast(sum(x) as bigint) AS sx, cast(sum(y) as bigint) AS sy,
         cast(sum(cast(x as hugeint) * cast(y as hugeint)) as hugeint) AS sxy,
         cast(sum(cast(x as hugeint) * cast(x as hugeint)) as hugeint) AS sx2,
         cast(sum(cast(y as hugeint) * cast(y as hugeint)) as hugeint) AS sy2
  FROM p GROUP BY lag_days
)
SELECT lag_days, n_days, sx, sy,
       cast(cast(n_days as hugeint) * sxy - cast(sx as hugeint) * cast(sy as hugeint) as double) AS num,
       cast(cast(n_days as hugeint) * sxy - cast(sx as hugeint) * cast(sy as hugeint) as double)
         / sqrt(cast(cast(n_days as hugeint) * sx2 - cast(sx as hugeint) * cast(sx as hugeint) as double))
         / sqrt(cast(cast(n_days as hugeint) * sy2 - cast(sy as hugeint) * cast(sy as hugeint) as double)) AS pearson
FROM agg
""",
)
def lagged_xcorr_events(spark, sf_dir):
    """Lagged cross-correlation of the daily view series against the
    purchase series at lags 0..7 days — "do views predict purchases k
    days out?", the demand-forecasting diagnostic. The big table
    collapses to the daily series in ONE agg (map-side combinable);
    lag alignment is an 8-literal explode joined back to the tiny
    series (dim-scale, never touches the event table again). Pearson
    moments n·Σxy−ΣxΣy etc. are exact in DECIMAL(38,0)/HUGEINT (daily
    counts square past int64 at ~3·10⁹ events/day); the correlation is
    doubles over those exact integers in one fixed textual order."""
    ev = load(spark, sf_dir, "events")
    s = ev.groupBy(
        F.expr("cast(unix_timestamp(ts) div 86400 as bigint)").alias("day")
    ).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).cast("long").alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).cast("long").alias("y"),
    )
    lags = spark.range(8).select(F.col("id").cast("int").alias("lag_days"))
    a = s.select("day", "x")
    b = s.select(F.col("day").alias("bday"), "y")
    p = (
        F.broadcast(lags)
        .crossJoin(a)
        .join(b, F.col("bday") == F.col("day") + F.col("lag_days"))
    )
    dec = "decimal(38,0)"
    agg = p.groupBy("lag_days").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec)).cast(dec).alias("sxy"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).cast(dec).alias("sx2"),
        F.sum(F.col("y").cast(dec) * F.col("y").cast(dec)).cast(dec).alias("sy2"),
    )
    num = (
        F.col("n_days").cast(dec) * F.col("sxy")
        - F.col("sx").cast(dec) * F.col("sy").cast(dec)
    ).cast(dec)
    dx = (
        F.col("n_days").cast(dec) * F.col("sx2")
        - F.col("sx").cast(dec) * F.col("sx").cast(dec)
    ).cast(dec)
    dy = (
        F.col("n_days").cast(dec) * F.col("sy2")
        - F.col("sy").cast(dec) * F.col("sy").cast(dec)
    ).cast(dec)
    return agg.select(
        "lag_days",
        "n_days",
        "sx",
        "sy",
        num.cast("double").alias("num"),
        (
            num.cast("double")
            / F.sqrt(dx.cast("double"))
            / F.sqrt(dy.cast("double"))
        ).alias("pearson"),
    )



@register(
    "fano_burstiness_events",
    # Fano factor (variance-to-mean of daily counts) per event type:
    # fano = (n·Σx² − S²) / ((n−1)·S) — one exact rational, moments in
    # DECIMAL(38,0)/HUGEINT (the chisq overflow lesson), the factor the
    # only double. >1 bursty, ≈1 Poisson, <1 metronomic.
    """
WITH c AS (
  SELECT event_type, epoch_us(ts) // 1000000 // 86400 AS d,
         cast(count(*) as bigint) AS x
  FROM events GROUP BY event_type, d
), a AS (
  SELECT event_type,
         cast(count(*) as bigint) AS n_days,
         cast(sum(x) as bigint) AS total,
         cast(sum(cast(x as hugeint) * cast(x as hugeint)) as hugeint) AS sumsq
  FROM c GROUP BY event_type
)
SELECT event_type, n_days, total,
       cast(n_days * sumsq - cast(total as hugeint) * cast(total as hugeint) as double)
         / cast((n_days - 1) * cast(total as hugeint) as double) AS fano
FROM a WHERE n_days > 1
""",
)
def fano_burstiness_events(spark, sf_dir):
    """Fano factor (variance-to-mean ratio) of daily counts per event
    type — the burstiness dial at stream level: ≈1 is Poisson traffic,
    >1 is bursty (campaigns, incidents), <1 is metronomic (monitors,
    bots) — the source-level complement of bot_regularity_users. The
    variance-to-mean collapses to one exact rational
    (n·Σx² − S²)/((n−1)·S); moments ride in DECIMAL(38,0)/HUGEINT so a
    100 TB day-count never wraps; the factor is the only double.

    Scale shape: one (type, day) hash-agg over the big table, then
    type-cardinality arithmetic."""
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type", F.floor(F.unix_timestamp("ts") / F.lit(86400)).cast("long").alias("d")
    ).agg(F.count("*").cast("long").alias("x"))
    dec = "decimal(38,0)"
    a = c.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("total"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).cast(dec).alias("sumsq"),
    )
    return a.filter(F.col("n_days") > 1).select(
        "event_type",
        "n_days",
        "total",
        (
            (F.col("n_days").cast(dec) * F.col("sumsq") - F.col("total").cast(dec) * F.col("total").cast(dec)).cast("double")
            / ((F.col("n_days") - 1).cast(dec) * F.col("total").cast(dec)).cast("double")
        ).alias("fano"),
    )



@register(
    "nelson_aalen_users",
    f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) // 1000000 AS s FROM events
), mx AS (SELECT max(s) AS gmax FROM ev),
gaps AS (
  SELECT user_id, s,
         lead(s) OVER (PARTITION BY user_id ORDER BY s) AS nxt
  FROM ev
),
dur AS (
  SELECT user_id,
         CASE WHEN nxt IS NULL THEN ((SELECT gmax FROM mx) - s) // 3600
              ELSE (nxt - s) // 3600 END AS t_hours,
         CASE WHEN nxt IS NULL THEN 1 ELSE 0 END AS censored
  FROM gaps
),
byh AS (
  SELECT t_hours, cast(count(*) as bigint) AS n_all,
         cast(sum(1 - censored) as bigint) AS d
  FROM dur GROUP BY t_hours
),
risk AS (
  SELECT t_hours, d,
         sum(n_all) OVER (ORDER BY t_hours DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
  FROM byh
),
hz AS (
  SELECT t_hours, d, n_risk,
         (d * {_NA_SCALE}) // n_risk AS hazard_q
  FROM risk WHERE d > 0
)
SELECT t_hours, d, cast(n_risk as bigint) AS n_risk, cast(hazard_q as bigint) AS hazard_q,
       cast(sum(hazard_q) OVER (ORDER BY t_hours
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS cum_hazard_q
FROM hz
""",
)
def nelson_aalen_users(spark, sf_dir):
    """Nelson–Aalen cumulative-hazard estimator over inter-event gap
    durations (survival analysis — the return-time/churn primitive):
    each consecutive-event gap is a complete observation in hours; the
    open gap from a user's last event to the corpus end is
    right-censored (the user hasn't returned YET). Hazard increments
    d_t/n_risk(t) stay in 1e12 fixed point (exact integer division
    both engines) and the cumulative hazard is an integer cumsum —
    the log-free stand-in for the Kaplan–Meier product, which would
    need exp/ln. Risk sets come from ONE descending cumsum over the
    per-hour duration histogram (span-bounded dim table); the only
    event-scale work is the per-user lead() window."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.expr("unix_timestamp(ts)").alias("s")
    )
    gmax = ev.agg(F.max("s").alias("gmax"))
    w_u = Window.partitionBy("user_id").orderBy("s")
    gaps = ev.withColumn("nxt", F.lead("s").over(w_u))
    dur = gaps.crossJoin(F.broadcast(gmax)).select(
        F.when(F.col("nxt").isNull(), F.expr("(gmax - s) div 3600"))
        .otherwise(F.expr("(nxt - s) div 3600"))
        .alias("t_hours"),
        F.when(F.col("nxt").isNull(), 1).otherwise(0).alias("censored"),
    )
    byh = dur.groupBy("t_hours").agg(
        F.count("*").cast("long").alias("n_all"),
        F.sum(1 - F.col("censored")).cast("long").alias("d"),
    )
    w_desc = Window.orderBy(F.col("t_hours").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = byh.select(
        "t_hours", "d", F.sum("n_all").over(w_desc).alias("n_risk")
    ).filter(F.col("d") > 0)
    hz = risk.select(
        "t_hours",
        "d",
        F.col("n_risk").cast("long").alias("n_risk"),
        F.expr(f"(d * cast({_NA_SCALE} as bigint)) div n_risk").cast("long").alias("hazard_q"),
    )
    w_asc = Window.orderBy("t_hours").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return hz.withColumn("cum_hazard_q", F.sum("hazard_q").over(w_asc).cast("long"))



@register(
    "return_period_weekly",
    """
WITH o AS (
  SELECT epoch_us(o_orderdate) // 1000000 // 604800 AS wk,
         cast(round(o_totalprice * 100) as bigint) AS cents
  FROM orders
), wmax AS (
  SELECT wk, max(cents) AS max_cents, cast(count(*) as bigint) AS n_orders
  FROM o GROUP BY wk
), r AS (
  SELECT wk, max_cents, n_orders,
         cast(row_number() OVER (ORDER BY max_cents DESC, wk) as bigint) AS rk,
         cast(count(*) OVER () as bigint) AS n_weeks
  FROM wmax
)
SELECT wk, max_cents, n_orders, rk, n_weeks,
       cast(((n_weeks + 1) * 1000000) // rk as bigint) AS return_period_q
FROM r
""",
)
def return_period_weekly(spark, sf_dir):
    """Empirical return periods of weekly block maxima (the
    extreme-value-analysis primitive — 'how rare is a week like
    this?'): weekly max order value in exact cents, Weibull plotting
    position (n+1)/rank in 1e6 fixed point. The block-maxima agg is
    map-side combinable on the fact table; ranking runs on the
    week-dim (calendar-bounded, so the unpartitioned window is
    dim-scale by construction — the same contract as
    nelson_aalen/gapfill)."""
    o = load(spark, sf_dir, "orders").select(
        F.expr("unix_timestamp(o_orderdate) div 604800").alias("wk"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    wmax = o.groupBy("wk").agg(
        F.max("cents").alias("max_cents"), F.count("*").cast("long").alias("n_orders")
    )
    w_rank = Window.orderBy(F.col("max_cents").desc(), "wk")
    w_all = Window.partitionBy()
    r = wmax.select(
        "wk",
        "max_cents",
        "n_orders",
        F.row_number().over(w_rank).cast("long").alias("rk"),
        F.count("*").over(w_all).cast("long").alias("n_weeks"),
    )
    return r.withColumn(
        "return_period_q", F.expr("((n_weeks + 1) * 1000000) div rk").cast("long")
    )



@register(
    "ransac_trend_daily",
    f"""
WITH pts AS (
  SELECT epoch_us(ts) // 1000000 // 86400 AS d, cast(count(*) as bigint) AS y
  FROM events GROUP BY d
), idx AS (
  SELECT d, y, cast(row_number() OVER (ORDER BY d) as bigint) AS i,
         cast(count(*) OVER () as bigint) AS n
  FROM pts
), cand AS (
  SELECT k.k,
         1 + {D.MD5_LONG_SQL.format(x="concat('ra:', cast(k.k as varchar))")} % any_value(i.n) AS i1,
         1 + {D.MD5_LONG_SQL.format(x="concat('rb:', cast(k.k as varchar))")} % any_value(i.n) AS i2
  FROM (VALUES {', '.join(f'({k})' for k in range(_RANSAC_K))}) AS k(k), idx i
  GROUP BY k.k
), lines AS (
  SELECT c.k, p1.d AS x1, p1.y AS y1, p2.d - p1.d AS dx, p2.y - p1.y AS dy
  FROM cand c JOIN idx p1 ON p1.i = c.i1 JOIN idx p2 ON p2.i = c.i2
  WHERE c.i1 <> c.i2
), scored AS (
  SELECT l.k, l.x1, l.y1, l.dx, l.dy,
         cast(sum(CASE WHEN abs(l.dy * (p.d - l.x1) - l.dx * (p.y - l.y1))
                        <= {_RANSAC_TOL} * abs(l.dx) THEN 1 ELSE 0 END) as bigint) AS inliers
  FROM lines l CROSS JOIN idx p
  GROUP BY l.k, l.x1, l.y1, l.dx, l.dy
)
SELECT k, x1, y1, dx, dy, inliers,
       cast(row_number() OVER (ORDER BY inliers DESC, k) as int) AS rk
FROM scored
QUALIFY rk <= 3
""",
)
def ransac_trend_daily(spark, sf_dir):
    """Deterministic RANSAC line fit to the daily event-count series —
    the robust trend that OLS (ols_trend_cells) can't give when bot
    bursts contaminate the tail: 16 candidate lines through
    md5-chosen point pairs (RNG-free — the repeatability contract),
    inliers counted by the cross-multiplied vertical-distance test
    |dy·(x−x₁) − dx·(y−y₁)| ≤ τ·|dx| so no division or sqrt enters
    the count. Top-3 models by inlier count. The day table is
    calendar-bounded, so the candidate×points product is dim², never
    event-scale."""
    ev = load(spark, sf_dir, "events").select(
        F.expr("unix_timestamp(ts) div 86400").alias("d")
    )
    pts = ev.groupBy("d").agg(F.count("*").cast("long").alias("y"))
    w_i = Window.orderBy("d")
    w_all = Window.partitionBy()
    idx = pts.select(
        "d",
        "y",
        F.row_number().over(w_i).cast("long").alias("i"),
        F.count("*").over(w_all).cast("long").alias("n"),
    )
    ks = spark.createDataFrame([(k,) for k in range(_RANSAC_K)], "k int")
    nrow = idx.agg(F.first("n").alias("n"))
    cand = ks.crossJoin(F.broadcast(nrow)).select(
        "k",
        (
            1
            + D.md5_long(F.concat(F.lit("ra:"), F.col("k").cast("string"))) % F.col("n")
        ).alias("i1"),
        (
            1
            + D.md5_long(F.concat(F.lit("rb:"), F.col("k").cast("string"))) % F.col("n")
        ).alias("i2"),
    )
    p1 = idx.select(F.col("i").alias("i1"), F.col("d").alias("x1"), F.col("y").alias("y1"))
    p2 = idx.select(F.col("i").alias("i2"), F.col("d").alias("x2"), F.col("y").alias("y2"))
    lines = (
        cand.filter(F.col("i1") != F.col("i2"))
        .join(F.broadcast(p1), "i1")
        .join(F.broadcast(p2), "i2")
        .select(
            "k",
            "x1",
            "y1",
            (F.col("x2") - F.col("x1")).alias("dx"),
            (F.col("y2") - F.col("y1")).alias("dy"),
        )
    )
    scored = (
        lines.crossJoin(idx.select("d", "y"))
        .groupBy("k", "x1", "y1", "dx", "dy")
        .agg(
            F.sum(
                F.when(
                    F.abs(
                        F.col("dy") * (F.col("d") - F.col("x1"))
                        - F.col("dx") * (F.col("y") - F.col("y1"))
                    )
                    <= _RANSAC_TOL * F.abs(F.col("dx")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("inliers")
        )
    )
    w_rank = Window.orderBy(F.col("inliers").desc(), "k")
    return (
        scored.withColumn("rk", F.row_number().over(w_rank).cast("int"))
        .filter(F.col("rk") <= 3)
    )



@register(
    "cohort_ltv_weekly",
    """
WITH ev AS (
  SELECT user_id, epoch_us(ts) // 1000000 // 604800 AS wk,
         cast(round(value * 100) as bigint) AS cents
  FROM events
), first_wk AS (
  SELECT user_id, min(wk) AS cohort FROM ev GROUP BY user_id
), cell AS (
  SELECT f.cohort, ev.wk - f.cohort AS age,
         cast(sum(ev.cents) as bigint) AS rev,
         cast(count(DISTINCT ev.user_id) as bigint) AS active_users
  FROM ev JOIN first_wk f ON f.user_id = ev.user_id
  GROUP BY f.cohort, age
), sized AS (
  SELECT cohort, cast(count(*) as bigint) AS cohort_size FROM first_wk GROUP BY cohort
)
SELECT c.cohort, c.age, c.rev, c.active_users, s.cohort_size,
       cast(sum(c.rev) OVER (PARTITION BY c.cohort ORDER BY c.age
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS cum_rev,
       cast((sum(c.rev) OVER (PARTITION BY c.cohort ORDER BY c.age
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100) // s.cohort_size
            as bigint) AS ltv_cents_per_user_x100
FROM cell c JOIN sized s ON s.cohort = c.cohort
""",
)
def cohort_ltv_weekly(spark, sf_dir):
    """Cohort lifetime-value curve (the revenue companion to
    cohort_retention_weekly): users cohort by first-seen week, and
    each (cohort, age) cell carries revenue, actives, the cumulative
    revenue (a per-cohort running window), and cumulative LTV per
    cohort member in exact cents ×100 by integer division. One
    first-seen aggregate, one FK self-join, one (cohort, age) agg,
    one partitioned cumsum — the canonical cohort-matrix plan that
    shuffles on user_id exactly twice."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_timestamp(ts) div 604800").alias("wk"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    first_wk = ev.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    cell = (
        ev.join(first_wk, "user_id")
        .groupBy("cohort", (F.col("wk") - F.col("cohort")).alias("age"))
        .agg(
            F.sum("cents").cast("long").alias("rev"),
            F.countDistinct("user_id").cast("long").alias("active_users"),
        )
    )
    sized = first_wk.groupBy("cohort").agg(F.count("*").cast("long").alias("cohort_size"))
    w_cum = Window.partitionBy("cohort").orderBy("age").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        cell.join(sized, "cohort")
        .withColumn("cum_rev", F.sum("rev").over(w_cum).cast("long"))
        .withColumn(
            "ltv_cents_per_user_x100",
            F.expr("(cum_rev * 100) div cohort_size").cast("long"),
        )
        .select(
            "cohort", "age", "rev", "active_users", "cohort_size", "cum_rev",
            "ltv_cents_per_user_x100",
        )
    )



@register(
    "value_at_risk_daily",
    f"""
WITH daily AS (
  SELECT cast(o_orderdate as date) AS d,
         cast(sum(cast(round(cast(o_totalprice as {DEC}) * 100) as bigint)) as bigint)
           AS rev_cents
  FROM orders GROUP BY d
), ranked AS (
  SELECT rev_cents,
         cast(row_number() OVER (ORDER BY rev_cents, d) as bigint) AS rn,
         cast(count(*) OVER () as bigint) AS n
  FROM daily
), k AS (SELECT greatest(1, (any_value(n) * {_VAR_PCT}) // 100) AS k, any_value(n) AS n
         FROM ranked)
SELECT k.n AS n_days, cast(k.k as bigint) AS tail_k,
       (SELECT rev_cents FROM ranked, k WHERE rn = k.k) AS var_cents,
       (SELECT cast(sum(rev_cents) // any_value(k.k) as bigint)
        FROM ranked, k WHERE rn <= k.k) AS es_cents
FROM k
""",
)
def value_at_risk_daily(spark, sf_dir):
    """Empirical value-at-risk and expected shortfall of daily revenue
    — the risk-desk order statistics (VaR₉₅ = the 5th-percentile worst
    day; ES = the mean of days at or below it, the coherent tail
    measure Basel moved to BECAUSE VaR ignores tail shape): exact
    cents, the tail index k = max(1, ⌊n·5/100⌋) by floor convention,
    VaR as the k-th order statistic (rank window, ties broken by
    date) and ES as the exact floor mean of the k worst days — never
    an interpolated quantile. One day agg + one dim-scale ranking
    window + two 1-row anchors."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("rev_cents")
    )
    ranked = daily.select(
        "rev_cents",
        F.row_number().over(Window.orderBy("rev_cents", "d")).cast("long").alias("rn"),
    )
    n = daily.agg(F.count("*").cast("long").alias("n"))
    k = n.select(
        "n", F.greatest(F.lit(1).cast("long"), F.expr(f"(n * {_VAR_PCT}) div 100")).alias("k")
    )
    tail = (
        ranked.crossJoin(F.broadcast(k))
        .filter(F.col("rn") <= F.col("k"))
        .agg(
            F.max(F.when(F.col("rn") == F.col("k"), F.col("rev_cents")))
            .cast("long")
            .alias("var_cents"),
            F.expr("sum(rev_cents) div any_value(k)").cast("long").alias("es_cents"),
        )
    )
    return (
        k.crossJoin(F.broadcast(tail))
        .select(
            F.col("n").alias("n_days"),
            F.col("k").alias("tail_k"),
            "var_cents",
            "es_cents",
        )
    )



@register(
    "kaplan_meier_gaps",
    f"""
WITH RECURSIVE mx AS (SELECT max(epoch_us(ts)) AS mxus FROM events),
e2 AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events),
g1 AS (
  SELECT event_type AS g, us,
         lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nus
  FROM e2
), dur AS (
  SELECT g,
         (CASE WHEN nus IS NULL THEN mx.mxus - us ELSE nus - us END) // 60000000 AS m,
         CASE WHEN nus IS NULL THEN 0 ELSE 1 END AS death
  FROM g1, mx
), tbl AS (
  SELECT g, cast(m as bigint) AS m,
         cast(sum(death) as bigint) AS d,
         cast(count(*) - sum(death) as bigint) AS c
  FROM dur GROUP BY g, m
), s AS (
  SELECT g, m, d, c, row_number() OVER (PARTITION BY g ORDER BY m) AS k FROM tbl
), r AS (
  SELECT g0.g, 0 AS k, cast(1000000000000 as HUGEINT) AS surv,
         cast((SELECT sum(d + c) FROM tbl t WHERE t.g = g0.g) as HUGEINT) AS n
  FROM (SELECT DISTINCT g FROM tbl) g0
  UNION ALL
  SELECT s.g, s.k,
         CASE WHEN s.d > 0 THEN (r.surv * (r.n - s.d)) // r.n ELSE r.surv END,
         r.n - s.d - s.c
  FROM r JOIN s ON s.g = r.g AND s.k = r.k + 1
), hz AS (
  SELECT * FROM (VALUES {",".join(f"({h})" for h in _KM_HORIZONS)}) AS v(h)
), ks AS (
  SELECT g0.g, hz.h, coalesce(max(s.k), 0) AS kh
  FROM (SELECT DISTINCT g FROM tbl) g0 CROSS JOIN hz
  LEFT JOIN s ON s.g = g0.g AND s.m <= hz.h
  GROUP BY g0.g, hz.h
)
SELECT ks.g AS event_type, cast(ks.h as bigint) AS horizon_min,
       cast(r.surv as bigint) AS surv_q12, cast(r.n as bigint) AS at_risk
FROM ks JOIN r ON r.g = ks.g AND r.k = ks.kh
ORDER BY event_type, horizon_min
""",
)
def kaplan_meier_gaps(spark, sf_dir):
    """Kaplan-Meier product-limit survival of inter-event gaps per
    event type — "what fraction of gaps after a <type> event survive
    past h minutes", with each user's OPEN final gap entering as
    right-censored (it decrements the risk set without a death — the
    estimator Nelson-Aalen's cumulative hazard complements; KM is the
    product form, and censoring handled properly is the whole point).
    Gaps floor to whole minutes, so steps per type are bounded by the
    calendar window, never by row count. The sequential product
    S <- trunc(S*(n-d)/n) in 1e-12 ticks (deaths before same-minute
    censorings, the standard convention) runs as one applyInPandas per
    type (operators/recurrence.py); the oracle replays it WITH
    RECURSIVE and samples both curves at the same fixed horizon grid.
    Scale shape: one lead window on user_id + one (type,minute) hash
    agg; per-type state is calendar-bounded."""
    from gipspark.operators.recurrence import km_kernel

    ev = load(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("mxus"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    g1 = ev.select(
        F.col("event_type").alias("g"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "user_id",
        "event_id",
    ).select("g", "us", F.lead("us").over(w).alias("nus"))
    dur = g1.crossJoin(F.broadcast(mx)).select(
        "g",
        F.expr(
            "(CASE WHEN nus IS NULL THEN mxus - us ELSE nus - us END) div 60000000"
        ).alias("m"),
        F.when(F.col("nus").isNull(), 0).otherwise(1).alias("death"),
    )
    tbl = dur.groupBy("g", F.col("m").cast("long").alias("m")).agg(
        F.sum("death").cast("long").alias("d"),
        (F.count("*") - F.sum("death")).cast("long").alias("c"),
    )
    return (
        tbl.groupBy("g")
        .applyInPandas(
            km_kernel(_KM_HORIZONS),
            "event_type string, horizon_min long, surv_q12 long, at_risk long",
        )
        .orderBy("event_type", "horizon_min")
    )



@register(
    "seasonal_decompose_daily",
    f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // 1000000 // 86400 AS d,
         cast(sum(cast(round(cast(o_totalprice as {DEC}) * 100) as bigint)) as bigint)
           AS x
  FROM orders GROUP BY d
), tr AS (
  SELECT d, x,
         CASE WHEN count(*) OVER w = 7
              THEN sum(x) OVER w // 7 END AS trend_q
  FROM daily
  WINDOW w AS (ORDER BY d RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), det AS (
  SELECT d, x, trend_q, x - trend_q AS detr, d % 7 AS dow FROM tr
  WHERE trend_q IS NOT NULL
), seas AS (
  SELECT dow, cast(sum(detr) // count(*) as bigint) AS seasonal_q
  FROM det GROUP BY dow
)
SELECT det.d AS day, det.x AS x_cents, det.trend_q,
       seas.seasonal_q,
       cast(det.detr - seas.seasonal_q as bigint) AS remainder_q
FROM det JOIN seas USING (dow) ORDER BY day
""",
)
def seasonal_decompose_daily(spark, sf_dir):
    """Classical additive seasonal decomposition of daily revenue —
    trend (centered 7-day moving average, full windows only), weekly
    seasonal (per-day-of-week truncated mean of the detrended series),
    remainder — the decomposition every anomaly detector and forecast
    baseline starts from (dow_baseline_anomaly is the z-score consumer;
    this exposes the components themselves). All integer-exact: the MA
    is sum div 7 over a RANGE window keyed on the epoch-day number (so
    calendar gaps break the window honestly), dow = d % 7 is engine-
    independent (no locale weekday), and both divisions truncate
    identically. Scale shape: one day-level agg, one ranged window,
    one 7-row seasonal agg joined back."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.floor(F.unix_timestamp("o_orderdate") / F.lit(86400)).cast("long").alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    w = Window.orderBy("d").rangeBetween(-3, 3)
    tr = daily.select(
        "d",
        "x",
        F.sum("x").over(w).alias("s7"),
        F.count("*").over(w).alias("c7"),
    ).select(
        "d",
        "x",
        F.when(F.col("c7") == 7, F.expr("s7 div 7")).alias("trend_q"),
    )
    det = tr.filter(F.col("trend_q").isNotNull()).select(
        "d",
        "x",
        "trend_q",
        (F.col("x") - F.col("trend_q")).alias("detr"),
        (F.col("d") % 7).alias("dow"),
    )
    seas = det.groupBy("dow").agg(
        F.expr("sum(detr) div count(*)").cast("long").alias("seasonal_q")
    )
    return (
        det.join(seas, "dow")
        .select(
            F.col("d").alias("day"),
            F.col("x").alias("x_cents"),
            F.col("trend_q").cast("long").alias("trend_q"),
            "seasonal_q",
            (F.col("detr") - F.col("seasonal_q")).cast("long").alias("remainder_q"),
        )
        .orderBy("day")
    )



@register(
    "conformal_interval_contract",
    """
WITH m AS (
  SELECT doc_id, cast(n_chars as bigint) AS y,
         cast(len(regexp_split_to_array(lower(trim(text)), '\\s+')) as bigint) AS x
  FROM documents
), s AS (
  SELECT cast(count(*) as HUGEINT) AS n,
         cast(sum(x) as HUGEINT) AS sx, cast(sum(y) as HUGEINT) AS sy,
         cast(sum(cast(x as HUGEINT) * x) as HUGEINT) AS sxx,
         cast(sum(cast(x as HUGEINT) * y) as HUGEINT) AS sxy
  FROM m
), coef AS (
  SELECT n, n * sxx - sx * sx AS det,
         sy * sxx - sx * sxy AS a_num,
         n * sxy - sx * sy AS b_num
  FROM s
), res AS (
  SELECT m.doc_id,
         abs(cast(m.y as HUGEINT) * coef.det - coef.a_num - coef.b_num * m.x)
           AS r
  FROM m, coef
), rk AS (
  SELECT r, row_number() OVER (ORDER BY r, doc_id) AS rn FROM res
), k AS (
  SELECT cast(((n + 1) * 9 + 9) // 10 as bigint) AS k, cast(n as bigint) AS n,
         cast(det as double) AS det
  FROM coef
)
SELECT k.n, k.det, k.k,
       (SELECT cast(r as bigint) FROM rk, k WHERE rn = least(k.k, k.n)) AS q_scaled,
       (SELECT cast(count(*) * 1000000 // any_value(k.n) as bigint)
        FROM res, k
        WHERE res.r <= (SELECT r FROM rk, k WHERE rn = least(k.k, k.n)))
         AS coverage_q
FROM k
""",
)
def conformal_interval_contract(spark, sf_dir):
    """Split-conformal prediction interval contract at 90% — the
    distribution-free interval machine-learning deployments wrap
    around ANY point predictor: fit the exact 1-var OLS (token count
    -> length) in Cramer form, score every doc by its DET-SCALED
    absolute residual |y*det - a_num - b_num*x| (an exact integer —
    no division ever enters the residual), and take the k-th order
    statistic with k = ceil((n+1)*0.9) (clamped to n). The conformal
    guarantee (coverage >= 90% on exchangeable data) is then checked
    IN the query: coverage_q = floor-ticks of P(r <= q). Everything
    except det's final cast is exact integer arithmetic. Scale shape:
    one moment aggregate, one broadcast of the 1-row coefficients,
    one rank pick (TakeOrdered-style), one count."""
    dec = "decimal(38,0)"
    docs = load(spark, sf_dir, "documents")
    m = docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("y"),
        T.token_count(F.col("text")).cast("long").alias("x"),
    )
    s = m.agg(
        F.count("*").cast(dec).alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).cast(dec).alias("sxx"),
        F.sum(F.col("x").cast(dec) * F.col("y")).cast(dec).alias("sxy"),
    )
    coef = s.select(
        "n",
        F.expr("n * sxx - sx * sx").alias("det"),
        F.expr("sy * sxx - sx * sxy").alias("a_num"),
        F.expr("n * sxy - sx * sy").alias("b_num"),
    ).localCheckpoint()
    res = m.crossJoin(F.broadcast(coef)).select(
        "doc_id",
        F.abs(
            F.col("y").cast(dec) * F.col("det") - F.col("a_num") - F.col("b_num") * F.col("x")
        ).alias("r"),
    )
    rk = res.select(
        "r", F.row_number().over(Window.orderBy("r", "doc_id")).alias("rn")
    )
    kdf = coef.select(
        F.expr("cast(((n + 1) * 9 + 9) div 10 as bigint)").alias("k"),
        F.col("n").cast("long").alias("n"),
        F.col("det").cast("double").alias("det"),
    )
    q = (
        rk.crossJoin(F.broadcast(kdf))
        .filter(F.col("rn") == F.least(F.col("k"), F.col("n")))
        .select(F.col("r").alias("q_r"))
    )
    cov = (
        res.crossJoin(F.broadcast(q))
        .agg(F.count(F.when(F.col("r") <= F.col("q_r"), 1)).cast("long").alias("n_cov"))
    )
    return (
        kdf.crossJoin(F.broadcast(q))
        .crossJoin(F.broadcast(cov))
        .select(
            "n",
            "det",
            "k",
            F.col("q_r").cast("long").alias("q_scaled"),
            F.expr("(n_cov * 1000000) div n").cast("long").alias("coverage_q"),
        )
    )



@register("acf_pacf_daily", _acf_pacf_oracle_sql())
def acf_pacf_daily(spark, sf_dir):
    """ACF + PACF + Ljung-Box over the global daily-revenue series —
    the Box-Jenkins identification table (acf_cells gives per-cell
    covariance numerators; this adds the NORMALIZED correlogram, the
    partial autocorrelations via the Durbin-Levinson recursion, and
    the cumulative Ljung-Box portmanteau that says whether ANY of it
    is signal). Everything is integer-exact: autocovariances are
    n-scaled centered products (no mean division), r in 1e-6 ticks,
    and the DL recursion runs entirely in tick arithmetic with
    truncating division (the SAME generated expressions feed both
    engines — gipspark._dl_levels — so the recursion agrees bit for
    bit); LB accumulates per-term floors. Scale shape: one day agg,
    one 6-row lag-dim self equi-join on the day index, then 1-row
    arithmetic."""
    dec = "decimal(38,0)"
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.floor(F.unix_timestamp("o_orderdate") / F.lit(86400)).cast("long").alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    idx = daily.select(F.row_number().over(Window.orderBy("d")).alias("k"), "x")
    mom = idx.agg(
        F.count("*").cast("long").alias("n"), F.sum("x").cast(dec).alias("sx")
    )
    z = idx.crossJoin(F.broadcast(mom)).select(
        "k", (F.col("n").cast(dec) * F.col("x") - F.col("sx")).alias("z"), "n"
    )
    z = z.localCheckpoint()
    lagdim = spark.range(0, _PACF_LAGS + 1).select(F.col("id").cast("long").alias("j"))
    a = z.select("k", F.col("z").alias("za"))
    b = z.select(F.col("k").alias("kb"), F.col("z").alias("zb"))
    cov = (
        a.crossJoin(F.broadcast(lagdim))
        .join(b, F.col("kb") == F.col("k") + F.col("j"))
        .groupBy("j")
        .agg(F.sum(F.col("za") * F.col("zb")).cast(dec).alias("cnum"))
    )
    n1 = z.agg(F.any_value("n").alias("n"))
    wide = (
        cov.groupBy()
        .agg(
            *[
                F.max(F.when(F.col("j") == j, F.col("cnum"))).alias(f"c{j}")
                for j in range(0, _PACF_LAGS + 1)
            ]
        )
        .crossJoin(F.broadcast(n1))
    )
    ticks = wide.select(
        F.col("n").cast("long").alias("n"),
        *[F.col(f"c{j}").cast(dec).alias(f"c{j}") for j in range(0, _PACF_LAGS + 1)],
        *[
            F.expr(f"(c{j} * 1000000) div c0").cast("long").alias(f"r{j}q")
            for j in range(1, _PACF_LAGS + 1)
        ],
    )
    cur = ticks
    for lvl in _dl_levels("div"):
        cur = cur.selectExpr("*", f"{lvl[0][1]} as {lvl[0][0]}")
        if len(lvl) > 1:
            cur = cur.selectExpr(
                "*", *[f"{e} as {nm}" for nm, e in lvl[1:]]
            )
    cur = cur.localCheckpoint()
    out = None
    for j in range(1, _PACF_LAGS + 1):
        lb = " + ".join(
            f"(n * (n + 2) * r{i}q * r{i}q) div ((n - {i}) * 1000000)"
            for i in range(1, j + 1)
        )
        row = cur.select(
            F.lit(j).alias("lag"),
            F.col(f"c{j}").cast("double").alias("c_num"),
            F.col(f"r{j}q").cast("long").alias("r_q"),
            F.col(f"p_{j}_{j}").cast("long").alias("pacf_q"),
            F.expr(lb).cast("long").alias("lb_cum_q"),
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("lag")



@register(
    "drawdown_revenue_daily",
    f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // 1000000 // 86400 AS d,
         cast(sum(cast(round(cast(o_totalprice as {DEC}) * 100) as bigint)) as bigint)
           AS x
  FROM orders GROUP BY d
), cum AS (
  SELECT d, x,
         sum(x - (SELECT cast(sum(x) // count(*) as bigint) FROM daily))
           OVER (ORDER BY d) AS p
  FROM daily
), dd AS (
  SELECT d, x, p,
         max(p) OVER (ORDER BY d) - p AS drawdown,
         p - min(p) OVER (ORDER BY d) AS runup
  FROM cum
), pick AS (
  SELECT d, drawdown, runup,
         row_number() OVER (ORDER BY drawdown DESC, d) AS rd,
         row_number() OVER (ORDER BY runup DESC, d) AS ru
  FROM dd
)
SELECT cast((SELECT count(*) FROM daily) as bigint) AS n_days,
       (SELECT cast(drawdown as bigint) FROM pick WHERE rd = 1) AS max_drawdown,
       (SELECT cast(d as bigint) FROM pick WHERE rd = 1) AS drawdown_day,
       (SELECT cast(runup as bigint) FROM pick WHERE ru = 1) AS max_runup,
       (SELECT cast(d as bigint) FROM pick WHERE ru = 1) AS runup_day
""",
)
def drawdown_revenue_daily(spark, sf_dir):
    """Maximum drawdown / maximum run-up of the demeaned cumulative
    revenue curve — the Kadane-style extremes (max run-up IS the
    maximum-sum contiguous window of demeaned days; max drawdown the
    minimum one) that tell a forecaster the worst sustained slump and
    the strongest sustained rally the series ever produced, beyond any
    single day's anomaly (rate_anomaly) or change POINT (cusum). No
    quadratic window search: prefix sums + running max/min turn both
    extremes into two ordered windows — P_j - min_{i<=j} P_i and
    max_{i<=j} P_i - P_j. Demeaning uses the exact floor mean so all
    values stay integers. Ties resolve to the earliest day."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.floor(F.unix_timestamp("o_orderdate") / F.lit(86400)).cast("long").alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    daily = daily.localCheckpoint()
    mu = daily.agg(F.expr("sum(x) div count(*)").cast("long").alias("mu"))
    wo = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.crossJoin(F.broadcast(mu)).select(
        "d", F.sum(F.col("x") - F.col("mu")).over(wo).alias("p")
    )
    dd = cum.select(
        "d",
        (F.max("p").over(wo) - F.col("p")).alias("drawdown"),
        (F.col("p") - F.min("p").over(wo)).alias("runup"),
    )
    pick = dd.select(
        "d",
        "drawdown",
        "runup",
        F.row_number().over(Window.orderBy(F.col("drawdown").desc(), "d")).alias("rd"),
        F.row_number().over(Window.orderBy(F.col("runup").desc(), "d")).alias("ru"),
    ).localCheckpoint()
    n = daily.agg(F.count("*").cast("long").alias("n_days"))
    best_d = pick.filter(F.col("rd") == 1).select(
        F.col("drawdown").cast("long").alias("max_drawdown"),
        F.col("d").cast("long").alias("drawdown_day"),
    )
    best_u = pick.filter(F.col("ru") == 1).select(
        F.col("runup").cast("long").alias("max_runup"),
        F.col("d").cast("long").alias("runup_day"),
    )
    return (
        n.crossJoin(F.broadcast(best_d))
        .crossJoin(F.broadcast(best_u))
        .select("n_days", "max_drawdown", "drawdown_day", "max_runup", "runup_day")
    )



@register(
    "rescaled_range_daily",
    f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // 1000000 // 86400 AS d,
         cast(sum(cast(round(cast(o_totalprice as {DEC}) * 100) as bigint)) as bigint)
           AS x
  FROM orders GROUP BY d
), idx AS (
  SELECT row_number() OVER (ORDER BY d) - 1 AS k, x FROM daily
), win AS (
  SELECT w.w, idx.k // w.w AS bucket, idx.k, idx.x
  FROM idx, (SELECT unnest(ARRAY{_RS_WINDOWS}) AS w) w
), full_b AS (
  SELECT w, bucket FROM win GROUP BY w, bucket HAVING count(*) = w
), zb AS (
  SELECT win.w, win.bucket, win.k,
         cast(win.w as HUGEINT) * win.x
           - sum(cast(win.x as HUGEINT)) OVER (PARTITION BY win.w, win.bucket) AS z
  FROM win JOIN full_b USING (w, bucket)
), pb AS (
  SELECT w, bucket, k,
         sum(z) OVER (PARTITION BY w, bucket ORDER BY k) AS p, z
  FROM zb
), rs AS (
  SELECT w, bucket,
         max(p) - min(p) AS r_scaled,
         cast(sum(z * z) as HUGEINT) AS szz
  FROM pb GROUP BY w, bucket
), per AS (
  SELECT w, bucket,
         cast((cast(r_scaled as HUGEINT) * r_scaled * w * 1000000) // szz as bigint)
           AS rs2_q
  FROM rs WHERE szz > 0
)
SELECT cast(w as bigint) AS w, cast(count(*) as bigint) AS n_buckets,
       cast(sum(rs2_q) // count(*) as bigint) AS mean_rs2_q,
       cast(max(rs2_q) as bigint) AS max_rs2_q
FROM per GROUP BY w ORDER BY w
""",
)
def rescaled_range_daily(spark, sf_dir):
    """Rescaled-range (R/S) statistic of daily revenue at window sizes
    {_RS_WINDOWS} — the Hurst-exponent observable: if mean (R/S)^2
    grows ~w^(2H), H>0.5 means long-range persistence (trends feed
    on themselves), H<0.5 mean reversion; the caller reads H off the
    three scales. Fully integer-exact via the squared form: per
    tumbling FULL window, z = w*x - Sum(x) (scale-w centered), R is
    the prefix-sum range, and (R/S)^2 = R_scaled^2 * w / Sum(z^2) in
    floor micro-ticks — no sqrt, no mean division, no float anywhere.
    Scale shape: one day agg, per-(scale, bucket) windows over the
    calendar-bounded series; the 3-scale dim is a broadcast."""
    dec = "decimal(38,0)"
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.floor(F.unix_timestamp("o_orderdate") / F.lit(86400)).cast("long").alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    idx = daily.select(
        (F.row_number().over(Window.orderBy("d")) - 1).cast("long").alias("k"), "x"
    )
    wdim = spark.createDataFrame([(w,) for w in _RS_WINDOWS], "w long")
    win = idx.crossJoin(F.broadcast(wdim)).select(
        "w", F.expr("k div w").alias("bucket"), "k", "x"
    )
    full_b = win.groupBy("w", "bucket").agg(F.count("*").alias("c")).filter(
        F.col("c") == F.col("w")
    ).select("w", "bucket")
    wb = Window.partitionBy("w", "bucket")
    zb = win.join(full_b, ["w", "bucket"]).select(
        "w",
        "bucket",
        "k",
        (F.col("w").cast(dec) * F.col("x") - F.sum(F.col("x").cast(dec)).over(wb)).alias("z"),
    )
    pb = zb.select(
        "w", "bucket", F.sum("z").over(wb.orderBy("k")).alias("p"), "z"
    )
    rs = pb.groupBy("w", "bucket").agg(
        (F.max("p") - F.min("p")).alias("r_scaled"),
        F.sum(F.col("z") * F.col("z")).cast(dec).alias("szz"),
    )
    per = rs.filter(F.col("szz") > 0).select(
        "w",
        F.expr("(r_scaled * r_scaled * w * 1000000) div szz").cast("long").alias("rs2_q"),
    )
    return (
        per.groupBy(F.col("w").cast("long").alias("w"))
        .agg(
            F.count("*").cast("long").alias("n_buckets"),
            F.expr("sum(rs2_q) div count(*)").cast("long").alias("mean_rs2_q"),
            F.max("rs2_q").cast("long").alias("max_rs2_q"),
        )
        .orderBy("w")
    )



@register(
    "median_polish_calendar",
    f"""
WITH cell AS (
  SELECT epoch_us(o_orderdate) // 1000000 // 86400 % 7 AS dow,
         month(o_orderdate) AS mon,
         cast(sum(cast(round(cast(o_totalprice as {DEC}) * 100) as bigint)) as bigint)
           AS x
  FROM orders GROUP BY dow, mon
), r1m AS (
  SELECT dow,
         cast(max(CASE WHEN rn = (cnt + 1) // 2 THEN x END)
              + max(CASE WHEN rn = cnt // 2 + 1 THEN x END) as bigint) AS rdm
  FROM (SELECT dow, x, row_number() OVER (PARTITION BY dow ORDER BY x) AS rn,
               count(*) OVER (PARTITION BY dow) AS cnt FROM cell)
  GROUP BY dow
), r1 AS (
  SELECT cell.dow, cell.mon, cell.x, r1m.rdm, 2 * cell.x - r1m.rdm AS v1
  FROM cell JOIN r1m USING (dow)
), c1m AS (
  SELECT mon,
         cast(max(CASE WHEN rn = (cnt + 1) // 2 THEN v1 END)
              + max(CASE WHEN rn = cnt // 2 + 1 THEN v1 END) as bigint) AS cdm
  FROM (SELECT mon, v1, row_number() OVER (PARTITION BY mon ORDER BY v1) AS rn,
               count(*) OVER (PARTITION BY mon) AS cnt FROM r1)
  GROUP BY mon
)
SELECT r1.dow, cast(r1.mon as int) AS mon, r1.x AS x_cents,
       r1.rdm AS roweff2, c1m.cdm AS coleff4,
       cast(2 * r1.v1 - c1m.cdm as bigint) AS resid4
FROM r1 JOIN c1m USING (mon)
ORDER BY dow, mon
""",
)
def median_polish_calendar(spark, sf_dir):
    """Tukey median polish (two-sweep) of the day-of-week x month
    revenue matrix — the robust two-way decomposition x = overall +
    row + column + residual that survives the outlier months a
    mean-based ANOVA would smear (seasonal_decompose_daily is the
    mean-based 1-way sibling; this is the classic robust 2-way). The
    integer trick: each sweep DOUBLES the working values before
    subtracting the doubled group median (an exact integer for any
    group size), so after the row sweep v1 = 2x - roweff2 and after
    the column sweep resid4 = 2*v1 - coleff4 = 4*residual — units are
    documented in the column names, nothing ever divides. dow = epoch
    day % 7 (locale-free). Scale shape: one cell agg on the big
    table, then rank windows over the 7x12 matrix."""
    o = load(spark, sf_dir, "orders")
    cell = o.groupBy(
        (F.floor(F.unix_timestamp("o_orderdate") / F.lit(86400)).cast("long") % 7).alias(
            "dow"
        ),
        F.month("o_orderdate").alias("mon"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("x")
    )

    def dbl_med(df, grp, val, out):
        w = Window.partitionBy(grp)
        r = df.select(
            grp,
            val,
            F.row_number().over(w.orderBy(val)).alias("rn"),
            F.count("*").over(w).alias("cnt"),
        )
        return r.groupBy(grp).agg(
            (
                F.max(F.when(F.col("rn") == F.expr("(cnt + 1) div 2"), F.col(val)))
                + F.max(F.when(F.col("rn") == F.expr("cnt div 2 + 1"), F.col(val)))
            )
            .cast("long")
            .alias(out)
        )

    r1m = dbl_med(cell, "dow", "x", "rdm")
    r1 = cell.join(r1m, "dow").withColumn(
        "v1", (F.lit(2) * F.col("x") - F.col("rdm")).cast("long")
    )
    c1m = dbl_med(r1, "mon", "v1", "cdm")
    return (
        r1.join(c1m, "mon")
        .select(
            "dow",
            F.col("mon").cast("int").alias("mon"),
            F.col("x").alias("x_cents"),
            F.col("rdm").alias("roweff2"),
            F.col("cdm").alias("coleff4"),
            (F.lit(2) * F.col("v1") - F.col("cdm")).cast("long").alias("resid4"),
        )
        .orderBy("dow", "mon")
    )



@register(
    "records_test_daily",
    f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // 1000000 // 86400 AS d,
         cast(sum(cast(round(cast(o_totalprice as {DEC}) * 100) as bigint)) as bigint)
           AS x
  FROM orders GROUP BY d
), rec AS (
  SELECT d, x,
         CASE WHEN x > coalesce(max(x) OVER (ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS is_rec,
         row_number() OVER (ORDER BY d) AS k
  FROM daily
), harm AS (
  SELECT cast(sum(1000000 // k) as bigint) AS h_q,
         cast(sum(1000000 // k - (1000000 // k) * (1000000 // k) // 1000000)
              as bigint) AS v_q
  FROM rec
)
SELECT cast(count(*) as bigint) AS n_days,
       cast(sum(is_rec) as bigint) AS n_records,
       cast(max(CASE WHEN is_rec = 1 THEN d END) as bigint) AS last_record_day,
       any_value(harm.h_q) AS expected_q,
       any_value(harm.v_q) AS variance_q
FROM rec, harm
""",
)
def records_test_daily(spark, sf_dir):
    """Theory-of-records test on daily revenue: the count of running
    record highs vs its i.i.d. expectation H_n = Sum 1/k (every new
    record under exchangeability is a 1/k coin — far MORE records than
    H_n means genuine growth/trend, the distribution-free trend check
    that needs no variance estimate at all; mann_kendall is the
    magnitude-blind rank cousin). Expectation and variance
    (Sum 1/k(1-1/k)) accumulate as per-term floor micro-ticks —
    deterministic integers both engines. Scale shape: one day agg +
    one running-max window; the record indicator is a 1-preceding
    frame, so no self-join."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.floor(F.unix_timestamp("o_orderdate") / F.lit(86400)).cast("long").alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    wprev = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    rec = daily.select(
        "d",
        "x",
        F.when(
            F.col("x") > F.coalesce(F.max("x").over(wprev), F.lit(-1)), 1
        )
        .otherwise(0)
        .alias("is_rec"),
        F.row_number().over(Window.orderBy("d")).alias("k"),
    ).localCheckpoint()
    harm = rec.agg(
        F.sum(F.expr("1000000 div k")).cast("long").alias("h_q"),
        F.sum(
            F.expr("1000000 div k - ((1000000 div k) * (1000000 div k)) div 1000000")
        )
        .cast("long")
        .alias("v_q"),
    )
    return rec.crossJoin(F.broadcast(harm)).agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("is_rec").cast("long").alias("n_records"),
        F.max(F.when(F.col("is_rec") == 1, F.col("d"))).cast("long").alias(
            "last_record_day"
        ),
        F.any_value("h_q").alias("expected_q"),
        F.any_value("v_q").alias("variance_q"),
    )



@register(
    "peak_detection_daily",
    f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // 1000000 // 86400 AS d,
         cast(sum(cast(round(cast(o_totalprice as {DEC}) * 100) as bigint)) as bigint)
           AS x
  FROM orders GROUP BY d
), nb AS (
  SELECT d, x,
         max(x) OVER (ORDER BY d RANGE BETWEEN 3 PRECEDING AND 1 PRECEDING) AS lmax,
         max(x) OVER (ORDER BY d RANGE BETWEEN 1 FOLLOWING AND 3 FOLLOWING) AS rmax,
         count(*) OVER (ORDER BY d RANGE BETWEEN 3 PRECEDING AND 1 PRECEDING) AS lc,
         count(*) OVER (ORDER BY d RANGE BETWEEN 1 FOLLOWING AND 3 FOLLOWING) AS rc
  FROM daily
), peaks AS (
  SELECT d, x, x - greatest(lmax, rmax) AS prom3
  FROM nb
  WHERE lc = 3 AND rc = 3 AND x > lmax AND x > rmax
)
SELECT d AS day, x AS x_cents, cast(prom3 as bigint) AS prominence3,
       cast(row_number() OVER (ORDER BY prom3 DESC, d) as bigint) AS rank
FROM peaks ORDER BY prom3 DESC, d LIMIT 10
""",
)
def peak_detection_daily(spark, sf_dir):
    """Top-10 revenue peaks by local prominence — signal-processing
    peak picking on the daily series: a peak must strictly dominate
    its FULL ±3-calendar-day neighborhood (RANGE windows keyed on the
    epoch day, so calendar gaps disqualify honestly rather than
    silently shrinking the window), and prominence3 = x - max(neighbor)
    ranks how much it stands out — the local complement to
    drawdown_revenue_daily's global extremes and rate_anomaly's
    z-scores (no variance estimate here: pure order structure).
    All integers; ties to the earlier day. Scale shape: one day agg +
    two ranged windows + TakeOrdered."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.floor(F.unix_timestamp("o_orderdate") / F.lit(86400)).cast("long").alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    wl = Window.orderBy("d").rangeBetween(-3, -1)
    wr = Window.orderBy("d").rangeBetween(1, 3)
    nb = daily.select(
        "d",
        "x",
        F.max("x").over(wl).alias("lmax"),
        F.max("x").over(wr).alias("rmax"),
        F.count("*").over(wl).alias("lc"),
        F.count("*").over(wr).alias("rc"),
    )
    peaks = nb.filter(
        (F.col("lc") == 3)
        & (F.col("rc") == 3)
        & (F.col("x") > F.col("lmax"))
        & (F.col("x") > F.col("rmax"))
    ).select("d", "x", (F.col("x") - F.greatest("lmax", "rmax")).alias("prom3"))
    return (
        peaks.select(
            F.col("d").alias("day"),
            F.col("x").alias("x_cents"),
            F.col("prom3").cast("long").alias("prominence3"),
            F.row_number()
            .over(Window.orderBy(F.col("prom3").desc(), "d"))
            .cast("long")
            .alias("rank"),
        )
        .orderBy(F.col("prominence3").desc(), "day")
        .limit(10)
    )



@register(
    "adf_unit_root_daily",
    f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // 1000000 // 86400 AS d,
         cast(sum(cast(round(cast(o_totalprice as {DEC}) * 100) as bigint)) // 10000
              as bigint) AS x
  FROM orders GROUP BY d
), pairs AS (
  SELECT lag(x) OVER (ORDER BY d) AS z, x - lag(x) OVER (ORDER BY d) AS y
  FROM daily
), m AS (SELECT z, y FROM pairs WHERE z IS NOT NULL),
s AS (
  SELECT cast(count(*) as HUGEINT) AS n,
         cast(sum(z) as HUGEINT) AS sz, cast(sum(y) as HUGEINT) AS sy,
         cast(sum(cast(z as HUGEINT) * z) as HUGEINT) AS szz,
         cast(sum(cast(y as HUGEINT) * y) as HUGEINT) AS syy,
         cast(sum(cast(z as HUGEINT) * y) as HUGEINT) AS szy
  FROM m
), c AS (
  SELECT n, n * szz - sz * sz AS det, n * szy - sz * sy AS b_num,
         (n * szz - sz * sz) * (n * syy - sy * sy)
           - (n * szy - sz * sy) * (n * szy - sz * sy) AS sse_nd
  FROM s
)
SELECT cast(n as bigint) AS n,
       cast(b_num as double) AS b_num, cast(det as double) AS det,
       cast(sse_nd as double) AS sse_nd,
       cast(b_num as double) / cast(det as double) AS gamma,
       cast(b_num as double) * cast(det as double)
         * sqrt(cast(n - 2 as double) / cast(sse_nd as double))
         / cast(det as double) AS t_stat
FROM c
""",
)
def adf_unit_root_daily(spark, sf_dir):
    """Dickey-Fuller unit-root test (with drift) on daily revenue:
    regress the day-over-day change on the lagged level — gamma near 0
    (t above ~-2.86) means shocks persist (random-walk-like, so
    rescaled_range/holt trends are real state), strongly negative t
    means mean reversion (model the level, not the diffs). The
    stationarity gate the rest of the time-series family silently
    assumes an answer to. Exactness: values in $100 ticks so the
    CLOSED-FORM scaled SSE (n*D*SSE = D*(n*Syy - Sy^2) - B^2 — no
    per-row residual, whose det-scaled square overflows decimal38)
    stays exact; gamma = B/D and t = B*D*sqrt((n-2)/SSE_nD)/D are the
    only floats, in one fixed textual order. Scale shape: one day agg
    + one lag window + ONE moment aggregate."""
    dec = "decimal(38,0)"
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.floor(F.unix_timestamp("o_orderdate") / F.lit(86400)).cast("long").alias("d")
    ).agg(
        F.expr(
            f"cast(sum(cast(round(cast(o_totalprice as {DEC}) * 100) as bigint))"
            " div 10000 as bigint)"
        ).alias("x")
    )
    w = Window.orderBy("d")
    m = daily.select(
        F.lag("x").over(w).alias("z"), (F.col("x") - F.lag("x").over(w)).alias("y")
    ).filter(F.col("z").isNotNull())
    s = m.agg(
        F.count("*").cast(dec).alias("n"),
        F.sum("z").cast(dec).alias("sz"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("z").cast(dec) * F.col("z")).cast(dec).alias("szz"),
        F.sum(F.col("y").cast(dec) * F.col("y")).cast(dec).alias("syy"),
        F.sum(F.col("z").cast(dec) * F.col("y")).cast(dec).alias("szy"),
    )
    c = s.select(
        "n",
        F.expr("n * szz - sz * sz").alias("det"),
        F.expr("n * szy - sz * sy").alias("b_num"),
        F.expr(
            "(n * szz - sz * sz) * (n * syy - sy * sy)"
            " - (n * szy - sz * sy) * (n * szy - sz * sy)"
        ).alias("sse_nd"),
    )
    return c.select(
        F.col("n").cast("long").alias("n"),
        F.col("b_num").cast("double").alias("b_num"),
        F.col("det").cast("double").alias("det"),
        F.col("sse_nd").cast("double").alias("sse_nd"),
        (F.col("b_num").cast("double") / F.col("det").cast("double")).alias("gamma"),
        (
            F.col("b_num").cast("double")
            * F.col("det").cast("double")
            * F.sqrt((F.col("n") - 2).cast("double") / F.col("sse_nd").cast("double"))
            / F.col("det").cast("double")
        ).alias("t_stat"),
    )



@register(
    "its_segmented_daily",
    f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // 1000000 // 86400 AS d,
         cast(sum(cast(round(cast(o_totalprice as {DEC}) * 100) as bigint)) as bigint)
           AS y
  FROM orders GROUP BY d
), idx AS (
  SELECT row_number() OVER (ORDER BY d) AS t, y,
         count(*) OVER () AS n_all
  FROM daily
), m AS (
  SELECT cast(y as bigint) AS y, cast(t as bigint) AS x1,
         cast(greatest(0, t - n_all // 2) as bigint) AS x2
  FROM idx
), s AS (
  SELECT cast(count(*) as HUGEINT) AS n,
         cast(sum(x1) as HUGEINT) AS s1, cast(sum(x2) as HUGEINT) AS s2,
         cast(sum(y) as HUGEINT) AS sy,
         cast(sum(cast(x1 as HUGEINT) * x1) as HUGEINT) AS s11,
         cast(sum(cast(x2 as HUGEINT) * x2) as HUGEINT) AS s22,
         cast(sum(cast(x1 as HUGEINT) * x2) as HUGEINT) AS s12,
         cast(sum(cast(x1 as HUGEINT) * y) as HUGEINT) AS s1y,
         cast(sum(cast(x2 as HUGEINT) * y) as HUGEINT) AS s2y
  FROM m
)
SELECT cast(n as bigint) AS n,
       cast(n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s12 - s11 * s2) as double) AS det,
       cast(n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s2y - s1y * s2) as double)
         / cast(n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
                + s2 * (s1 * s12 - s11 * s2) as double) AS base_slope,
       cast(n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
            + sy * (s1 * s12 - s11 * s2) as double)
         / cast(n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
                + s2 * (s1 * s12 - s11 * s2) as double) AS slope_change
FROM s
""",
)
def its_segmented_daily(spark, sf_dir):
    """Interrupted-time-series segmented regression: y = a + b*t +
    c*(t - tau)+ with the breakpoint tau at the series midpoint — the
    policy-evaluation workhorse (did the trend BEND after the
    intervention?), here as the slope-change companion to
    cusum_changepoint_cells (which finds WHERE; this quantifies the
    kink) and diff_in_diff_users (which needs a control group; ITS
    needs only the pre-period). The hinge regressor (t - tau)+ makes
    it a 2-regressor OLS, so the exact Cramer machinery of
    ols2_doc_features applies verbatim: one decimal38 moment
    aggregate, fixed-order determinant expansion, base_slope and
    slope_change the only floats. Scale shape: one day agg + one
    rank window + one aggregate."""
    dec = "decimal(38,0)"
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.floor(F.unix_timestamp("o_orderdate") / F.lit(86400)).cast("long").alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("y")
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("d")).cast("long").alias("t"),
        "y",
        F.count("*").over(Window.partitionBy()).cast("long").alias("n_all"),
    )
    m = idx.select(
        F.col("y").cast("long").alias("y"),
        F.col("t").alias("x1"),
        F.greatest(F.lit(0).cast("long"), F.col("t") - F.expr("n_all div 2")).alias("x2"),
    )
    s = m.agg(
        F.count("*").cast(dec).alias("n"),
        F.sum("x1").cast(dec).alias("s1"),
        F.sum("x2").cast(dec).alias("s2"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x1").cast(dec) * F.col("x1")).cast(dec).alias("s11"),
        F.sum(F.col("x2").cast(dec) * F.col("x2")).cast(dec).alias("s22"),
        F.sum(F.col("x1").cast(dec) * F.col("x2")).cast(dec).alias("s12"),
        F.sum(F.col("x1").cast(dec) * F.col("y")).cast(dec).alias("s1y"),
        F.sum(F.col("x2").cast(dec) * F.col("y")).cast(dec).alias("s2y"),
    )
    det = "n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)"
    det1 = "n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2)"
    det2 = "n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2)"
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.expr(det).cast("double").alias("det"),
        (F.expr(det1).cast("double") / F.expr(det).cast("double")).alias("base_slope"),
        (F.expr(det2).cast("double") / F.expr(det).cast("double")).alias("slope_change"),
    )



@register(
    "hampel_filter_daily",
    f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // 1000000 // 86400 AS d,
         cast(sum(cast(round(cast(o_totalprice as {DEC}) * 100) as bigint)) as bigint)
           AS x
  FROM orders GROUP BY d
), nb AS (
  SELECT a.d, a.x, b.x AS bx
  FROM daily a JOIN daily b
    ON b.d BETWEEN a.d - {_HAMPEL_K} AND a.d + {_HAMPEL_K}
), med AS (
  SELECT d, x,
         cast(max(CASE WHEN rn = (cnt + 1) // 2 THEN bx END)
              + max(CASE WHEN rn = cnt // 2 + 1 THEN bx END) as bigint) AS med2,
         any_value(cnt) AS wn
  FROM (SELECT d, x, bx, row_number() OVER (PARTITION BY d ORDER BY bx) AS rn,
               count(*) OVER (PARTITION BY d) AS cnt FROM nb)
  GROUP BY d, x
), dev AS (
  SELECT m.d, m.x, m.med2, m.wn, abs(2 * b.x - m.med2) AS ad2
  FROM med m JOIN daily b ON b.d BETWEEN m.d - {_HAMPEL_K} AND m.d + {_HAMPEL_K}
), mad AS (
  SELECT d, any_value(x) AS x, any_value(med2) AS med2, any_value(wn) AS wn,
         cast(max(CASE WHEN rn = (cnt + 1) // 2 THEN ad2 END)
              + max(CASE WHEN rn = cnt // 2 + 1 THEN ad2 END) as bigint) AS mad4
  FROM (SELECT d, x, med2, wn, ad2,
               row_number() OVER (PARTITION BY d ORDER BY ad2) AS rn,
               count(*) OVER (PARTITION BY d) AS cnt FROM dev)
  GROUP BY d
)
SELECT d AS day, x AS x_cents, med2, mad4, wn AS window_n,
       CASE WHEN wn = 2 * {_HAMPEL_K} + 1
             AND abs(2 * x - med2) * 4 > 3 * 3 * mad4 THEN 1 ELSE 0 END AS is_outlier
FROM mad ORDER BY day
""",
)
def hampel_filter_daily(spark, sf_dir):
    """Hampel identifier on daily revenue: a day is an outlier when
    |x - rolling_median| > 3 * rolling_MAD over the full ±{_HAMPEL_K}
    calendar-day window — the standard robust despiking filter (the
    ROLLING complement to robust_outliers_orders' global MAD; peak_
    detection ranks structure, Hampel flags corruption). The doubled-
    median trick keeps both the window median (med2 = 2*median) and
    the MAD of doubled deviations (mad4 = 4*MAD... 2*median of ad2)
    exact integers, and the decision |2x - med2|*4 > 9*mad4 is a pure
    integer comparison (the 1.4826 consistency constant folded into
    the documented threshold). Partial windows report but never flag.
    Scale shape: two calendar-bounded band self-joins (<= 7x fan-out)
    + rank windows per day."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.floor(F.unix_timestamp("o_orderdate") / F.lit(86400)).cast("long").alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    daily = daily.localCheckpoint()
    b = daily.select(F.col("d").alias("bd"), F.col("x").alias("bx"))
    k = _HAMPEL_K
    nb = daily.join(
        b, (F.col("bd") >= F.col("d") - k) & (F.col("bd") <= F.col("d") + k)
    ).select("d", "x", "bx")
    wd = Window.partitionBy("d")
    med = (
        nb.select(
            "d",
            "x",
            "bx",
            F.row_number().over(wd.orderBy("bx")).alias("rn"),
            F.count("*").over(wd).alias("cnt"),
        )
        .groupBy("d", "x")
        .agg(
            (
                F.max(F.when(F.col("rn") == F.expr("(cnt + 1) div 2"), F.col("bx")))
                + F.max(F.when(F.col("rn") == F.expr("cnt div 2 + 1"), F.col("bx")))
            )
            .cast("long")
            .alias("med2"),
            F.any_value("cnt").alias("wn"),
        )
    )
    dev = med.join(
        b, (F.col("bd") >= F.col("d") - k) & (F.col("bd") <= F.col("d") + k)
    ).select("d", "x", "med2", "wn", F.abs(F.lit(2) * F.col("bx") - F.col("med2")).alias("ad2"))
    mad = (
        dev.select(
            "d",
            "x",
            "med2",
            "wn",
            "ad2",
            F.row_number().over(wd.orderBy("ad2")).alias("rn"),
            F.count("*").over(wd).alias("cnt"),
        )
        .groupBy("d")
        .agg(
            F.any_value("x").alias("x"),
            F.any_value("med2").alias("med2"),
            F.any_value("wn").alias("wn"),
            (
                F.max(F.when(F.col("rn") == F.expr("(cnt + 1) div 2"), F.col("ad2")))
                + F.max(F.when(F.col("rn") == F.expr("cnt div 2 + 1"), F.col("ad2")))
            )
            .cast("long")
            .alias("mad4"),
        )
    )
    return mad.select(
        F.col("d").alias("day"),
        F.col("x").alias("x_cents"),
        "med2",
        "mad4",
        F.col("wn").alias("window_n"),
        F.when(
            (F.col("wn") == 2 * k + 1)
            & (F.abs(F.lit(2) * F.col("x") - F.col("med2")) * 4 > 9 * F.col("mad4")),
            1,
        )
        .otherwise(0)
        .alias("is_outlier"),
    ).orderBy("day")



@register(
    "burst_states_users",
    f"""
WITH RECURSIVE e2 AS (
  SELECT user_id, epoch_us(ts) AS us, event_id FROM events
), g1 AS (
  SELECT user_id,
         (lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us)
           // 60000000 AS g
  FROM e2
), seq AS (
  SELECT user_id, g,
         row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS k
  FROM (
    SELECT user_id, us, event_id,
           (lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us)
             // 60000000 AS g
    FROM e2
  ) WHERE g IS NOT NULL
), r AS (
  SELECT user_id, 0 AS k,
         cast(0 as bigint) AS c0, cast(0 as bigint) AS b0, cast(0 as bigint) AS t0,
         cast({_BURST_SWITCH} as bigint) AS c1, cast(1 as bigint) AS b1,
         cast(0 as bigint) AS t1
  FROM (SELECT DISTINCT user_id FROM seq)
  UNION ALL
  SELECT s.user_id, s.k,
         CASE WHEN r.c0 <= r.c1 + {_BURST_SWITCH}
              THEN r.c0 + {_BURST_FLAT}
              ELSE r.c1 + {_BURST_SWITCH} + {_BURST_FLAT} END,
         CASE WHEN r.c0 <= r.c1 + {_BURST_SWITCH} THEN r.b0 ELSE r.b1 END,
         CASE WHEN r.c0 <= r.c1 + {_BURST_SWITCH} THEN r.t0 ELSE r.t1 END,
         CASE WHEN r.c1 <= r.c0 + {_BURST_SWITCH}
              THEN r.c1 + s.g ELSE r.c0 + {_BURST_SWITCH} + s.g END,
         CASE WHEN r.c1 <= r.c0 + {_BURST_SWITCH} THEN r.b1 ELSE r.b0 + 1 END,
         CASE WHEN r.c1 <= r.c0 + {_BURST_SWITCH} THEN r.t1 + s.g
              ELSE r.t0 + s.g END
  FROM r JOIN seq s ON s.user_id = r.user_id AND s.k = r.k + 1
), fin AS (
  SELECT r.user_id, r.k, r.c0, r.b0, r.t0, r.c1, r.b1, r.t1,
         row_number() OVER (PARTITION BY r.user_id ORDER BY r.k DESC) AS rk
  FROM r
)
SELECT user_id, cast(k as bigint) AS n_gaps,
       cast(CASE WHEN c0 <= c1 THEN c0 ELSE c1 END as bigint) AS total_cost,
       cast(CASE WHEN c0 <= c1 THEN b0 ELSE b1 END as bigint) AS n_bursts,
       cast(CASE WHEN c0 <= c1 THEN t0 ELSE t1 END as bigint) AS burst_minutes
FROM fin WHERE rk = 1 ORDER BY user_id
""",
)
def burst_states_users(spark, sf_dir):
    """Two-state burst segmentation of each user's inter-event gaps —
    the Kleinberg burst-detection shape with integer costs (normal
    state pays a flat {_BURST_FLAT}/gap, burst state pays the gap in
    minutes, switching costs {_BURST_SWITCH}): short-gap runs become
    bursts exactly when they amortize the switch. The DP carries each
    state's optimal (cost, n_bursts, burst_minutes) FORWARD (no
    backtracking — the same trick that made Viterbi map matching
    oracle-able would need backpointers; carrying path statistics
    does not), ties prefer staying, so the whole labeling is
    deterministic integer arithmetic: one applyInPandas per user
    (operators/recurrence.py burst2_kernel), one WITH RECURSIVE
    replay. The model-based upgrade of fano_burstiness/bot_regularity
    (moments) to an actual segmentation. Scale shape: one lead
    window, per-user state bounded by that user's events."""
    from gipspark.operators.recurrence import burst2_kernel

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    g1 = ev.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    ).select(
        "user_id",
        "us",
        "event_id",
        F.expr("(lead(us) over (partition by user_id order by us, event_id) - us)"
               " div 60000000").alias("g"),
    ).filter(F.col("g").isNotNull())
    seq = g1.select(
        "user_id", "g", F.row_number().over(w).alias("k")
    )
    return (
        seq.groupBy("user_id")
        .applyInPandas(
            burst2_kernel(_BURST_FLAT, _BURST_SWITCH),
            "user_id long, n_gaps long, total_cost long, n_bursts long,"
            " burst_minutes long",
        )
        .orderBy("user_id")
    )



@register(
    "gallagher_index_sources",
    f"""
WITH votes AS (
  SELECT source, cast(count(*) as bigint) AS v FROM documents GROUP BY source
), tot AS (SELECT cast(sum(v) as bigint) AS vt FROM votes),
divisors AS (SELECT unnest(range(1, {_GALL_SEATS} + 1)) AS k),
quot AS (
  SELECT votes.source, cast(votes.v as HUGEINT) * 1000000 // d.k AS q,
         row_number() OVER (ORDER BY cast(votes.v as HUGEINT) * 1000000 // d.k DESC,
                            votes.source, d.k) AS rk
  FROM votes CROSS JOIN divisors d
), seats AS (
  SELECT source, cast(count(*) as bigint) AS s
  FROM quot WHERE rk <= {_GALL_SEATS} GROUP BY source
), j AS (
  SELECT v.source, v.v, coalesce(seats.s, 0) AS s, tot.vt
  FROM votes v LEFT JOIN seats ON seats.source = v.source CROSS JOIN tot
), dev AS (
  SELECT cast(sum((cast(v as HUGEINT) * {_GALL_SEATS} - cast(s as HUGEINT) * vt)
                  * (cast(v as HUGEINT) * {_GALL_SEATS} - cast(s as HUGEINT) * vt))
              as HUGEINT) AS ss,
         any_value(vt) AS vt
  FROM j
)
SELECT cast({_GALL_SEATS} as bigint) AS n_seats, cast(vt as bigint) AS n_votes,
       cast(ss as double) AS ss_num,
       sqrt(cast(ss as double) / 2.0)
         / (cast(vt as double) * {_GALL_SEATS}) * 100.0 AS gallagher_pct
FROM dev
""",
)
def gallagher_index_sources(spark, sf_dir):
    """Gallagher least-squares disproportionality of a D'Hondt seat
    allocation: allocate {_GALL_SEATS} crawl-budget 'seats' to sources
    by highest-averages (the dhondt_seats_sources rule, quotients in
    exact integer ticks with deterministic ties) and score how far the
    seat shares land from the vote shares — G = sqrt(Sum(v% - s%)^2/2),
    THE standard electoral-systems fairness number, here auditing how
    much a quantized budget distorts proportional allocation.
    Deviations cross-multiply (v*S - s*V) so the sum of squares is an
    exact integer; G is one fixed-order float. Scale shape: one source
    agg, a bounded source x divisor grid, rank + agg."""
    docs = load(spark, sf_dir, "documents")
    votes = docs.groupBy("source").agg(F.count("*").cast("long").alias("v"))
    votes = votes.localCheckpoint()
    tot = votes.agg(F.sum("v").cast("long").alias("vt"))
    dec = "decimal(38,0)"
    divisors = spark.range(1, _GALL_SEATS + 1).select(F.col("id").alias("k"))
    quot = votes.crossJoin(F.broadcast(divisors)).select(
        "source",
        F.expr(f"(cast(v as {dec}) * 1000000) div k").alias("q"),
        "k",
    )
    ranked = quot.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.col("q").desc(), "source", "k"))
    )
    seats = (
        ranked.filter(F.col("rk") <= _GALL_SEATS)
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("s"))
    )
    j = (
        votes.join(seats, "source", "left")
        .select("source", "v", F.coalesce(F.col("s"), F.lit(0)).alias("s"))
        .crossJoin(F.broadcast(tot))
    )
    devterm = F.col("v").cast(dec) * _GALL_SEATS - F.col("s").cast(dec) * F.col("vt")
    dev = j.agg(
        F.sum(devterm * devterm).cast(dec).alias("ss"),
        F.any_value("vt").alias("vt"),
    )
    return dev.select(
        F.lit(_GALL_SEATS).cast("long").alias("n_seats"),
        F.col("vt").cast("long").alias("n_votes"),
        F.col("ss").cast("double").alias("ss_num"),
        (
            F.sqrt(F.col("ss").cast("double") / F.lit(2.0))
            / (F.col("vt").cast("double") * _GALL_SEATS)
            * F.lit(100.0)
        ).alias("gallagher_pct"),
    )



@register(
    "ewma_smooth_daily",
    f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // 1000000 // 86400 AS d,
         cast(sum(cast(round(cast(o_totalprice as {DEC}) * 100) as bigint)) as bigint)
           AS x
  FROM orders GROUP BY d
), nb AS (
  SELECT a.d, a.x,
         cast(sum(b.x * (1 << ({_EWMA_W - 1} - (a.d - b.d)))) as bigint) AS num,
         cast(sum(1 << ({_EWMA_W - 1} - (a.d - b.d))) as bigint) AS den,
         cast(count(*) as bigint) AS window_n
  FROM daily a JOIN daily b ON b.d BETWEEN a.d - {_EWMA_W - 1} AND a.d
  GROUP BY a.d, a.x
)
SELECT d AS day, x AS x_cents,
       cast((num * 1000) // den as bigint) AS ewma_milli_cents,
       window_n,
       CASE WHEN x * den * 10 > num * 13 THEN 1 ELSE 0 END AS is_spike
FROM nb ORDER BY day
""",
)
def ewma_smooth_daily(spark, sf_dir):
    """EWMA-smoothed daily revenue with lambda = 1/2 — the classic
    exponentially-weighted control-chart smoother (Hampel despikes
    with the rolling median; EWMA is the recency-weighted level the
    ops dashboard actually plots). The geometric weights are DYADIC:
    lag-L cents get weight 2^({_EWMA_W - 1}-L) over the trailing
    {_EWMA_W}-day window, so numerator and normalizer are exact
    integer sums (no float pow, no recursive state), the smoothed
    level is a milli-cent floor tick, and the spike flag x > 1.3*ewma
    is the pure integer comparison 10*x*den > 13*num. Scale shape:
    one calendar-bounded band self-join (<= {_EWMA_W}x fan-out) on an
    already-tiny daily aggregate."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.floor(F.unix_timestamp("o_orderdate") / F.lit(86400)).cast("long").alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    daily = daily.localCheckpoint()
    b = daily.select(F.col("d").alias("bd"), F.col("x").alias("bx"))
    w = _EWMA_W - 1
    nb = (
        daily.join(b, (F.col("bd") >= F.col("d") - w) & (F.col("bd") <= F.col("d")))
        .groupBy("d", "x")
        .agg(
            F.sum(
                F.col("bx")
                * F.expr(f"shiftleft(cast(1 as bigint), cast({w} - (d - bd) as int))")
            )
            .cast("long")
            .alias("num"),
            F.sum(F.expr(f"shiftleft(cast(1 as bigint), cast({w} - (d - bd) as int))"))
            .cast("long")
            .alias("den"),
            F.count("*").cast("long").alias("window_n"),
        )
    )
    return nb.select(
        F.col("d").alias("day"),
        F.col("x").alias("x_cents"),
        F.expr("cast((num * 1000) div den as bigint)").alias("ewma_milli_cents"),
        "window_n",
        F.when(
            F.col("x") * F.col("den") * F.lit(10) > F.col("num") * F.lit(13), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("is_spike"),
    ).orderBy("day")



@register(
    "durbin_watson_daily",
    f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // 1000000 // 86400 AS d,
         cast(sum(cast(round(cast(o_totalprice as {DEC}) * 100) as bigint)) as bigint)
           AS y
  FROM orders GROUP BY d
), idx AS (
  SELECT d, y, cast(row_number() OVER (ORDER BY d) as bigint) AS t FROM daily
), s AS (
  SELECT cast(count(*) as bigint) AS n,
         cast(sum(t) as bigint) AS st,
         cast(sum(t * t) as bigint) AS st2,
         cast(sum(y) as bigint) AS sy,
         cast(sum(cast(t as HUGEINT) * y) as HUGEINT) AS sty
  FROM idx
), co AS (
  SELECT n, st, sy,
         cast(n as HUGEINT) * st2 - cast(st as HUGEINT) * st AS sxx,
         cast(n as HUGEINT) * sty - cast(st as HUGEINT) * sy AS sxy
  FROM s
), res AS (
  SELECT idx.t,
         cast(((cast(idx.y as HUGEINT) * co.n * co.sxx
                - cast(co.sy as HUGEINT) * co.sxx
                - co.sxy * (co.n * idx.t - co.st)) * 1000)
              // (cast(co.n as HUGEINT) * co.sxx) as bigint) AS e_m
  FROM idx CROSS JOIN co
), dsum AS (
  SELECT cast(sum(cast(e_m as HUGEINT) * e_m) as HUGEINT) AS se2,
         cast(sum(cast(e_m - lag_e as HUGEINT) * (e_m - lag_e))
              FILTER (WHERE lag_e IS NOT NULL) as HUGEINT) AS sd2,
         cast(count(*) as bigint) AS n_days
  FROM (SELECT e_m, lag(e_m) OVER (ORDER BY t) AS lag_e FROM res)
)
SELECT n_days,
       cast((sd2 * 1000) // se2 as bigint) AS dw_milli,
       cast(cast((sd2 * 1000) // se2 as bigint) as double) / 1000.0 AS dw
FROM dsum
""",
)
def durbin_watson_daily(spark, sf_dir):
    """Durbin–Watson serial-correlation test on the residuals of the
    daily-revenue linear trend: dw ≈ 2 means the detrended series is
    white, dw « 2 means positive autocorrelation (momentum the OLS
    trend fails to capture — the standard post-regression diagnostic
    that ols_trend/its_segmented themselves never report). Residuals
    are exact rationals e_t = (y_t·n·Sxx − Sy·Sxx − Sxy·(n·t − St)) /
    (n·Sxx) with every numerator an exact HUGEINT/DECIMAL(38,0)
    product; each is floored once to a milli-cent tick e_m, and
    DW = Σ(Δe_m)²/Σe_m² on those quantized residuals is a pure
    integer ratio reported as a milli tick (the only double is the
    tick/1000, exact in IEEE). Scale shape: the point table collapses
    to ≤ n_days rows in one map-side-combinable agg; all regression
    math runs on that dim-scale series."""
    dec = "decimal(38,0)"
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.floor(F.unix_timestamp("o_orderdate") / F.lit(86400)).cast("long").alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("y")
    )
    idx = daily.select(
        "d", "y", F.row_number().over(Window.orderBy("d")).cast("long").alias("t")
    )
    s = idx.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("t").cast("long").alias("st"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("st2"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("t").cast(dec) * F.col("y")).cast(dec).alias("sty"),
    )
    co = s.select(
        "n",
        "st",
        "sy",
        (F.col("n").cast(dec) * F.col("st2") - F.col("st").cast(dec) * F.col("st"))
        .cast(dec)
        .alias("sxx"),
        (F.col("n").cast(dec) * F.col("sty") - F.col("st").cast(dec) * F.col("sy"))
        .cast(dec)
        .alias("sxy"),
    )
    res = idx.crossJoin(F.broadcast(co)).select(
        "t",
        F.expr(
            f"cast(((cast(y as {dec}) * n * sxx"
            f" - cast(sy as {dec}) * sxx"
            f" - sxy * (n * t - st)) * 1000)"
            f" div (cast(n as {dec}) * sxx) as bigint)"
        ).alias("e_m"),
    )
    lagd = res.select(
        "e_m", F.lag("e_m").over(Window.orderBy("t")).alias("lag_e")
    )
    dsum = lagd.agg(
        F.sum(F.col("e_m").cast(dec) * F.col("e_m")).cast(dec).alias("se2"),
        F.sum(
            F.when(
                F.col("lag_e").isNotNull(),
                (F.col("e_m") - F.col("lag_e")).cast(dec)
                * (F.col("e_m") - F.col("lag_e")),
            )
        )
        .cast(dec)
        .alias("sd2"),
        F.count("*").cast("long").alias("n_days"),
    )
    return dsum.select(
        "n_days",
        F.expr("cast((sd2 * 1000) div se2 as bigint)").alias("dw_milli"),
        (
            F.expr("cast((sd2 * 1000) div se2 as bigint)").cast("double") / F.lit(1000.0)
        ).alias("dw"),
    )



@register(
    "granger_daily_events",
    """
WITH daily AS (
  SELECT epoch_us(ts) // 1000000 // 86400 AS d,
         cast(count(*) FILTER (WHERE event_type = 'view') as bigint) AS v,
         cast(count(*) FILTER (WHERE event_type = 'purchase') as bigint) AS p
  FROM events GROUP BY d
), idx AS (
  SELECT d, v, p, cast(row_number() OVER (ORDER BY d) as bigint) AS t FROM daily
), lagged AS (
  SELECT p AS y, lag(p) OVER (ORDER BY t) AS yl, lag(v) OVER (ORDER BY t) AS xl
  FROM idx
), obs AS (
  SELECT y, yl, xl FROM lagged WHERE yl IS NOT NULL
), s AS (
  SELECT cast(count(*) as HUGEINT) AS n,
         cast(sum(yl) as HUGEINT) AS s1, cast(sum(xl) as HUGEINT) AS s2,
         cast(sum(y) as HUGEINT) AS sy,
         cast(sum(cast(yl as HUGEINT) * yl) as HUGEINT) AS s11,
         cast(sum(cast(xl as HUGEINT) * xl) as HUGEINT) AS s22,
         cast(sum(cast(yl as HUGEINT) * xl) as HUGEINT) AS s12,
         cast(sum(cast(yl as HUGEINT) * y) as HUGEINT) AS s1y,
         cast(sum(cast(xl as HUGEINT) * y) as HUGEINT) AS s2y,
         cast(sum(cast(y as HUGEINT) * y) as HUGEINT) AS syy
  FROM obs
), c AS (
  SELECT n,
         n * s11 - s1 * s1 AS a,
         n * s12 - s1 * s2 AS b,
         n * s22 - s2 * s2 AS cc,
         n * s1y - s1 * sy AS dd,
         n * s2y - s2 * sy AS e,
         n * syy - sy * sy AS g
  FROM s
), r AS (
  SELECT cast(n as bigint) AS n_obs,
         cast(g * a - dd * dd as double) / cast(a as double) AS rss_r_scaled,
         cast(g * (a * cc - b * b) - dd * (cc * dd - b * e) - e * (a * e - b * dd)
              as double)
           / cast(a * cc - b * b as double) AS rss_f_scaled
  FROM c
)
SELECT n_obs, rss_r_scaled, rss_f_scaled,
       (rss_r_scaled - rss_f_scaled) * cast(n_obs - 3 as double) / rss_f_scaled
         AS f_stat,
       (rss_r_scaled - rss_f_scaled) * cast(n_obs - 3 as double) / rss_f_scaled
         > 4.0 AS granger_causes
FROM r
""",
)
def granger_daily_events(spark, sf_dir):
    """Granger-causality F-test at lag 1: do yesterday's VIEW counts
    improve the prediction of today's PURCHASE counts beyond what
    yesterday's purchases already explain? Nested exact OLS — the
    restricted model y~1+y_lag and the full model y~1+y_lag+x_lag —
    with every centered moment an exact HUGEINT/DECIMAL(38,0) product
    (the ols2 Cramer idiom), both RSS values as single divisions of
    exact integers, and F = (RSS_r−RSS_f)(n−3)/RSS_f in one fixed
    textual order. Exactness envelope documented like ols2: triple
    moment products stay within 38 digits to ~10⁸ events/day-scale
    counts. Scale shape: the event table collapses to a daily series
    in one agg; the regression is a one-row reduce."""
    dec = "decimal(38,0)"
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / F.lit(86400)).cast("long").alias("d")
    ).agg(
        F.count(F.when(F.col("event_type") == "view", 1)).cast("long").alias("v"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).cast("long").alias("p"),
    )
    idx = daily.select(
        "d", "v", "p", F.row_number().over(Window.orderBy("d")).cast("long").alias("t")
    )
    w = Window.orderBy("t")
    lagged = idx.select(
        F.col("p").alias("y"),
        F.lag("p").over(w).alias("yl"),
        F.lag("v").over(w).alias("xl"),
    )
    obs = lagged.filter(F.col("yl").isNotNull())
    s = obs.agg(
        F.count("*").cast(dec).alias("n"),
        F.sum("yl").cast(dec).alias("s1"),
        F.sum("xl").cast(dec).alias("s2"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("yl").cast(dec) * F.col("yl")).cast(dec).alias("s11"),
        F.sum(F.col("xl").cast(dec) * F.col("xl")).cast(dec).alias("s22"),
        F.sum(F.col("yl").cast(dec) * F.col("xl")).cast(dec).alias("s12"),
        F.sum(F.col("yl").cast(dec) * F.col("y")).cast(dec).alias("s1y"),
        F.sum(F.col("xl").cast(dec) * F.col("y")).cast(dec).alias("s2y"),
        F.sum(F.col("y").cast(dec) * F.col("y")).cast(dec).alias("syy"),
    )
    c = s.select(
        "n",
        F.expr("n * s11 - s1 * s1").alias("a"),
        F.expr("n * s12 - s1 * s2").alias("b"),
        F.expr("n * s22 - s2 * s2").alias("cc"),
        F.expr("n * s1y - s1 * sy").alias("dd"),
        F.expr("n * s2y - s2 * sy").alias("e"),
        F.expr("n * syy - sy * sy").alias("g"),
    )
    r = c.select(
        F.col("n").cast("long").alias("n_obs"),
        (
            F.expr("g * a - dd * dd").cast("double") / F.expr("a").cast("double")
        ).alias("rss_r_scaled"),
        (
            F.expr(
                "g * (a * cc - b * b) - dd * (cc * dd - b * e) - e * (a * e - b * dd)"
            ).cast("double")
            / F.expr("a * cc - b * b").cast("double")
        ).alias("rss_f_scaled"),
    )
    fstat = (
        (F.col("rss_r_scaled") - F.col("rss_f_scaled"))
        * (F.col("n_obs") - 3).cast("double")
        / F.col("rss_f_scaled")
    )
    return r.select(
        "n_obs",
        "rss_r_scaled",
        "rss_f_scaled",
        fstat.alias("f_stat"),
        (fstat > 4.0).alias("granger_causes"),
    )



@register(
    "business_day_lag_items",
    f"""
WITH lags AS (
  SELECT (cast(l.l_shipdate as date) - DATE '{_BD_ANCHOR}') AS xb,
         (cast(o.o_orderdate as date) - DATE '{_BD_ANCHOR}') AS xa
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE cast(l.l_shipdate as date) >= cast(o.o_orderdate as date)
    AND (cast(l.l_shipdate as date) - cast(o.o_orderdate as date)) <= 90
), bd AS (
  SELECT (5 * (xb // 7) + least(xb % 7, 5)) - (5 * (xa // 7) + least(xa % 7, 5)) AS lag_bd
  FROM lags
)
SELECT cast(lag_bd as bigint) AS lag_bd, cast(count(*) as bigint) AS n_items
FROM bd GROUP BY lag_bd ORDER BY lag_bd
""",
)
def business_day_lag_items(spark, sf_dir):
    """Order-to-ship lag measured in BUSINESS days (weekends excluded)
    for items shipped within a 90-calendar-day fulfillment window —
    the SLA metric calendar-day q12_ship_delay_priority can't express.
    Uses the closed-form weekday counter g(x) = 5·(x div 7) +
    min(x mod 7, 5) against a fixed Monday anchor ({_BD_ANCHOR}), so
    the lag is pure integer date arithmetic — no calendar table, no
    per-day explode, identical in both engines. Scale shape: one
    orderkey equi-join + one histogram hash agg over the ≤65-value
    lag domain."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    anchor = F.lit(_BD_ANCHOR).cast("date")
    joined = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.datediff(F.to_date("l_shipdate"), anchor).cast("long").alias("xb"),
        F.datediff(F.to_date("o_orderdate"), anchor).cast("long").alias("xa"),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias("cal"),
    )
    g = lambda c: F.lit(5) * F.expr(f"{c} div 7") + F.least(  # noqa: E731
        F.col(c) % 7, F.lit(5)
    )
    return (
        joined.filter((F.col("cal") >= 0) & (F.col("cal") <= 90))
        .select((g("xb") - g("xa")).cast("long").alias("lag_bd"))
        .groupBy("lag_bd")
        .agg(F.count("*").cast("long").alias("n_items"))
        .orderBy("lag_bd")
    )



@register(
    "burstiness_gaps_users",
    """
WITH gaps AS (
  SELECT user_id,
         cast(epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) as bigint) // 1000000 AS gap_s
  FROM events
), stats AS (
  SELECT user_id, cast(count(*) as bigint) AS n_gaps,
         cast(sum(gap_s) as bigint) AS sum_gap,
         cast(sum(gap_s * gap_s) as bigint) AS sum_sq
  FROM gaps WHERE gap_s IS NOT NULL GROUP BY user_id
)
SELECT user_id, n_gaps, sum_gap, sum_sq,
       (sqrt(cast(n_gaps * sum_sq - sum_gap * sum_gap as double)) - cast(sum_gap as double))
         / (sqrt(cast(n_gaps * sum_sq - sum_gap * sum_gap as double)) + cast(sum_gap as double))
         AS burstiness
FROM stats WHERE n_gaps >= 2 ORDER BY user_id
""",
)
def burstiness_gaps_users(spark, sf_dir):
    """Goh–Barabási burstiness B = (σ−μ)/(σ+μ) of each user's inter-
    event times: B→−1 is a metronome (bot cadence), B≈0 Poisson, B→+1
    heavy-tailed human bursts — the single-number companion to
    fano_burstiness_events (which scores COUNT dispersion, not gap
    shape). Using n·σ and n·μ cancels the 1/n: B = (√(nΣg²−(Σg)²) −
    Σg)/(√(nΣg²−(Σg)²) + Σg) — integer moment sums, one correctly-
    rounded sqrt, one exact division, no mean ever materialized as a
    float. Scale shape: one user-partitioned lag window + one hash
    agg — shuffle ∝ events once."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        # NTZ ts → timestamp is exact: session tz pinned UTC (session.py)
        F.expr(
            "cast(unix_micros(cast(ts as timestamp)) -"
            " unix_micros(cast(lag(ts) over"
            " (partition by user_id order by ts, event_id) as timestamp))"
            " as bigint) div 1000000"
        ).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    stats = gaps.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.sum("gap_s").cast("long").alias("sum_gap"),
        F.sum(F.col("gap_s") * F.col("gap_s")).cast("long").alias("sum_sq"),
    )
    sd_n = F.sqrt(
        (F.col("n_gaps") * F.col("sum_sq") - F.col("sum_gap") * F.col("sum_gap")).cast(
            "double"
        )
    )
    return (
        stats.filter(F.col("n_gaps") >= 2)
        .select(
            "user_id",
            "n_gaps",
            "sum_gap",
            "sum_sq",
            (
                (sd_n - F.col("sum_gap").cast("double"))
                / (sd_n + F.col("sum_gap").cast("double"))
            ).alias("burstiness"),
        )
        .orderBy("user_id")
    )



@register(
    "bernoulli_cusum_users",
    f"""
WITH obs AS (
  SELECT user_id,
         cast(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) as bigint) AS i,
         cast(sum(CASE WHEN event_type = 'purchase' THEN {_SPRT_S} ELSE {_SPRT_F} END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS s_walk
  FROM events
), cusum AS (
  SELECT user_id, i, s_walk,
         s_walk - min(least(s_walk, 0)) OVER (PARTITION BY user_id ORDER BY i
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_t
  FROM obs
)
SELECT user_id,
       cast(count(*) as bigint) AS n_obs,
       cast(max(c_t) as bigint) AS max_cusum_nano,
       cast(coalesce(min(CASE WHEN c_t >= {_CUSUM_H} THEN i END), 0) as bigint) AS first_alarm_at,
       (min(CASE WHEN c_t >= {_CUSUM_H} THEN i END) IS NOT NULL) AS alarmed
FROM cusum GROUP BY user_id ORDER BY user_id
""",
)
def bernoulli_cusum_users(spark, sf_dir):
    """Bernoulli CUSUM with reset (Page's control chart on the SPRT's
    constant-log increments): C_t = max(0-anchored) detects a RATE
    SHIFT no matter when it starts — unlike sprt_decision_users,
    whose un-reset walk dilutes a late shift in early history. The
    reset recursion C_t = max(0, C_{{t-1}} + llr_t) is window-expressed
    through the Lindley identity C_t = S_t − min(min(S_s, 0)) over
    s ≤ t: one cumsum window + one running-min window, both exact
    bigint nano-nats — no per-row recursion, no UDF. Alarm at the
    Wald h = ln(19) bound (literal). Scale shape: two stacked
    user-partitioned windows + one hash agg — shuffle ∝ events
    once."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    step = F.when(F.col("event_type") == "purchase", F.lit(_SPRT_S)).otherwise(
        F.lit(_SPRT_F)
    )
    obs = e.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("i"),
        F.sum(step)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("s_walk"),
    )
    wi = (
        Window.partitionBy("user_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cusum = obs.select(
        "user_id",
        "i",
        (
            F.col("s_walk")
            - F.min(F.least(F.col("s_walk"), F.lit(0).cast("long"))).over(wi)
        ).alias("c_t"),
    )
    alarm_i = F.min(F.when(F.col("c_t") >= _CUSUM_H, F.col("i")))
    return (
        cusum.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_obs"),
            F.max("c_t").cast("long").alias("max_cusum_nano"),
            F.coalesce(alarm_i, F.lit(0)).cast("long").alias("first_alarm_at"),
            alarm_i.isNotNull().alias("alarmed"),
        )
        .orderBy("user_id")
    )



@register(
    "purchase_cadence_trend_users",
    """
WITH purch AS (
  SELECT user_id, ts, event_id,
         cast(epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) as bigint) // 1000000 AS gap_s,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i
  FROM events WHERE event_type = 'purchase'
), gaps AS (
  SELECT user_id, i, gap_s FROM purch WHERE gap_s IS NOT NULL
), pairs AS (
  SELECT a.user_id,
         cast(sum(CASE WHEN b.gap_s > a.gap_s THEN 1 WHEN b.gap_s < a.gap_s THEN -1 ELSE 0 END) as bigint) AS s_stat,
         cast(count(*) as bigint) AS n_pairs
  FROM gaps a JOIN gaps b ON a.user_id = b.user_id AND a.i < b.i
  GROUP BY a.user_id
), sizes AS (
  SELECT user_id, cast(count(*) as bigint) AS n_gaps FROM gaps GROUP BY user_id
)
SELECT s.user_id, s.n_gaps, p.s_stat, p.n_pairs,
       CASE WHEN p.s_stat > 0 THEN 'slowing' WHEN p.s_stat < 0 THEN 'accelerating' ELSE 'flat' END AS cadence
FROM sizes s JOIN pairs p ON s.user_id = p.user_id
WHERE s.n_gaps >= 5 ORDER BY s.user_id
""",
)
def purchase_cadence_trend_users(spark, sf_dir):
    """Purchase-cadence trend per user: the Mann-Kendall S statistic
    over the sequence of inter-purchase gaps — S > 0 means gaps are
    LENGTHENING (engagement decaying toward churn), S < 0 means the
    user is accelerating — the per-account early-warning that
    seasonal_mann_kendall_daily (corpus revenue) can't see. Pure sign
    counting over integer second gaps; the pair stage is a user-EQUI
    self-join bounded by per-user purchase counts (gaps², the
    ripleys/kendall_distance group-size contract). One lag window +
    one bounded pair join + one agg."""
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    purch = e.select(
        "user_id",
        F.expr(
            "cast(unix_micros(cast(ts as timestamp)) -"
            " unix_micros(cast(lag(ts) over"
            " (partition by user_id order by ts, event_id) as timestamp))"
            " as bigint) div 1000000"
        ).alias("gap_s"),
        F.row_number().over(w).alias("i"),
    ).filter(F.col("gap_s").isNotNull())
    a = purch.select("user_id", F.col("i").alias("ia"), F.col("gap_s").alias("ga"))
    b = purch.select("user_id", F.col("i").alias("ib"), F.col("gap_s").alias("gb"))
    sgn = (
        F.when(F.col("gb") > F.col("ga"), 1)
        .when(F.col("gb") < F.col("ga"), -1)
        .otherwise(0)
    )
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("ia") < F.col("ib"))
        .groupBy("user_id")
        .agg(
            F.sum(sgn).cast("long").alias("s_stat"),
            F.count("*").cast("long").alias("n_pairs"),
        )
    )
    sizes = purch.groupBy("user_id").agg(F.count("*").cast("long").alias("n_gaps"))
    cadence = (
        F.when(F.col("s_stat") > 0, "slowing")
        .when(F.col("s_stat") < 0, "accelerating")
        .otherwise("flat")
    )
    return (
        sizes.join(pairs, "user_id")
        .filter(F.col("n_gaps") >= 5)
        .select("user_id", "n_gaps", "s_stat", "n_pairs", cadence.alias("cadence"))
        .orderBy("user_id")
    )



@register(
    "modal_hour_users",
    """
WITH hours AS (
  SELECT user_id, cast(hour(ts) as int) AS h, cast(count(*) as bigint) AS n
  FROM events GROUP BY user_id, hour(ts)
), ranked AS (
  SELECT user_id, h, n,
         row_number() OVER (PARTITION BY user_id ORDER BY n DESC, h ASC) AS rn,
         sum(n) OVER (PARTITION BY user_id) AS total,
         count(*) OVER (PARTITION BY user_id) AS n_hours
  FROM hours
)
SELECT user_id, cast(h as bigint) AS modal_hour, n AS modal_events,
       cast(total as bigint) AS total_events,
       cast(n_hours as bigint) AS distinct_hours,
       cast(n * 1000000 // total as bigint) AS concentration_micro
FROM ranked WHERE rn = 1 ORDER BY user_id
""",
)
def modal_hour_users(spark, sf_dir):
    """Habitual-hour fingerprint: each user's modal hour-of-day, its
    share of their activity (concentration_micro), and how many
    distinct hours they touch — a human spreads over 8–16 waking
    hours (concentration ≪ 10⁶); a cron-driven bot lives in one
    (→10⁶ with distinct_hours ≈ 1), making this the cheapest
    behavioral-liveness feature next to bot_regularity_users (gap
    variance) and burstiness (gap shape). hour() of a NTZ timestamp
    is identical in both engines; everything else is counting and one
    floor ratio. Scale shape: one (user, hour) hash agg + one user
    window for the deterministic argmax."""
    e = load(spark, sf_dir, "events")
    hours = e.groupBy("user_id", F.hour("ts").cast("int").alias("h")).agg(
        F.count("*").cast("long").alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), F.asc("h"))
    wp = Window.partitionBy("user_id")
    ranked = hours.select(
        "user_id",
        "h",
        "n",
        F.row_number().over(w).alias("rn"),
        F.sum("n").over(wp).alias("total"),
        F.count("*").over(wp).alias("n_hours"),
    )
    return (
        ranked.filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("h").cast("long").alias("modal_hour"),
            F.col("n").alias("modal_events"),
            F.col("total").cast("long").alias("total_events"),
            F.col("n_hours").cast("long").alias("distinct_hours"),
            F.expr("cast(n * 1000000 div total as bigint)").alias(
                "concentration_micro"
            ),
        )
        .orderBy("user_id")
    )



@register(
    "resurrection_users",
    """
WITH seq AS (
  SELECT user_id,
         cast(cast(ts as date) - lag(cast(ts as date))
              OVER (PARTITION BY user_id ORDER BY ts, event_id) as bigint) AS day_gap
  FROM events
)
SELECT user_id,
       cast(count(*) as bigint) AS n_transitions,
       cast(count(*) FILTER (WHERE day_gap >= 3) as bigint) AS n_resurrections,
       cast(max(day_gap) as bigint) AS longest_dormancy_days
FROM seq WHERE day_gap IS NOT NULL
GROUP BY user_id
HAVING count(*) FILTER (WHERE day_gap >= 3) > 0
ORDER BY user_id
""",
)
def resurrection_users(spark, sf_dir):
    """Resurrection census: users who went dormant ≥3 days and CAME
    BACK — how many times, and their longest survived dormancy — the
    lifecycle cohort that churn models systematically misclassify as
    dead (and the reason 'days since last seen' alone is a bad churn
    label; kaplan_meier_gaps fits the survival curve, this extracts
    the resurrected population itself). One lag window over day-
    granulated timestamps, integer day gaps, conditional counting.
    Scale shape: one user-partitioned window + one hash agg — shuffle
    ∝ events once."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lag(F.to_date("ts")).over(w))
        .cast("long")
        .alias("day_gap"),
    ).filter(F.col("day_gap").isNotNull())
    return (
        seq.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_transitions"),
            F.count(F.when(F.col("day_gap") >= 3, 1)).cast("long").alias(
                "n_resurrections"
            ),
            F.max("day_gap").cast("long").alias("longest_dormancy_days"),
        )
        .filter(F.col("n_resurrections") > 0)
        .orderBy("user_id")
    )



@register(
    "isotonic_daily",
    f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // 1000000 // 86400 AS d,
         cast(sum(cast(round(cast(o_totalprice as {DEC}) * 100) as bigint)) as bigint)
           AS x
  FROM orders WHERE o_orderdate >= TIMESTAMP '2001-02-01' GROUP BY d
), ord AS (
  SELECT d, x, cast(row_number() OVER (ORDER BY d) as bigint) AS i,
         cast(sum(x) OVER (ORDER BY d) as bigint) AS cs
  FROM daily
), seg AS (
  SELECT a.i AS ai, b.i AS bi,
         cast(((b.cs - a.cs + a.x) * 1000000) // (b.i - a.i + 1) as bigint) AS m
  FROM ord a JOIN ord b ON b.i >= a.i
), inner_min AS (
  SELECT o.i AS k, s.ai, min(s.m) AS mn
  FROM seg s JOIN ord o ON s.ai <= o.i AND s.bi >= o.i
  GROUP BY o.i, s.ai
), fit AS (SELECT k, cast(max(mn) as bigint) AS iso_micro FROM inner_min GROUP BY k)
SELECT ord.d AS day, ord.x AS x_cents, fit.iso_micro
FROM ord JOIN fit ON ord.i = fit.k ORDER BY day
""",
)
def isotonic_daily(spark, sf_dir):
    """Isotonic (monotone nondecreasing) L2 fit of the daily revenue
    series via the exact minimax closed form fitted[k] = max_{{i<=k}}
    min_{{j>=k}} mean(x[i..j]) — the PAVA result without PAVA's
    sequential pooling, so it parallelizes as two bounded band joins
    over the tiny day dim AND admits a full SQL oracle — the
    oracle-checkable complement of isotonic_calibration_sources
    (operators/isotonic.py), whose applyInPandas PAVA is the
    many-groups production path but is rows-only by nature (ols_trend
    fits a line, this fits the best monotone staircase — the shape-
    constrained trend test). Segment means are micro-floor ticks
    ((sum*10^6) // len) so max-of-min stays integer-exact and still
    nondecreasing (the i/j range-inclusion argument survives the
    floor). Bounded to the trailing ~180-day tail of the calendar so
    the O(days^2) segment table and O(days^3) bounded triple join stay
    a fixed-size dim; the orders scan itself is one pushed-filter hash
    agg."""
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-02-01").cast("timestamp")
    )
    daily = o.groupBy(
        F.floor(F.unix_timestamp("o_orderdate") / F.lit(86400)).cast("long").alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    daily = daily.localCheckpoint()
    w = Window.orderBy("d")
    ordd = daily.select(
        "d",
        "x",
        F.row_number().over(w).cast("long").alias("i"),
        F.sum("x").over(w).cast("long").alias("cs"),
    ).localCheckpoint()
    a = ordd.select(
        F.col("i").alias("ai"), F.col("x").alias("ax"), F.col("cs").alias("acs")
    )
    b = ordd.select(F.col("i").alias("bi"), F.col("cs").alias("bcs"))
    seg = a.join(b, F.col("bi") >= F.col("ai")).select(
        "ai",
        "bi",
        F.expr("cast(((bcs - acs + ax) * 1000000L) div (bi - ai + 1) as bigint)").alias(
            "m"
        ),
    )
    ks = ordd.select(F.col("i").alias("k"))
    inner = (
        seg.join(ks, (F.col("ai") <= F.col("k")) & (F.col("bi") >= F.col("k")))
        .groupBy("k", "ai")
        .agg(F.min("m").alias("mn"))
    )
    fit = inner.groupBy("k").agg(F.max("mn").cast("long").alias("iso_micro"))
    return (
        ordd.join(fit, ordd.i == fit.k)
        .select(F.col("d").alias("day"), F.col("x").alias("x_cents"), "iso_micro")
        .orderBy("day")
    )



@register(
    "ship_lag_sla_suppliers",
    """
WITH lag AS (
  SELECT l.l_suppkey AS suppkey,
         cast(cast(l.l_shipdate as date) - cast(o.o_orderdate as date) as bigint) AS d,
         l.l_orderkey, l.l_linenumber
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), rk AS (
  SELECT suppkey, d,
         cast(row_number() OVER (PARTITION BY suppkey
                                 ORDER BY d ASC, l_orderkey ASC, l_linenumber ASC) as bigint) AS rn,
         cast(count(*) OVER (PARTITION BY suppkey) as bigint) AS n
  FROM lag
)
SELECT suppkey, any_value(n) AS n_items,
       cast(max(CASE WHEN rn = (n + 1) // 2 THEN d END) as bigint) AS p50_days,
       cast(max(CASE WHEN rn = (9 * n + 9) // 10 THEN d END) as bigint) AS p90_days,
       cast(count(CASE WHEN d > 365 THEN 1 END) as bigint) AS n_breach,
       cast((count(CASE WHEN d > 365 THEN 1 END) * 1000000) // any_value(n) as bigint)
         AS breach_q
FROM rk GROUP BY suppkey ORDER BY suppkey
""",
)
def ship_lag_sla_suppliers(spark, sf_dir):
    """Supplier SLA scorecard on order→ship lag: EXACT p50/p90 order
    statistics (rank ⌈n/2⌉ / ⌈0.9n⌉ via a deterministic per-supplier
    window — no interpolation, no approx sketch, sign-safe for the
    negative lags this calendar contains) plus the >365-day breach
    count and micro rate — the procurement analog of wilson_host
    _ranking's success rates, and the exact-quantile-at-scale pattern:
    one partitioned sort window beats collecting per-group arrays.
    Scale shape: one equi-join on orderkey (both sides shuffle once),
    one supplier window, one hash agg."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    lag = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("l_suppkey").alias("suppkey"),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        .cast("long")
        .alias("d"),
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.partitionBy("suppkey").orderBy(
        F.col("d").asc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()
    )
    wn = Window.partitionBy("suppkey")
    rk = lag.select(
        "suppkey",
        "d",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count("*").over(wn).cast("long").alias("n"),
    )
    return (
        rk.groupBy("suppkey")
        .agg(
            F.expr("any_value(n)").alias("n_items"),
            F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("d")))
            .cast("long")
            .alias("p50_days"),
            F.max(F.when(F.col("rn") == F.expr("(9 * n + 9) div 10"), F.col("d")))
            .cast("long")
            .alias("p90_days"),
            F.count(F.when(F.col("d") > 365, 1)).cast("long").alias("n_breach"),
            F.expr(
                "cast((count(CASE WHEN d > 365 THEN 1 END) * 1000000)"
                " div any_value(n) as bigint)"
            ).alias("breach_q"),
        )
        .orderBy("suppkey")
    )



@register(
    "mase_backtest_daily",
    f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // 1000000 // 86400 AS d,
         cast(sum(cast(round(cast(o_totalprice as {DEC}) * 100) as bigint)) as bigint) AS x
  FROM orders GROUP BY d
), lagd AS (
  SELECT a.d, a.x, s.x AS x7, n.x AS x1
  FROM daily a JOIN daily s ON s.d = a.d - 7 JOIN daily n ON n.d = a.d - 1
)
SELECT d // 30 AS period,
       cast(count(*) as bigint) AS n_days,
       cast(sum(abs(x - x7)) as bigint) AS sae_seasonal,
       cast(sum(abs(x - x1)) as bigint) AS sae_naive,
       cast((sum(abs(x - x7)) * 1000000) // sum(abs(x - x1)) as bigint) AS mase_q
FROM lagd GROUP BY period ORDER BY period
""",
)
def mase_backtest_daily(spark, sf_dir):
    """Seasonal-naive forecast backtest with the MASE ratio — the
    forecasting-evaluation op (Hyndman's scale-free standard) that
    every demand-planning pipeline runs before trusting a model:
    predict each day's revenue with the value 7 days earlier and
    scale its absolute error by the one-day-naive error, per 30-day
    period. mase_q < 10⁶ means weekly seasonality genuinely predicts
    (holt/seasonal_decompose FIT the structure; this scores whether
    exploiting it beats the dumbest baseline out-of-sample). Errors
    are exact |cents| integers; the ratio is one nonneg floor. Scale
    shape: one day hash agg + two calendar equi-joins on the day
    dim."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr("unix_timestamp(o_orderdate) div 86400").alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("x")
    ).localCheckpoint()
    s = daily.select(F.col("d").alias("sd"), F.col("x").alias("x7"))
    n1 = daily.select(F.col("d").alias("nd"), F.col("x").alias("x1"))
    lagd = daily.join(s, F.col("sd") == F.col("d") - 7).join(
        n1, F.col("nd") == F.col("d") - 1
    )
    return (
        lagd.groupBy(F.expr("d div 30").alias("period"))
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.sum(F.abs(F.col("x") - F.col("x7"))).cast("long").alias("sae_seasonal"),
            F.sum(F.abs(F.col("x") - F.col("x1"))).cast("long").alias("sae_naive"),
            F.expr(
                "cast((sum(abs(x - x7)) * 1000000) div sum(abs(x - x1)) as bigint)"
            ).alias("mase_q"),
        )
        .orderBy("period")
    )



@register(
    "session_gap_sweep",
    """
WITH seq AS (
  SELECT user_id,
         epoch_us(ts) // 1000000
           - lag(epoch_us(ts) // 1000000)
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
  FROM events
), base AS (
  SELECT cast(count(DISTINCT user_id) as bigint) AS n_users,
         cast(count(*) as bigint) AS n_events
  FROM events
), gaps(t) AS (VALUES (300), (900), (1800), (3600))
SELECT cast(g.t as bigint) AS gap_seconds,
       cast(any_value(b.n_users)
            + count(CASE WHEN s.gap_s > g.t THEN 1 END) as bigint) AS n_sessions,
       cast((any_value(b.n_events) * 1000)
            // (any_value(b.n_users) + count(CASE WHEN s.gap_s > g.t THEN 1 END))
            as bigint) AS events_per_session_milli
FROM gaps g CROSS JOIN base b LEFT JOIN seq s ON s.gap_s IS NOT NULL
GROUP BY g.t ORDER BY gap_seconds
""",
)
def session_gap_sweep(spark, sf_dir):
    """Sessionization-threshold sensitivity sweep: session count and
    mean session length under 5/15/30/60-minute inactivity gaps, in
    one pass — the forking-path audit for the OTHER most-arbitrary
    analytics constant (conversion_window_sweep exposes the
    attribution window; every 'sessions' KPI silently bakes in this
    one). n_sessions(T) = users + boundary gaps > T needs no per-T
    re-sessionization — one lag window computes every gap once and
    each threshold is a conditional count against the 4-row literal
    dim. A steep curve between 15 and 60 minutes means 'sessions
    rose' headlines are threshold artifacts. Integer seconds,
    integer floors."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        (
            F.unix_timestamp("ts") - F.lag(F.unix_timestamp("ts")).over(w)
        ).alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    base = e.agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.count("*").cast("long").alias("n_events"),
    )
    gaps = spark.range(1).select(
        F.explode(
            F.array(F.lit(300), F.lit(900), F.lit(1800), F.lit(3600))
        ).alias("t")
    )
    return (
        gaps.crossJoin(F.broadcast(base))
        .crossJoin(seq)
        .groupBy("t")
        .agg(
            F.expr(
                "cast(any_value(n_users)"
                " + count(CASE WHEN gap_s > t THEN 1 END) as bigint)"
            ).alias("n_sessions"),
            F.expr(
                "cast((any_value(n_events) * 1000)"
                " div (any_value(n_users) + count(CASE WHEN gap_s > t THEN 1 END))"
                " as bigint)"
            ).alias("events_per_session_milli"),
        )
        .select(
            F.col("t").cast("long").alias("gap_seconds"),
            "n_sessions",
            "events_per_session_milli",
        )
        .orderBy("gap_seconds")
    )



@register(
    "rolling_ols_daily",
    f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // 1000000 // 86400 AS d,
         cast(sum(cast(round(cast(o_totalprice as {DEC}) * 100) as bigint)) as bigint) AS x
  FROM orders GROUP BY d
), nb AS (
  SELECT a.d,
         cast(count(*) as bigint) AS n,
         cast(sum(b.d - a.d + 13) as bigint) AS st,
         cast(sum(b.x) as bigint) AS sx,
         cast(sum((b.d - a.d + 13) * (b.d - a.d + 13)) as bigint) AS stt,
         cast(sum((b.d - a.d + 13) * b.x) as bigint) AS stx
  FROM daily a JOIN daily b ON b.d BETWEEN a.d - 13 AND a.d
  GROUP BY a.d
)
SELECT d AS day, n AS n_days,
       cast(n * stx - st * sx as bigint) AS slope_num,
       cast(n * stt - st * st as bigint) AS slope_den,
       CASE WHEN n * stt - st * st = 0 THEN 0.0
            ELSE cast(n * stx - st * sx as double)
                 / cast(n * stt - st * st as double) END AS slope_cents_per_day
FROM nb WHERE n >= 7 ORDER BY day
""",
)
def rolling_ols_daily(spark, sf_dir):
    """Rolling 14-day OLS revenue slope — the trend dial an ops
    dashboard shows next to the EWMA level (ewma_smooth answers
    'where is it', this answers 'which way and how fast', and
    crossing zero is the actionable event): per day, the least-squares
    slope over the trailing 14-day window with the time index
    re-based inside the window (t = offset 0..13, so every moment is
    a small nonneg int and the sufficient statistics are exact
    int64). The signed slope ships as the exact (num, den) integer
    PAIR — no signed floor division anywhere — plus one IEEE double
    quotient in identical textual order. Windows with < 7 days of
    data are suppressed. Scale shape: one day agg + a <= 14× band
    self-join on the day dim (ewma sibling)."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr("unix_timestamp(o_orderdate) div 86400").alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("x")
    ).localCheckpoint()
    b = daily.select(F.col("d").alias("bd"), F.col("x").alias("bx"))
    t = F.col("bd") - F.col("d") + 13
    nb = (
        daily.join(b, (F.col("bd") >= F.col("d") - 13) & (F.col("bd") <= F.col("d")))
        .groupBy("d")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(t).cast("long").alias("st"),
            F.sum("bx").cast("long").alias("sx"),
            F.sum(t * t).cast("long").alias("stt"),
            F.sum(t * F.col("bx")).cast("long").alias("stx"),
        )
    )
    num = F.col("n") * F.col("stx") - F.col("st") * F.col("sx")
    den = F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    return (
        nb.filter(F.col("n") >= 7)
        .select(
            F.col("d").alias("day"),
            F.col("n").alias("n_days"),
            num.cast("long").alias("slope_num"),
            den.cast("long").alias("slope_den"),
            F.when(den == 0, F.lit(0.0))
            .otherwise(num.cast("double") / den.cast("double"))
            .alias("slope_cents_per_day"),
        )
        .orderBy("day")
    )



@register(
    "sn_scale_daily",
    f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // 1000000 // 86400 AS d,
         cast(sum(cast(round(cast(o_totalprice as {DEC}) * 100) as bigint)) as bigint) AS x
  FROM orders WHERE o_orderdate >= TIMESTAMP '2001-02-01' GROUP BY d
), n AS (SELECT cast(count(*) as bigint) AS n FROM daily),
inner_med AS (
  SELECT a.d, cast(abs(a.x - b.x) as bigint) AS g,
         row_number() OVER (PARTITION BY a.d ORDER BY abs(a.x - b.x) ASC, b.d ASC) AS rn
  FROM daily a JOIN daily b ON b.d != a.d
), im AS (
  SELECT i.d, max(i.g) AS med_i
  FROM inner_med i CROSS JOIN n
  WHERE i.rn = (n.n - 1 + 2) // 2
  GROUP BY i.d
), outer_med AS (
  SELECT med_i, row_number() OVER (ORDER BY med_i ASC, d ASC) AS rn FROM im
)
SELECT cast(any_value(n.n) as bigint) AS n_days,
       cast(max(CASE WHEN o.rn = (n.n + 1) // 2 THEN o.med_i END) as bigint)
         AS sn_cents
FROM outer_med o CROSS JOIN n GROUP BY n.n
""",
)
def sn_scale_daily(spark, sf_dir):
    """Rousseeuw-Croux Sₙ robust scale of daily revenue — the scale
    estimator that beats MAD where MAD fails (Sₙ = med_i med_j |x_i −
    x_j| has 58% efficiency vs MAD's 37% and needs no location
    estimate, so it stays honest on skewed revenue where MAD-around-
    median understates spread): the inner per-day median of gaps to
    every other day, then the outer median of those — both EXACT
    order statistics with deterministic ties (robust_outliers uses
    MAD; this is the upgrade the same alert threshold should use).
    Bounded to the trailing ~180-day window (isotonic sibling) so the
    O(days²) gap table is a fixed dim. One band self-join + two rank
    windows + the 1-row count anchor."""
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-02-01").cast("timestamp")
    )
    daily = o.groupBy(
        F.expr("unix_timestamp(o_orderdate) div 86400").alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("x")
    ).localCheckpoint()
    nn = daily.agg(F.count("*").cast("long").alias("n"))
    b = daily.select(F.col("d").alias("bd"), F.col("x").alias("bx"))
    gaps = daily.join(b, F.col("bd") != F.col("d")).select(
        "d",
        F.abs(F.col("x") - F.col("bx")).cast("long").alias("g"),
        F.col("bd"),
    )
    wi = Window.partitionBy("d").orderBy(F.col("g").asc(), F.col("bd").asc())
    im = (
        gaps.withColumn("rn", F.row_number().over(wi))
        .crossJoin(F.broadcast(nn))
        .filter(F.col("rn") == F.expr("(n - 1 + 2) div 2"))
        .groupBy("d")
        .agg(F.max("g").alias("med_i"))
    )
    wo = Window.orderBy(F.col("med_i").asc(), F.col("d").asc())
    return (
        im.withColumn("rn", F.row_number().over(wo))
        .crossJoin(F.broadcast(nn))
        .groupBy("n")
        .agg(
            F.expr("cast(any_value(n) as bigint)").alias("n_days"),
            F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("med_i")))
            .cast("long")
            .alias("sn_cents"),
        )
        .select("n_days", "sn_cents")
    )



@register(
    "daily_envelope_orders",
    f"""
WITH o AS (
  SELECT epoch_us(o_orderdate) // 1000000 // 86400 AS d,
         cast(round(cast(o_totalprice as {DEC}) * 100) as bigint) AS cents,
         o_orderkey
  FROM orders WHERE o_orderdate >= TIMESTAMP '2001-02-01'
), rk AS (
  SELECT d, cents,
         cast(row_number() OVER (PARTITION BY d ORDER BY cents ASC, o_orderkey ASC)
              as bigint) AS rn,
         cast(count(*) OVER (PARTITION BY d) as bigint) AS n
  FROM o
)
SELECT d AS day, any_value(n) AS n_orders,
       cast(max(CASE WHEN rn = (n + 9) // 10 THEN cents END) as bigint) AS p10_c,
       cast(max(CASE WHEN rn = (n + 1) // 2 THEN cents END) as bigint) AS p50_c,
       cast(max(CASE WHEN rn = (9 * n + 9) // 10 THEN cents END) as bigint) AS p90_c
FROM rk GROUP BY d ORDER BY day
""",
)
def daily_envelope_orders(spark, sf_dir):
    """Daily order-value envelope: exact P10/P50/P90 cents per day —
    the percentile band chart every ops dashboard draws around its
    median line, computed as true order statistics (rank ⌈n/10⌉,
    ⌈n/2⌉, ⌈9n/10⌉ with deterministic ties) rather than the
    interpolated approximations dashboards silently substitute
    (percentile_order_value proves the global quantile;
    ship_lag_sla the per-group pattern; this is the per-DAY time
    series of it, bounded to the trailing ~180-day window). A
    widening P90−P10 band under a flat median is the dispersion
    alarm means-based monitoring misses. One partitioned sort window
    + one day agg."""
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-02-01").cast("timestamp")
    )
    rows = o.select(
        F.expr("unix_timestamp(o_orderdate) div 86400").alias("d"),
        F.round(F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    w = Window.partitionBy("d").orderBy(F.col("cents").asc(), F.col("o_orderkey").asc())
    wn = Window.partitionBy("d")
    rk = rows.select(
        "d",
        "cents",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count("*").over(wn).cast("long").alias("n"),
    )

    def at(rank_expr):
        return F.max(F.when(F.col("rn") == F.expr(rank_expr), F.col("cents"))).cast(
            "long"
        )

    return (
        rk.groupBy(F.col("d").alias("day"))
        .agg(
            F.expr("any_value(n)").alias("n_orders"),
            at("(n + 9) div 10").alias("p10_c"),
            at("(n + 1) div 2").alias("p50_c"),
            at("(9 * n + 9) div 10").alias("p90_c"),
        )
        .orderBy("day")
    )



@register(
    "variance_ratio_daily",
    f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // 1000000 // 86400 AS d,
         cast(sum(cast(round(cast(o_totalprice as {DEC}) * 100) as bigint)) as bigint) AS x
  FROM orders GROUP BY d
), qs(q) AS (VALUES (2), (4), (8)),
r1 AS (
  SELECT a.d, b.x - a.x AS r
  FROM daily a JOIN daily b ON b.d = a.d + 1
), m1 AS (
  SELECT cast(count(*) as bigint) AS n1,
         cast(sum(r) as bigint) AS s1,
         cast(sum(cast(r as HUGEINT) * r) as HUGEINT) AS q1
  FROM r1
), rq AS (
  SELECT qs.q, b.x - a.x AS r
  FROM qs JOIN daily a ON true JOIN daily b ON b.d = a.d + qs.q
), mq AS (
  SELECT q, cast(count(*) as bigint) AS nq,
         cast(sum(r) as bigint) AS sq,
         cast(sum(cast(r as HUGEINT) * r) as HUGEINT) AS qq
  FROM rq GROUP BY q
)
SELECT cast(m.q as bigint) AS lag_days, m.nq AS n_obs,
       cast((m.nq * m.qq - cast(m.sq as HUGEINT) * m.sq) as double)
         / cast(m.nq as double) / cast(m.nq as double) AS var_q,
       cast((m1.n1 * m1.q1 - cast(m1.s1 as HUGEINT) * m1.s1) as double)
         / cast(m1.n1 as double) / cast(m1.n1 as double) AS var_1,
       (cast((m.nq * m.qq - cast(m.sq as HUGEINT) * m.sq) as double)
          / cast(m.nq as double) / cast(m.nq as double))
       / (cast(m.q as double)
          * (cast((m1.n1 * m1.q1 - cast(m1.s1 as HUGEINT) * m1.s1) as double)
             / cast(m1.n1 as double) / cast(m1.n1 as double))) AS vr
FROM mq m CROSS JOIN m1 ORDER BY lag_days
""",
)
def variance_ratio_daily(spark, sf_dir):
    """Lo-MacKinlay variance-ratio test on daily revenue: VR(q) =
    Var(q-day change)/(q·Var(1-day change)) at q = 2, 4, 8 — the
    random-walk diagnostic from econometrics: VR ≈ 1 means changes
    are uncorrelated (forecast beyond the drift is futile), VR > 1
    means momentum (trend-following works — and rolling_ols will
    find it), VR < 1 means mean reversion (spikes self-correct, so
    alert on LEVEL not CHANGE). rescaled_range fits the Hurst
    exponent from range growth; VR is the moment-ratio complement
    with a known null. Differences are exact cents; each variance's
    sufficient statistics are exact HUGEINT/decimal38 moments; the
    three ratios are fixed-order doubles over exact numerators.
    Day-dim band joins + 1-row anchors only."""
    dec = "decimal(38,0)"
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr("unix_timestamp(o_orderdate) div 86400").alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("x")
    ).localCheckpoint()
    b = daily.select(F.col("d").alias("bd"), F.col("x").alias("bx"))

    def moments(df, rcol):
        return df.agg(
            F.count("*").cast("long").alias("n"),
            F.sum(rcol).cast("long").alias("s"),
            F.sum(F.col("r").cast(dec) * F.col("r")).cast(dec).alias("q2"),
        )

    r1 = daily.join(b, F.col("bd") == F.col("d") + 1).select(
        (F.col("bx") - F.col("x")).alias("r")
    )
    m1 = moments(r1, "r").select(
        F.col("n").alias("n1"), F.col("s").alias("s1"), F.col("q2").alias("q1m")
    )
    qs = spark.range(1).select(
        F.explode(F.array(F.lit(2), F.lit(4), F.lit(8))).alias("q")
    )
    rq = (
        daily.crossJoin(F.broadcast(qs))
        .join(b, F.col("bd") == F.col("d") + F.col("q"))
        .select("q", (F.col("bx") - F.col("x")).alias("r"))
    )
    mq = rq.groupBy("q").agg(
        F.count("*").cast("long").alias("nq"),
        F.sum("r").cast("long").alias("sq"),
        F.sum(F.col("r").cast(dec) * F.col("r")).cast(dec).alias("qq"),
    )
    var_q = F.expr(
        f"cast((nq * qq - cast(sq as {dec}) * sq) as double)"
        " / cast(nq as double) / cast(nq as double)"
    )
    var_1 = F.expr(
        f"cast((n1 * q1m - cast(s1 as {dec}) * s1) as double)"
        " / cast(n1 as double) / cast(n1 as double)"
    )
    return (
        mq.crossJoin(F.broadcast(m1))
        .select(
            F.col("q").cast("long").alias("lag_days"),
            F.col("nq").alias("n_obs"),
            var_q.alias("var_q"),
            var_1.alias("var_1"),
            (var_q / (F.col("q").cast("double") * var_1)).alias("vr"),
        )
        .orderBy("lag_days")
    )



@register(
    "turning_points_daily",
    f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // 1000000 // 86400 AS d,
         cast(sum(cast(round(cast(o_totalprice as {DEC}) * 100) as bigint)) as bigint) AS x
  FROM orders GROUP BY d
), tp AS (
  SELECT a.d,
         CASE WHEN (a.x - p.x) * (n.x - a.x) < 0 THEN 1 ELSE 0 END AS is_turn
  FROM daily a JOIN daily p ON p.d = a.d - 1 JOIN daily n ON n.d = a.d + 1
)
SELECT cast(count(*) + 2 as bigint) AS n_days,
       cast(sum(is_turn) as bigint) AS n_turns,
       (cast(sum(is_turn) as double) - 2.0 * cast(count(*) as double) / 3.0)
         / sqrt((16.0 * cast(count(*) + 2 as double) - 29.0) / 90.0) AS z_stat
FROM tp
""",
)
def turning_points_daily(spark, sf_dir):
    """Turning-point test of the daily revenue series: count local
    extrema (strict sign change of consecutive differences) against
    the iid expectation 2(n−2)/3 with variance (16n−29)/90 — the
    classical randomness test whose TWO failure directions both mean
    something (too few turns = trend/momentum, matching a
    variance_ratio > 1; too many = high-frequency alternation, the
    oscillation signature of over-correction or day-boundary
    artifacts). runs_test_users tests sign runs around a level; this
    tests the SHAPE of the path itself. Turn counts are exact
    integers via two calendar equi-joins; z is one fixed-order float
    expression. Day-dim only."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr("unix_timestamp(o_orderdate) div 86400").alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("x")
    ).localCheckpoint()
    p = daily.select(F.col("d").alias("pd"), F.col("x").alias("px"))
    n1 = daily.select(F.col("d").alias("nd"), F.col("x").alias("nx"))
    tp = (
        daily.join(p, F.col("pd") == F.col("d") - 1)
        .join(n1, F.col("nd") == F.col("d") + 1)
        .select(
            F.when(
                (F.col("x") - F.col("px")) * (F.col("nx") - F.col("x")) < 0, 1
            )
            .otherwise(0)
            .alias("is_turn")
        )
    )
    return tp.agg(
        (F.count("*") + 2).cast("long").alias("n_days"),
        F.sum("is_turn").cast("long").alias("n_turns"),
        F.expr(
            "(cast(sum(is_turn) as double) - 2.0 * cast(count(*) as double) / 3.0)"
            " / sqrt((16.0 * cast(count(*) + 2 as double) - 29.0) / 90.0)"
        ).alias("z_stat"),
    )



@register(
    "anomaly_ensemble_daily",
    f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // 1000000 // 86400 AS d,
         cast(sum(cast(round(cast(o_totalprice as {DEC}) * 100) as bigint)) as bigint) AS x
  FROM orders GROUP BY d
), nb AS (
  SELECT a.d, a.x,
         cast(sum(b.x) as bigint) AS wsum, cast(count(*) as bigint) AS wn
  FROM daily a JOIN daily b ON b.d BETWEEN a.d - 7 AND a.d - 1
  GROUP BY a.d, a.x
), dw AS (
  SELECT d % 7 AS dow, cast(sum(x) as bigint) AS dsum, cast(count(*) as bigint) AS dn
  FROM daily GROUP BY dow
), med AS (
  SELECT d, x FROM (
    SELECT d, x, row_number() OVER (ORDER BY x ASC, d ASC) AS rn,
           count(*) OVER () AS n
    FROM daily) WHERE rn = (n + 1) // 2
), votes AS (
  SELECT nb.d, nb.x,
         CASE WHEN nb.x * nb.wn * 10 > nb.wsum * 15 THEN 1 ELSE 0 END AS v_trail,
         CASE WHEN nb.x * dw.dn * 10 > dw.dsum * 15 THEN 1 ELSE 0 END AS v_dow,
         CASE WHEN nb.x * 10 > (SELECT x FROM med) * 18 THEN 1 ELSE 0 END AS v_med
  FROM nb JOIN dw ON nb.d % 7 = dw.dow
)
SELECT d AS day, x AS x_cents,
       cast(v_trail + v_dow + v_med as bigint) AS votes,
       v_trail, v_dow, v_med,
       CASE WHEN v_trail + v_dow + v_med >= 2 THEN 1 ELSE 0 END AS is_anomaly
FROM votes WHERE v_trail + v_dow + v_med >= 1 ORDER BY day
""",
)
def anomaly_ensemble_daily(spark, sf_dir):
    """Ensemble anomaly voting — how production monitoring actually
    ships (one detector pages too much; the 2-of-3 vote is the
    standard precision fix): three cheap, orthogonal detectors on
    daily revenue — 1.5× the trailing-7-day mean, 1.5× the
    same-weekday mean, 1.8× the global median (all cross-multiplied
    integer comparisons, exact order-statistic median) — each votes,
    and days with ≥ 2 votes page. Single-signal days are kept in the
    output (votes = 1) precisely because they're the ones the
    ensemble SUPPRESSED — the audit trail for tuning each detector.
    hampel/ewma/dow_baseline each exist alone; this is their
    composition contract. Day-dim band joins + two anchors."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr("unix_timestamp(o_orderdate) div 86400").alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("x")
    ).localCheckpoint()
    b = daily.select(F.col("d").alias("bd"), F.col("x").alias("bx"))
    nb = (
        daily.join(
            b, (F.col("bd") >= F.col("d") - 7) & (F.col("bd") <= F.col("d") - 1)
        )
        .groupBy("d", "x")
        .agg(
            F.sum("bx").cast("long").alias("wsum"),
            F.count("*").cast("long").alias("wn"),
        )
    )
    dw = daily.groupBy((F.col("d") % 7).alias("dow")).agg(
        F.sum("x").cast("long").alias("dsum"), F.count("*").cast("long").alias("dn")
    )
    wmed = Window.orderBy(F.col("x").asc(), F.col("d").asc())
    med = (
        daily.select(
            "x",
            F.row_number().over(wmed).alias("rn"),
            F.count("*").over(Window.partitionBy()).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select(F.col("x").alias("medx"))
    )
    votes = (
        nb.join(dw, nb.d % 7 == dw.dow)
        .crossJoin(F.broadcast(med))
        .select(
            "d",
            "x",
            F.when(F.col("x") * F.col("wn") * 10 > F.col("wsum") * 15, 1)
            .otherwise(0)
            .alias("v_trail"),
            F.when(F.col("x") * F.col("dn") * 10 > F.col("dsum") * 15, 1)
            .otherwise(0)
            .alias("v_dow"),
            F.when(F.col("x") * 10 > F.col("medx") * 18, 1).otherwise(0).alias("v_med"),
        )
    )
    tot = F.col("v_trail") + F.col("v_dow") + F.col("v_med")
    return (
        votes.filter(tot >= 1)
        .select(
            F.col("d").alias("day"),
            F.col("x").alias("x_cents"),
            tot.cast("long").alias("votes"),
            "v_trail",
            "v_dow",
            "v_med",
            F.when(tot >= 2, 1).otherwise(0).alias("is_anomaly"),
        )
        .orderBy("day")
    )



@register(
    "lifecycle_states_weekly",
    """
WITH uw AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 1000000 // 604800 AS wk FROM events
), fw AS (SELECT user_id, cast(min(wk) as bigint) AS first_wk FROM uw GROUP BY user_id),
st AS (
  SELECT a.wk, a.user_id,
         CASE WHEN a.wk = f.first_wk THEN 'new'
              WHEN p.user_id IS NOT NULL THEN 'retained'
              ELSE 'resurrected' END AS state
  FROM uw a JOIN fw f ON a.user_id = f.user_id
  LEFT JOIN uw p ON p.user_id = a.user_id AND p.wk = a.wk - 1
), ch AS (
  SELECT a.wk + 1 AS wk, cast(count(*) as bigint) AS n_churned
  FROM uw a LEFT JOIN uw n ON n.user_id = a.user_id AND n.wk = a.wk + 1
  WHERE n.user_id IS NULL GROUP BY a.wk + 1
)
SELECT s.wk AS week,
       cast(count(CASE WHEN state = 'new' THEN 1 END) as bigint) AS n_new,
       cast(count(CASE WHEN state = 'retained' THEN 1 END) as bigint) AS n_retained,
       cast(count(CASE WHEN state = 'resurrected' THEN 1 END) as bigint) AS n_resurrected,
       cast(coalesce(any_value(ch.n_churned), 0) as bigint) AS n_churned_in,
       cast(count(*) as bigint) AS n_active
FROM st s LEFT JOIN ch ON ch.wk = s.wk
GROUP BY s.wk ORDER BY week
""",
)
def lifecycle_states_weekly(spark, sf_dir):
    """Growth accounting — the weekly lifecycle ledger every PM
    dashboard opens with, and an exact IDENTITY, not a metric:
    active(w) = new + retained + resurrected, and the week-over-week
    delta equals (new + resurrected) − churned(into w) — so the
    output is self-auditing (cohort_retention tracks one cohort down;
    this is the cross-sectional sum of all of them, and
    resurrection_users' comeback population appears here as a flow).
    States are pure (user, week) set algebra: first-week = new,
    active-previous-week = retained, else resurrected; churn is the
    anti-join counted into the week it's first missing. Three
    equi-joins on (user, week±1), no windows."""
    e = load(spark, sf_dir, "events")
    uw = e.select(
        "user_id", F.expr("unix_timestamp(ts) div 604800").alias("wk")
    ).distinct().localCheckpoint()
    fw = uw.groupBy("user_id").agg(F.min("wk").cast("long").alias("first_wk"))
    p = uw.select(F.col("user_id").alias("pu"), F.col("wk").alias("pwk"))
    st = (
        uw.join(fw, "user_id")
        .join(
            p,
            (F.col("pu") == F.col("user_id")) & (F.col("pwk") == F.col("wk") - 1),
            "left",
        )
        .select(
            "wk",
            F.when(F.col("wk") == F.col("first_wk"), "new")
            .when(F.col("pu").isNotNull(), "retained")
            .otherwise("resurrected")
            .alias("state"),
        )
    )
    nx = uw.select(F.col("user_id").alias("nu"), F.col("wk").alias("nwk"))
    ch = (
        uw.join(
            nx,
            (F.col("nu") == F.col("user_id")) & (F.col("nwk") == F.col("wk") + 1),
            "left",
        )
        .filter(F.col("nu").isNull())
        .groupBy((F.col("wk") + 1).alias("cwk"))
        .agg(F.count("*").cast("long").alias("n_churned"))
    )
    return (
        st.groupBy(F.col("wk").alias("week"))
        .agg(
            F.count(F.when(F.col("state") == "new", 1)).cast("long").alias("n_new"),
            F.count(F.when(F.col("state") == "retained", 1))
            .cast("long")
            .alias("n_retained"),
            F.count(F.when(F.col("state") == "resurrected", 1))
            .cast("long")
            .alias("n_resurrected"),
            F.count("*").cast("long").alias("n_active"),
        )
        .join(ch, F.col("week") == F.col("cwk"), "left")
        .select(
            "week",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce("n_churned", F.lit(0)).cast("long").alias("n_churned_in"),
            "n_active",
        )
        .orderBy("week")
    )



@register(
    "seasonal_strength_daily",
    f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // 1000000 // 86400 AS d,
         cast(sum(cast(round(cast(o_totalprice as {DEC}) * 100) as bigint)) // 100 as bigint) AS x
  FROM orders GROUP BY d
), g AS (
  SELECT d % 7 AS dow, cast(count(*) as bigint) AS n,
         cast(sum(x) as bigint) AS s,
         cast(sum(cast(x as HUGEINT) * x) as HUGEINT) AS q
  FROM daily GROUP BY dow
), t AS (
  SELECT cast(sum(n) as bigint) AS n_total,
         cast(sum(cast(s as HUGEINT)) as HUGEINT) AS s_tot,
         cast(sum(q) as HUGEINT) AS q_tot,
         cast(sum((cast(s as HUGEINT) * s * 1000) // n) as HUGEINT) AS t_sum
  FROM g
)
SELECT n_total AS n_days,
       cast(t_sum - (s_tot * s_tot * 1000) // n_total as double) AS ssb_k,
       cast(q_tot * 1000 - (s_tot * s_tot * 1000) // n_total as double) AS sst_k,
       cast(((t_sum - (s_tot * s_tot * 1000) // n_total) * 1000000)
            // greatest(q_tot * 1000 - (s_tot * s_tot * 1000) // n_total, 1)
            as bigint) AS strength_q
FROM t
""",
)
def seasonal_strength_daily(spark, sf_dir):
    """Weekly-seasonality strength: the share of daily-revenue
    variance explained by day-of-week means — SSB/SST from the exact
    anova/ICC tick discipline (HUGEINT/decimal38 moments, kilo-tick
    group terms; daily totals carried in whole DOLLARS so the
    per-group s²·10³ div n term clears int64 through sf0.1) with one
    nonneg micro floor at the end. This is the
    STL 'seasonal strength' statistic in its exact ANOVA form, and
    the single dial that arbitrates the family: high → weekday
    models (dow_baseline, mase's lag-7) will work and calendar-blind
    smoothers waste the structure; low → the week is noise and
    friedman_dow's rank test is chasing dust. One day agg + one
    7-row agg + a 1-row fold."""
    dec = "decimal(38,0)"
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr("unix_timestamp(o_orderdate) div 86400").alias("d")
    ).agg(
        F.expr(
            f"cast(sum(cast(round(cast(o_totalprice as {DEC}) * 100) as bigint))"
            " div 100 as bigint)"
        ).alias("x")
    )
    g = daily.groupBy((F.col("d") % 7).alias("dow")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x").cast(dec) * F.col("x")).cast(dec).alias("q"),
    )
    t = g.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.sum(F.col("s").cast(dec)).cast(dec).alias("s_tot"),
        F.sum("q").cast(dec).alias("q_tot"),
        F.sum(F.expr(f"(cast(s as {dec}) * s * 1000) div n").cast(dec))
        .cast(dec)
        .alias("t_sum"),
    )
    ssb = F.expr("t_sum - (s_tot * s_tot * 1000) div n_total")
    sst = F.expr("q_tot * 1000 - (s_tot * s_tot * 1000) div n_total")
    return t.select(
        F.col("n_total").alias("n_days"),
        ssb.cast("double").alias("ssb_k"),
        sst.cast("double").alias("sst_k"),
        F.expr(
            "cast(((t_sum - (s_tot * s_tot * 1000) div n_total) * 1000000)"
            " div greatest(q_tot * 1000 - (s_tot * s_tot * 1000) div n_total,"
            f" cast(1 as decimal(38,0))) as bigint)"
        ).alias("strength_q"),
    )



@register(
    "new_repeat_revenue_weekly",
    f"""
WITH o AS (
  SELECT o_custkey, epoch_us(o_orderdate) // 1000000 // 604800 AS wk,
         cast(round(cast(o_totalprice as {DEC}) * 100) as bigint) AS cents,
         o_orderkey
  FROM orders
), fo AS (
  SELECT o_custkey, cast(min(wk) as bigint) AS first_wk FROM o GROUP BY o_custkey
)
SELECT o.wk AS week,
       cast(sum(CASE WHEN o.wk = f.first_wk THEN o.cents ELSE 0 END) as bigint)
         AS new_cents,
       cast(sum(CASE WHEN o.wk > f.first_wk THEN o.cents ELSE 0 END) as bigint)
         AS repeat_cents,
       cast(count(DISTINCT CASE WHEN o.wk = f.first_wk THEN o.o_custkey END) as bigint)
         AS n_new_customers,
       cast((sum(CASE WHEN o.wk > f.first_wk THEN o.cents ELSE 0 END) * 1000000)
            // greatest(sum(o.cents), 1) as bigint) AS repeat_share_q
FROM o JOIN fo f ON o.o_custkey = f.o_custkey
GROUP BY o.wk ORDER BY week
""",
)
def new_repeat_revenue_weekly(spark, sf_dir):
    """New-vs-repeat revenue split per week — the growth-QUALITY
    ledger commerce finance closes the month with: revenue from
    customers in their FIRST week (acquisition-driven, bought with
    marketing spend) vs returning customers (retention-driven,
    compounding), plus the repeat share in micro — rising top-line
    with falling repeat_share_q is the treadmill pattern every board
    deck probes for (lifecycle_states counts the USERS through these
    states; this follows the MONEY, and cohort_ltv prices the
    difference). First-week attribution is one min-agg + one
    equi-join; exact cents throughout."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("unix_timestamp(o_orderdate) div 604800").alias("wk"),
        F.round(F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    fo = o.groupBy("o_custkey").agg(F.min("wk").cast("long").alias("first_wk"))
    return (
        o.join(fo, "o_custkey")
        .groupBy(F.col("wk").alias("week"))
        .agg(
            F.sum(F.when(F.col("wk") == F.col("first_wk"), F.col("cents")).otherwise(0))
            .cast("long")
            .alias("new_cents"),
            F.sum(F.when(F.col("wk") > F.col("first_wk"), F.col("cents")).otherwise(0))
            .cast("long")
            .alias("repeat_cents"),
            F.countDistinct(
                F.when(F.col("wk") == F.col("first_wk"), F.col("o_custkey"))
            )
            .cast("long")
            .alias("n_new_customers"),
            F.expr(
                "cast((sum(CASE WHEN wk > first_wk THEN cents ELSE 0 END) * 1000000)"
                " div greatest(sum(cents), 1L) as bigint)"
            ).alias("repeat_share_q"),
        )
        .orderBy("week")
    )



@register(
    "ols_influence_daily",
    """
WITH daily AS (
  SELECT epoch_us(ts) // 1000000 // 86400 AS d, cast(count(*) as bigint) AS y
  FROM events GROUP BY d
), reb AS (
  SELECT cast(d - min(d) OVER () as bigint) AS x, y FROM daily
), st AS (
  SELECT cast(count(*) as bigint) AS n,
         cast(sum(x) as bigint) AS sx, cast(sum(y) as bigint) AS sy,
         cast(sum(x * x) as bigint) AS sxx, cast(sum(y * y) as bigint) AS syy,
         cast(sum(x * y) as bigint) AS sxy
  FROM reb
), core AS (
  SELECT n, sx, sy, sxx, sxy,
         n * sxx - sx * sx AS den,
         cast(n * sxy - sx * sy as double) / cast(n * sxx - sx * sx as double)
           AS beta,
         cast(cast(n * sxx - sx * sx as DECIMAL(38,0))
                * (n * syy - sy * sy)
              - cast(n * sxy - sx * sy as DECIMAL(38,0)) * (n * sxy - sx * sy)
              as double)
           / cast(n * sxx - sx * sx as double) / cast(n as double)
           / cast(n - 2 as double) AS s2
  FROM st
)
SELECT r.x AS day_idx, r.y AS n_events,
       cast(r.y as double)
         - ((cast(c.sy as double) - c.beta * cast(c.sx as double))
              / cast(c.n as double)
            + c.beta * cast(r.x as double)) AS resid,
       1.0 / cast(c.n as double)
         + cast((c.n * r.x - c.sx) * (c.n * r.x - c.sx) as double)
           / cast(c.n * c.den as double) AS leverage,
       (cast(r.y as double)
          - ((cast(c.sy as double) - c.beta * cast(c.sx as double))
               / cast(c.n as double)
             + c.beta * cast(r.x as double)))
       * (cast(r.y as double)
          - ((cast(c.sy as double) - c.beta * cast(c.sx as double))
               / cast(c.n as double)
             + c.beta * cast(r.x as double)))
       / (2.0 * c.s2)
       * ((1.0 / cast(c.n as double)
           + cast((c.n * r.x - c.sx) * (c.n * r.x - c.sx) as double)
             / cast(c.n * c.den as double))
          / ((1.0 - (1.0 / cast(c.n as double)
                     + cast((c.n * r.x - c.sx) * (c.n * r.x - c.sx) as double)
                       / cast(c.n * c.den as double)))
             * (1.0 - (1.0 / cast(c.n as double)
                       + cast((c.n * r.x - c.sx) * (c.n * r.x - c.sx) as double)
                         / cast(c.n * c.den as double))))) AS cooks_d
FROM reb r CROSS JOIN core c
ORDER BY day_idx
""",
)
def ols_influence_daily(spark, sf_dir):
    """OLS influence diagnostics (residual, leverage h_ii, Cook's
    distance) for every day of the daily-event-count trend — the
    regression-audit layer ABOVE the fit itself: ols_trend/rolling_ols
    report the slope, this reports which individual days OWN it.
    High-leverage endpoints with big residuals (launch day, outage
    day) can manufacture a trend out of noise; Cook's D = e²/(p·s²) ·
    h/(1−h)² is the textbook deletion-influence score a pipeline
    checks before trusting any fitted daily slope. All sufficient
    statistics are one exact BIGINT agg (SSE numerator through
    DECIMAL(38,0) — the spearman pattern); beta/s²/h/D are doubles
    formed from the exact moments in the same textual order as the
    oracle, then the per-day rows get them via one broadcast of the
    1-row core. Scale shape: one hash agg + one broadcast join —
    no window, no self-join."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.expr("unix_timestamp(ts) div 86400").alias("d")).agg(
        F.count("*").cast("long").alias("y")
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    reb = daily.select(
        (F.col("d") - F.min("d").over(w_all)).cast("long").alias("x"),
        "y",
    )
    dec = "decimal(38,0)"
    st = reb.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    den_i = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num_i = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    beta = num_i.cast("double") / den_i.cast("double")
    sse_num = den_i.cast(dec) * (
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    ) - num_i.cast(dec) * num_i
    core = st.select(
        "n",
        "sx",
        "sy",
        "sxx",
        "sxy",
        den_i.alias("den"),
        beta.alias("beta"),
        (
            sse_num.cast("double")
            / den_i.cast("double")
            / F.col("n").cast("double")
            / (F.col("n") - 2).cast("double")
        ).alias("s2"),
    )
    j = reb.crossJoin(F.broadcast(core))
    alpha = (F.col("sy").cast("double") - F.col("beta") * F.col("sx").cast("double")) / F.col(
        "n"
    ).cast("double")
    resid = F.col("y").cast("double") - (alpha + F.col("beta") * F.col("x").cast("double"))
    lev = (
        F.lit(1.0) / F.col("n").cast("double")
        + ((F.col("n") * F.col("x") - F.col("sx")) * (F.col("n") * F.col("x") - F.col("sx"))).cast(
            "double"
        )
        / (F.col("n") * F.col("den")).cast("double")
    )
    cooks = (
        resid
        * resid
        / (F.lit(2.0) * F.col("s2"))
        * (lev / ((F.lit(1.0) - lev) * (F.lit(1.0) - lev)))
    )
    return j.select(
        F.col("x").alias("day_idx"),
        F.col("y").alias("n_events"),
        resid.alias("resid"),
        lev.alias("leverage"),
        cooks.alias("cooks_d"),
    ).orderBy("day_idx")



@register(
    "kalman_smooth_daily",
    f"""
WITH RECURSIVE daily AS (
  SELECT cast(row_number() OVER (ORDER BY d) as int) AS rn, y FROM (
    SELECT epoch_us(ts) // 1000000 // 86400 AS d, cast(count(*) as double) AS y
    FROM events GROUP BY d
  )
), kf(rn, y, x, p, k) AS (
  SELECT rn, y, y AS x, cast(1.0 as double) AS p, cast(1.0 as double) AS k
  FROM daily WHERE rn = 1
  UNION ALL
  SELECT d.rn, d.y,
         kf.x + {_KF_GAIN.format(p='kf.p')} * (d.y - kf.x),
         (1.0 - {_KF_GAIN.format(p='kf.p')}) * (kf.p + 0.5),
         {_KF_GAIN.format(p='kf.p')}
  FROM kf JOIN daily d ON d.rn = kf.rn + 1
)
SELECT cast(rn as bigint) AS day_idx, cast(y as bigint) AS n_events,
       x AS est, k AS gain
FROM kf ORDER BY day_idx
""",
)
def kalman_smooth_daily(spark, sf_dir):
    """1-D Kalman filter over the daily event-count series with the
    FULL time-varying gain recursion (x̂ₜ = x̂ₜ₋₁ + Kₜ(yₜ − x̂ₜ₋₁),
    Kₜ = P⁻ₜ/(P⁻ₜ+R), Pₜ = (1−Kₜ)P⁻ₜ) — unlike ewma_smooth_daily's
    fixed-α window approximation, the gain here genuinely depends on
    the running covariance, so the scan is irreducibly SEQUENTIAL.
    The engine runs it as an ordered higher-order fold: collect the
    (bounded — one row per day) series into one array, aggregate()
    through it accumulating the output array, explode — all inside
    Catalyst, no Python, no driver loop; the oracle is a recursive
    CTE executing the SAME IEEE expression tree step by step, so every
    est/gain double is bit-identical. Scale shape: per-SERIES state is
    O(days); a fleet of series runs this same fold per group key in
    one shuffle (the frechet/viterbi batching pattern) — what does NOT
    scale is pretending a stateful recursion is a window function."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.expr("unix_timestamp(ts) div 86400").alias("d")).agg(
        F.count("*").cast("double").alias("y")
    )
    rn = daily.select(
        F.row_number().over(Window.orderBy("d")).cast("int").alias("rn"), "y"
    )
    arr = rn.agg(F.array_sort(F.collect_list(F.struct("rn", "y"))).alias("a"))
    g = _KF_GAIN.format(p="acc.p")
    fold = arr.select(
        F.expr(
            f"""
aggregate(
  a,
  named_struct('x', cast(0.0 as double), 'p', cast(0.0 as double),
               'first', true,
               'o', cast(array() as array<struct<rn:int,y:double,est:double,gain:double>>)),
  (acc, e) -> named_struct(
    'x', CASE WHEN acc.first THEN e.y ELSE acc.x + {g} * (e.y - acc.x) END,
    'p', CASE WHEN acc.first THEN 1.0 ELSE (1.0 - {g}) * (acc.p + 0.5) END,
    'first', false,
    'o', concat(acc.o, array(named_struct(
        'rn', e.rn, 'y', e.y,
        'est', CASE WHEN acc.first THEN e.y ELSE acc.x + {g} * (e.y - acc.x) END,
        'gain', CASE WHEN acc.first THEN 1.0 ELSE {g} END)))),
  acc -> acc.o) AS o
"""
        )
    )
    return (
        fold.select(F.explode("o").alias("e"))
        .select(
            F.col("e.rn").cast("long").alias("day_idx"),
            F.col("e.y").cast("long").alias("n_events"),
            F.col("e.est").alias("est"),
            F.col("e.gain").alias("gain"),
        )
        .orderBy("day_idx")
    )



@register(
    "fiscal_445_calendar_orders",
    f"""
WITH d AS (
  SELECT cast(o_orderdate as date) AS dt,
         cast(round(cast(o_totalprice as {DEC}) * 100) as bigint) AS cents
  FROM orders
  WHERE cast(o_orderdate as date) >= DATE '{_F445_EPOCH}'
), k AS (
  SELECT dt, cents,
         datediff('day', DATE '{_F445_EPOCH}', dt) // 7 AS wk_abs,
         (datediff('day', DATE '{_F445_EPOCH}', dt) // 7) // 52 AS fy,
         (datediff('day', DATE '{_F445_EPOCH}', dt) // 7) % 52 AS wk_in_fy
  FROM d
), p AS (
  SELECT dt, cents, fy, wk_in_fy,
         wk_in_fy // 13 AS fq,
         CASE WHEN wk_in_fy % 13 < 4 THEN 0
              WHEN wk_in_fy % 13 < 8 THEN 1 ELSE 2 END AS period_in_q
  FROM k
)
SELECT cast(fy as int) AS fiscal_year, cast(fq as int) AS fiscal_quarter,
       cast(fq * 3 + period_in_q as int) AS fiscal_period,
       cast(count(*) as bigint) AS n_orders,
       cast(sum(cents) as bigint) AS cents,
       cast(count(DISTINCT month(dt)) as bigint) AS n_calendar_months_touched
FROM p GROUP BY fy, fq, fiscal_period
ORDER BY fiscal_year, fiscal_period
""",
)
def fiscal_445_calendar_orders(spark, sf_dir):
    """4-4-5 fiscal calendar mapping — retail finance's week-aligned
    calendar (each quarter = 4+4+5 whole weeks, so every period has
    the same weekday mix and comps are honest): orders map to fiscal
    year/quarter/period by pure integer week arithmetic from a fixed
    Sunday epoch, and n_calendar_months_touched shows why the mapping
    exists — most fiscal periods straddle 2 calendar months, which is
    exactly the comparison the 4-4-5 convention is designed to escape
    (and why joining fiscal facts to calendar-month dimensions
    silently misallocates revenue). The 52-week year convention is
    documented (real 4-4-5 adds a 53rd week every ~5.6 years — the
    leap-week variant changes only the modulus). One scan + one hash
    agg, exact cents."""
    o = load(spark, sf_dir, "orders")
    d = o.select(
        F.col("o_orderdate").cast("date").alias("dt"),
        F.round(F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"),
    ).filter(F.col("dt") >= F.lit(_F445_EPOCH).cast("date"))
    k = d.select(
        "dt",
        "cents",
        F.expr(f"(datediff(dt, DATE '{_F445_EPOCH}') div 7) div 52").alias("fy"),
        F.expr(f"(datediff(dt, DATE '{_F445_EPOCH}') div 7) % 52").alias("wk_in_fy"),
    )
    p = k.select(
        "dt",
        "cents",
        "fy",
        F.expr("wk_in_fy div 13").alias("fq"),
        F.when(F.col("wk_in_fy") % 13 < 4, 0)
        .when(F.col("wk_in_fy") % 13 < 8, 1)
        .otherwise(2)
        .alias("period_in_q"),
    )
    return (
        p.groupBy(
            F.col("fy").cast("int").alias("fiscal_year"),
            F.col("fq").cast("int").alias("fiscal_quarter"),
            (F.col("fq") * 3 + F.col("period_in_q")).cast("int").alias("fiscal_period"),
        )
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("cents"),
            F.countDistinct(F.month("dt")).cast("long").alias("n_calendar_months_touched"),
        )
        .orderBy("fiscal_year", "fiscal_period")
    )



@register(
    "sign_test_exact_daily",
    """
WITH RECURSIVE daily AS (
  SELECT (epoch_us(ts) // 1000000 // 86400) AS d, cast(count(*) as bigint) AS y
  FROM events GROUP BY d
), pairs AS (
  SELECT a.d, a.y AS y1, b.y AS y2
  FROM daily a JOIN daily b ON b.d = a.d + 7
  WHERE a.y != b.y
), st AS (
  SELECT cast(count(*) as bigint) AS n,
         cast(count(CASE WHEN y2 > y1 THEN 1 END) as bigint) AS n_up
  FROM pairs
), pascal(row_n, coeffs) AS (
  SELECT 0, cast([1] as bigint[])
  UNION ALL
  SELECT row_n + 1,
         list_transform(generate_series(1, row_n + 2),
           i -> coalesce(coeffs[i - 1], 0) + coalesce(coeffs[i], 0))
  FROM pascal WHERE row_n < (SELECT n FROM st)
), tail AS (
  SELECT s.n, s.n_up,
         list_aggregate(
           p.coeffs[1:cast(least(s.n_up, s.n - s.n_up) as int) + 1], 'sum') AS ts
  FROM st s JOIN pascal p ON p.row_n = s.n
)
SELECT n AS n_pairs, n_up,
       cast(ts as bigint) AS tail_sum_onesided,
       cast((ts * 2000000) // (cast(1 as bigint) << cast(n as int)) as bigint)
         AS p_two_sided_q
FROM tail
""",
)
def sign_test_exact_daily(spark, sf_dir):
    """EXACT sign test for week-over-week daily growth — small-sample
    inference with no normal approximation anywhere: pair each day
    with day+7, count increases among the non-tied pairs, and compute
    the two-sided binomial tail from a Pascal's-triangle built
    IN-QUERY (a list-state fold adding each row from the last — the
    ffd/dtw array-fold family applied to combinatorics; the events
    table spans ~30 days so n ≤ 23, and int64 holds C(n,k) exactly to
    n ≈ 60 — the documented bound of this construction).
    p_two_sided_q = 2·Σ_{k ≤ min(up,down)} C(n,k) / 2ⁿ in micro — the
    exact p-value wilcoxon/runs approximate with z scores; 2ⁿ comes
    from a bit shift, never pow(). The week-over-week pairing kills
    the weekly cycle that makes day-over-day signs meaningless
    (friedman_dow's lesson)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.expr("unix_timestamp(ts) div 86400").alias("d")).agg(
        F.count("*").cast("long").alias("y")
    )
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = a.join(b, F.col("b.d") == F.col("a.d") + 7).filter(
        F.col("a.y") != F.col("b.y")
    )
    st = pairs.agg(
        F.count("*").cast("long").alias("n"),
        F.count(F.when(F.col("b.y") > F.col("a.y"), 1)).cast("long").alias("n_up"),
    )
    fold = st.select(
        "n",
        "n_up",
        F.expr(
            """
aggregate(
  sequence(1, cast(n as int)),
  cast(array(1L) as array<bigint>),
  (acc, step) -> transform(
    sequence(1, step + 1),
    i -> coalesce(CASE WHEN i >= 2 THEN try_element_at(acc, i - 1) END, 0L)
         + coalesce(try_element_at(acc, i), 0L)),
  acc -> acc) AS coeffs
"""
        ).alias("coeffs"),
    )
    tail = F.expr(
        """
aggregate(
  transform(sequence(1, cast(least(n_up, n - n_up) as int) + 1),
            i -> element_at(coeffs, i)),
  0L, (s, x) -> s + x)
"""
    )
    return fold.select(
        F.col("n").alias("n_pairs"),
        "n_up",
        tail.cast("long").alias("tail_sum_onesided"),
        F.expr(
            """
cast((aggregate(
  transform(sequence(1, cast(least(n_up, n - n_up) as int) + 1),
            i -> element_at(coeffs, i)),
  0L, (s, x) -> s + x) * 2000000)
 div shiftleft(cast(1 as bigint), cast(n as int)) as bigint)
"""
        ).alias("p_two_sided_q"),
    )
