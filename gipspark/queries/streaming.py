"""Registry family: streaming (split from the single-file registry; query names and behavior unchanged)."""

from __future__ import annotations

from gipspark.queries._base import (  # noqa: F401
    DEC,
    F,
    Window,
    load,
    register,
)
from gipspark.queries._shared import BPE_PATTERN  # noqa: F401



@register(
    "tumbling_window_counts",
    """
SELECT cast(floor(epoch(ts) / 300) * 300 as bigint) AS win_start_s, event_type,
       count(*) AS n
FROM events GROUP BY win_start_s, event_type
""",
)
def tumbling_window_counts(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            (F.unix_timestamp(F.col("win.start"))).cast("bigint").alias("win_start_s"),
            "event_type",
            "n",
        )
    )



@register(
    "sliding_window_counts",
    # 10-minute windows sliding by 5: every event lands in exactly the
    # two windows starting at floor(t/300)*300 and that minus 300
    """
SELECT ws AS win_start_s, event_type, count(*) AS n FROM (
  SELECT unnest([cast(floor(epoch(ts) / 300) * 300 as bigint),
                 cast(floor(epoch(ts) / 300) * 300 - 300 as bigint)]) AS ws,
         event_type
  FROM events)
GROUP BY ws, event_type
""",
)
def sliding_window_counts(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp(F.col("win.start")).cast("bigint").alias("win_start_s"),
            "event_type",
            "n",
        )
    )



@register(
    "session_window_batch",
    # session = maximal run of per-user events with gaps < 30 min;
    # lag/cumsum derivation mirrors F.session_window's merge semantics
    """
WITH g AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) >= 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM events),
s AS (SELECT user_id, ts, value,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess
      FROM g)
SELECT user_id, epoch_us(min(ts)) AS sess_start_us, count(*) AS n_events,
       cast(sum(cast(value as decimal(18,2))) as double) AS value_sum
FROM s GROUP BY user_id, sess
""",
)
def session_window_batch(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sess"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("value_sum"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("sess.start").cast("timestamp")).alias("sess_start_us"),
            "n_events",
            "value_sum",
        )
    )



@register(
    "stream_join_attribution",
    """
WITH c AS (SELECT user_id, ts AS click_ts, event_id AS click_id FROM events
           WHERE event_type = 'click'),
p AS (SELECT user_id, ts AS purchase_ts, event_id AS purchase_id FROM events
      WHERE event_type = 'purchase')
SELECT p.purchase_id, c.click_id, p.user_id,
       cast((epoch_us(p.purchase_ts) - epoch_us(c.click_ts)) // 1000000 as bigint) AS gap_s
FROM p JOIN c ON p.user_id = c.user_id
 AND p.purchase_ts >= c.click_ts
 AND p.purchase_ts <= c.click_ts + INTERVAL 24 HOUR
""",
)
def stream_join_attribution(spark, sf_dir):
    """Batch-mode execution of the stream-stream attribution join's
    logical plan (streaming/events.stream_stream_attribution runs the
    identical condition incrementally with watermark-bounded state;
    exact stream==batch equality is pytested with time-ordered
    arrival). gap_s uses integer microsecond arithmetic so both
    engines floor identically."""
    from gipspark.streaming.events import stream_stream_attribution

    ev = load(spark, sf_dir, "events")
    out = stream_stream_attribution(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    return out.select(
        "purchase_id",
        "click_id",
        "user_id",
        # NTZ ts → timestamp is exact here: session tz is pinned UTC
        # (gipspark/session.py) so the reinterpretation is offset-free
        F.expr(
            "cast((unix_micros(cast(purchase_ts as timestamp))"
            " - unix_micros(cast(click_ts as timestamp))) div 1000000 as bigint)"
        ).alias("gap_s"),
    )



@register(
    "sliding_rate_window_events",
    """
WITH es AS (
  SELECT event_id, user_id,
         cast(epoch_us(ts) // 1000000 as bigint) AS sec,
         cast(value as decimal(18,2)) AS v
  FROM events
)
SELECT event_id, user_id, sec,
       cast(count(*) OVER (PARTITION BY user_id ORDER BY sec
            RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) as bigint) AS n_trailing_1h,
       cast(sum(v) OVER (PARTITION BY user_id ORDER BY sec
            RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) as double) AS v_trailing_1h
FROM es ORDER BY event_id
""",
)
def sliding_rate_window_events(spark, sf_dir):
    """Per-event trailing-hour rate via a time-RANGE window frame —
    "how many events (and how much value) did this user produce in the
    3600 s ending now", the per-event feature behind rate limiting and
    velocity rules. A RANGE frame is semantically different from the
    ROW frames of trailing_window_features: it is defined by the SECOND
    axis, includes ALL peers at equal timestamps regardless of row
    order (which is what makes it deterministic under ties), and
    shrinks/stretches with event density. Seconds are exact integers
    (epoch_us // 10⁶) and the value sum decimal(18,2) — no float
    reduction. Scale shape: one user-partitioned range-frame window —
    shuffle ∝ events once, Spark plans a single WindowExec with a
    sliding frame, no self-join materialization of the band."""
    e = load(spark, sf_dir, "events")
    es = e.select(
        "event_id",
        "user_id",
        F.expr(
            "cast(unix_micros(cast(ts as timestamp)) div 1000000 as bigint)"
        ).alias("sec"),
        F.col("value").cast(DEC).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return es.select(
        "event_id",
        "user_id",
        "sec",
        F.count("*").over(w).cast("long").alias("n_trailing_1h"),
        F.sum("v").over(w).cast("double").alias("v_trailing_1h"),
    ).orderBy("event_id")



@register(
    "windowed_bpe_token_rate",
    f"""
WITH d AS (
  SELECT doc_id, text,
         timestamp '2024-01-01 00:00:00' + to_seconds(doc_id * 13) AS ts
  FROM documents
), toks AS (
  SELECT ts, unnest(regexp_extract_all(text, $${BPE_PATTERN}$$)) AS tok FROM d
), enc AS (
  SELECT ts, {{chain}} AS enc FROM toks
)
SELECT to_timestamp((cast(epoch(ts) as bigint) // 300) * 300) AS win_start,
       cast(count(*) as bigint) AS n_pretokens,
       cast(sum(length(enc) - length(replace(enc, chr(2), ''))) as bigint)
         AS n_bpe_tokens
FROM enc GROUP BY 1 ORDER BY win_start
""".replace("{chain}", __import__("gipspark.functions.bpe", fromlist=["x"]).bpe_oracle_replace_chain(
        __import__("gipspark.functions.bpe", fromlist=["x"]).bpe_oracle_init("tok"))),
)
def windowed_bpe_token_rate(spark, sf_dir):
    """Batch twin of the streaming token-ingest meter
    (streaming/tokens.windowed_token_counts, stream==batch parity in
    tests/test_streaming_tokens.py): learned-BPE token counts per
    5-minute tumbling window over a deterministic synthetic event time
    (doc_id·13 s past a fixed origin — the stream staging's clock).
    The tokens/sec gauge a crawl-ingest pipeline runs continuously;
    this query is its oracle-checked ground truth, with the DuckDB
    side replaying the committed merge table through the
    wrapped-encoding replace chain. Scale shape: explode + one Arrow
    UDF pass + one window-keyed hash agg."""
    from gipspark.functions.bpe import bpe_token_count

    d = load(spark, sf_dir, "documents").select(
        "text",
        F.expr(
            "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, doc_id * 13)"
        ).alias("ts"),
    )
    toks = d.select(
        "ts",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), 0)
        ).alias("tok"),
    )
    return (
        toks.groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(
            F.count("*").cast("long").alias("n_pretokens"),
            F.sum(bpe_token_count(F.col("tok"))).cast("long").alias("n_bpe_tokens"),
        )
        .select(F.col("w.start").alias("win_start"), "n_pretokens", "n_bpe_tokens")
        .orderBy("win_start")
    )


_WM_CANDIDATES_S = [60, 300, 600, 1800]


@register(
    "watermark_planning_census",
    f"""
WITH arr AS (
  SELECT cast(epoch(ts) as bigint) AS t,
         max(cast(epoch(ts) as bigint))
           OVER (ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
  FROM events
), tot AS (SELECT cast(count(*) as bigint) AS n FROM events)
SELECT cast(w.wm as bigint) AS watermark_s,
       tot.n AS n_events,
       cast(count(*) FILTER (WHERE arr.hwm IS NOT NULL AND arr.t < arr.hwm - w.wm)
            as bigint) AS n_late,
       cast(count(*) FILTER (WHERE arr.hwm IS NOT NULL AND arr.t < arr.hwm - w.wm)
            * 1000000 // tot.n as bigint) AS late_rate_micro
FROM arr CROSS JOIN (VALUES {",".join(f"({w})" for w in _WM_CANDIDATES_S)}) AS w(wm)
CROSS JOIN tot
GROUP BY w.wm, tot.n ORDER BY watermark_s
""",
)
def watermark_planning_census(spark, sf_dir):
    """Watermark planning census (r5): for each candidate watermark,
    how many events would arrive LATE — event time below the running
    high-water mark (max event time over all EARLIER arrivals, arrival
    order = event_id, the log-offset proxy) minus the watermark — and
    so be DROPPED by a Structured Streaming windowed aggregate. This
    is the number you need BEFORE choosing withWatermark's horizon
    (the streaming families here run '10 minutes' on faith; this
    census is the faith's audit): pick the knee where late_rate stops
    falling. Exact integers: epoch seconds, a running max with a
    1-PRECEDING frame (the first arrival has no HWM and cannot be
    late), candidate horizons as a literal dim. Scale shape: the
    running max is a GLOBAL ordered window — the documented big-data
    alternative is per-partition HWMs + a broadcast prefix merge (the
    same two-phase swap as the global cumsum ops); per-key watermarks
    would partition by source. One window + one 4-row dim cross +
    one agg."""
    ev = load(spark, sf_dir, "events")
    w_arr = (
        Window.orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    arr = ev.select(
        F.expr("cast(unix_timestamp(ts) as bigint)").alias("t"),
        F.max(F.expr("cast(unix_timestamp(ts) as bigint)")).over(w_arr).alias("hwm"),
    )
    tot = ev.agg(F.count("*").cast("long").alias("n"))
    wm = None
    for wsec in _WM_CANDIDATES_S:
        r = (
            arr.crossJoin(F.broadcast(tot))
            .agg(
                F.lit(wsec).cast("long").alias("watermark_s"),
                F.max("n").alias("n_events"),
                F.count_if(
                    F.col("hwm").isNotNull() & (F.col("t") < F.col("hwm") - wsec)
                )
                .cast("long")
                .alias("n_late"),
                F.expr(
                    f"cast((count_if(hwm is not null and t < hwm - {wsec}) * 1000000)"
                    " div max(n) as bigint)"
                ).alias("late_rate_micro"),
            )
        )
        wm = r if wm is None else wm.unionByName(r)
    return wm.orderBy("watermark_s")
