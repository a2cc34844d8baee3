"""Interval dissolve (merge overlapping intervals per key).

The temporal analog of polygon dissolve: collapse each key's set of
[start, end) intervals into its connected components on the time axis
— visit sessions, coverage windows, on-line spans. Classic two-window
formulation, fully JVM/codegen:

1. running max of *previous* ends over (key ORDER BY start):
   an interval starts a new component iff its start exceeds every
   earlier end;
2. running sum of those boundary flags = component id;
3. one aggregate per (key, component) for the dissolved span.

Both windows and the final aggregate share the single shuffle on the
key (Catalyst reuses the sort/partitioning), so the whole dissolve is
one exchange regardless of interval count. All arithmetic is bigint —
the DuckDB oracle replays it bit-exactly.

Skew note: a key with millions of intervals serializes in its window
sort — the standard mitigation (pre-dissolve within coarse time
chunks, then dissolve the chunk results) composes from this same
operator applied twice with a (key, chunk) key first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dissolve_intervals(
    intervals: DataFrame,
    key_col: str,
    start_col: str = "start_s",
    end_col: str = "end_s",
) -> DataFrame:
    """(key, span_id, span_start, span_end) — maximal merged spans.

    Touching intervals (next.start == prev.end) merge: coverage is
    half-open [start, end). Inputs may overlap arbitrarily and need
    no pre-sorting.
    """
    order = Window.partitionBy(key_col).orderBy(start_col, end_col)
    prev_max = (
        F.max(end_col)
        .over(order.rowsBetween(Window.unboundedPreceding, -1))
        .alias("prev_max_end")
    )
    flagged = intervals.select(key_col, start_col, end_col, prev_max).withColumn(
        "is_new",
        F.when(
            F.col("prev_max_end").isNull() | (F.col(start_col) > F.col("prev_max_end")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    numbered = flagged.withColumn(
        "span_id",
        F.sum("is_new").over(order.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return numbered.groupBy(key_col, "span_id").agg(
        F.min(start_col).alias("span_start"),
        F.max(end_col).alias("span_end"),
    )


def dissolve_sql(
    intervals_cte: str,
    key_col: str,
    start_col: str = "start_s",
    end_col: str = "end_s",
) -> str:
    """DuckDB replay of :func:`dissolve_intervals` over a CTE exposing
    (key, start, end) — same two windows, same tie order."""
    return f"""
  WITH flagged AS (
    SELECT {key_col}, {start_col}, {end_col},
           CASE WHEN max({end_col}) OVER (
                  PARTITION BY {key_col} ORDER BY {start_col}, {end_col}
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ) IS NULL
                 OR {start_col} > max({end_col}) OVER (
                  PARTITION BY {key_col} ORDER BY {start_col}, {end_col}
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ) THEN 1 ELSE 0 END AS is_new
    FROM {intervals_cte}
  ), numbered AS (
    SELECT {key_col}, {start_col}, {end_col},
           sum(is_new) OVER (
             PARTITION BY {key_col} ORDER BY {start_col}, {end_col}
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS span_id
    FROM flagged
  )
  SELECT {key_col}, cast(span_id as bigint) AS span_id,
         min({start_col}) AS span_start, max({end_col}) AS span_end
  FROM numbered GROUP BY {key_col}, span_id
"""
