"""As-of and range (interval) joins (SURVEY.md §2.4).

As-of: nearest-earlier right row per left row within a partition key —
implemented with the union+window trick (one shuffle on (key, ts), no
Python): tag sides, sort by time within key, `last(right, ignorenulls)`
over the preceding frame carries the most recent right row forward onto
every left row.

Range join: equi-bucket both sides on time buckets spanning the
interval, then refine — turns a non-equi join Catalyst would nested-loop
into a shuffle join on bucket id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str],
) -> DataFrame:
    """For each left row: columns of the latest right row with
    right.on ≤ left.on and same ``by``. Right ties on ts resolve to the
    greatest (last in (ts, tag) order). Left rows with no earlier right
    row keep nulls."""
    lt = left.withColumn("__side", F.lit(1))
    rt = right.select(
        by, on, *[F.col(c) for c in right_cols]
    ).withColumn("__side", F.lit(0))
    allc = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in right_cols:
        allc = allc.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return allc.filter(F.col("__side") == 1).drop("__side")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket: str = "1 hour",
) -> DataFrame:
    """left ⋈ right where right_start ≤ left_ts < right_end.

    Both sides bucket on ``bucket``-sized epochs; the right side explodes
    its interval across the buckets it spans, so the match becomes an
    equi-join on bucket + an exact refine filter. Shuffle volume scales
    with interval/bucket ratio instead of |L|×|R|.
    """
    secs = {"1 hour": 3600, "1 day": 86400, "1 minute": 60}[bucket]
    lb = left.withColumn("__bk", (F.unix_timestamp(F.col(left_ts)) / secs).cast("long"))
    rb = right.withColumn(
        "__bk",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(right_start)) / secs).cast("long"),
                (F.unix_timestamp(F.col(right_end)) / secs).cast("long"),
            )
        ),
    )
    return (
        lb.join(rb, on="__bk")
        .filter((F.col(right_start) <= F.col(left_ts)) & (F.col(left_ts) < F.col(right_end)))
        .drop("__bk")
    )
