"""Bucketed-table co-location: shuffle-free sort-merge joins.

At 10^12-document scale the dominant cost of a fact↔fact join
(docs ⋈ docs by url for dedup, lineitem ⋈ orders by orderkey) is
shuffling BOTH sides on the join key — at 100 TB that shuffle IS the
job. Bucketing moves the shuffle to write time, once: both tables are
written hash-clustered (and sorted) on the join key into the same
number of buckets, so every later join on that key is a zero-Exchange
sort-merge join that Catalyst plans from the bucket metadata alone.
This is the parquet-table analogue of Iceberg's ``bucket(N, key)``
partition transform the north_rule's Iceberg deployment would use
(SURVEY.md §2.1, §7.5 — reference checkout empty, no file citation
possible).

Bucket-count sizing for the 1000-executor deployment: pick
``buckets`` ≈ total-table-bytes / 256 MB, rounded to a multiple of the
executor count, and keep it IDENTICAL for every table sharing the key
— Spark only elides the Exchange when both sides agree (or one side's
count divides the other's with ``spark.sql.bucketing.coalesceBucketsInJoin``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed+sorted parquet table named ``table``.

    ``path`` makes it an external table (local tests write to a tmp
    dir); omitted, it lands in ``spark.sql.warehouse.dir``. Sorting by
    the bucket keys lets the later sort-merge join skip its Sort node
    too — the read side is already ordered within each bucket file.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(buckets, *keys).sortBy(*keys)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left: str, right: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys.

    With matching bucket specs this plans as SortMergeJoin with NO
    Exchange on either side (assert via ``exchange_count``); the merge
    hint stops AQE from "helpfully" broadcasting the small local
    fixture and hiding the co-location we are demonstrating.
    """
    lt = spark.table(left).hint("merge")
    rt = spark.table(right)
    return lt.join(rt, on=on, how=how)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the final physical plan.

    Triggers execution under AQE so the *final* adaptive plan is
    inspected, not the conservative initial one.
    """
    df.write.mode("overwrite").format("noop").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning") + plan.count("Exchange rangepartitioning")
