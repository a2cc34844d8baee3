"""Bucketed co-located joins + partitioned-write pruning (scale hygiene).

Evidence for the 100 TB story: (a) a join between two tables bucketed
on the join key plans with ZERO shuffle Exchanges and returns rows
identical to the plain shuffled join; (b) a tile-partitioned output
table scanned with a tile predicate prunes to just that partition's
files (PartitionFilters), so a single-tile re-run touches 1/N of the
data.
"""

import pytest
from pyspark.sql import functions as F

from gipspark.sources.bucketing import bucketed_join, exchange_count, write_bucketed


@pytest.fixture(scope="module")
def no_broadcast(spark):
    """The fixture tables are tiny; disable auto-broadcast so the join
    strategy under test (bucketed SMJ) is actually exercised."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_no_exchange_and_exact_rows(spark, sf_dir, tmp_path_factory, no_broadcast):
    tmp = tmp_path_factory.mktemp("buckets")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, path=str(tmp / "o"))
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        8,
        path=str(tmp / "l"),
    )
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", ["o_orderkey"]).select(
            "o_orderkey", "l_linenumber", "o_totalprice", "l_quantity"
        )
        assert exchange_count(joined) == 0

        plain = (
            orders.join(
                lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
            ).select("o_orderkey", "l_linenumber", "o_totalprice", "l_quantity")
        )
        assert exchange_count(plain) > 0  # the shuffle bucketing removes
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_groupby_no_exchange(spark, sf_dir, tmp_path_factory, no_broadcast):
    """Aggregation on the bucket key also reuses the clustering: a
    groupBy(o_orderkey) over a bucketed table needs no shuffle."""
    tmp = tmp_path_factory.mktemp("buckets_agg")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(lineitem, "b_li_agg", ["l_orderkey"], 8, path=str(tmp / "l"))
    try:
        agg = (
            spark.table("b_li_agg")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("qty"), F.count("*").alias("n"))
        )
        assert exchange_count(agg) == 0
        expect = (
            lineitem.groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("qty"), F.count("*").alias("n"))
        )
        assert sorted(map(tuple, agg.collect())) == sorted(map(tuple, expect.collect()))
    finally:
        spark.sql("DROP TABLE IF EXISTS b_li_agg")


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """tile_id-partitioned output + tile predicate → PartitionFilters
    prune the scan to one directory; a residual column predicate is
    still pushed to parquet (PushedFilters)."""
    from gipspark.functions.cells import derived_lat, derived_lon, tile_of

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    pts = cust.select(
        "c_custkey",
        tile_of(derived_lat(F.col("c_custkey")), derived_lon(F.col("c_custkey"))).alias(
            "tile_id"
        ),
    )
    out = str(tmp_path / "tiled")
    pts.write.mode("overwrite").partitionBy("tile_id").parquet(out)

    tiles = [r.tile_id for r in pts.select("tile_id").distinct().collect()]
    target = sorted(tiles)[0]
    scan = (
        spark.read.parquet(out)
        .filter((F.col("tile_id") == target) & (F.col("c_custkey") > 0))
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "tile_id" in plan.split("PartitionFilters", 1)[1][:200]
    assert "PushedFilters" in plan and "c_custkey" in plan.split("PushedFilters", 1)[1][:200]
    expect = pts.filter((F.col("tile_id") == target) & (F.col("c_custkey") > 0)).count()
    assert scan.count() == expect
