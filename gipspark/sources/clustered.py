"""Spatially clustered table layout: partition by a coarse quadkey
prefix, sort within partitions by the full quadkey.

This is the storage side of the tiling engine's read path: a bbox/tile
query filters on the partition column, so Catalyst prunes entire
directories before any I/O (PartitionFilters — asserted by
tests/test_clustered.py via inputFiles), and the within-file quadkey
order gives parquet min/max row-group skipping for finer predicates.
At 10^12 rows this layout is the difference between scanning a planet
and scanning a city.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gipspark.functions.cells import quadkey_of


def write_clustered_tiles(
    df: DataFrame,
    path: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    prefix_len: int = 2,
    level: int = 8,
) -> None:
    """Write ``df`` partitioned by qk{prefix_len} (coarse quadkey) and
    sorted within partitions by qk{level} (full key). repartition on
    the partition column first so each output directory is written by
    the tasks owning that key range — no small-file explosion. The
    within-partition sort leads with qk_prefix so the dynamic-partition
    writer's required ordering is already satisfied and no extra
    (order-destroying) sort is inserted before the files are written.
    """
    qk = quadkey_of(F.col(lat_col), F.col(lon_col), level)
    out = df.withColumn("qk", qk).withColumn("qk_prefix", F.substring("qk", 1, prefix_len))
    (
        out.repartition("qk_prefix")
        .sortWithinPartitions("qk_prefix", "qk")
        .write.mode("overwrite")
        .partitionBy("qk_prefix")
        .parquet(path)
    )


def read_tile_prefix(spark: SparkSession, path: str, prefix: str) -> DataFrame:
    """All rows under one coarse tile — the filter lands on the
    partition column, so pruning happens at planning time."""
    return spark.read.parquet(path).filter(F.col("qk_prefix") == prefix)
