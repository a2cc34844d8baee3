"""GIPS tile assignment + inventory matrices (SURVEY.md §2.5).

Upstream-GIPS semantics re-expressed relationally: *tile assignment* is
a pure-codegen column (the fixed h##v## graticule — no join needed, the
grid is arithmetic); *inventory* is the availability matrix per
(tile, date): how many docs, how many geocoded, distinct languages,
coverage fraction — the DataInventory analogue. Rollups give the
tile→date calendar views via ``rollup``/``grouping_id``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gipspark.functions.cells import tile_of


def assign_tiles(
    df: DataFrame, lat_col: str = "lat", lon_col: str = "lon", out_col: str = "tile_id"
) -> DataFrame:
    return df.withColumn(out_col, tile_of(F.col(lat_col), F.col(lon_col)))


def inventory(
    df: DataFrame,
    ts_col: str = "warc_ts",
    lat_col: str = "lat",
    lon_col: str = "lon",
    lang_col: str = "lang",
) -> DataFrame:
    """Per (tile_id, date) availability matrix. Ungeocodable rows count
    toward coverage's denominator under tile '(none)'."""
    geocoded = F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
    tagged = df.withColumn(
        "tile_id",
        F.when(geocoded, tile_of(F.col(lat_col), F.col(lon_col))).otherwise(F.lit("(none)")),
    ).withColumn("date", F.to_date(F.col(ts_col)))
    return tagged.groupBy("tile_id", "date").agg(
        F.count("*").alias("n_docs"),
        F.count_distinct(F.col(lang_col)).alias("n_langs"),
        F.sum(F.when(geocoded, 1).otherwise(0)).alias("n_geocoded"),
    )


def inventory_rollup(inv: DataFrame) -> DataFrame:
    """Calendar rollup tile→total, date→month (grouping-sets surface)."""
    return (
        inv.withColumn("month", F.date_trunc("month", F.col("date").cast("timestamp")).cast("date"))
        .rollup("tile_id", "month")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_geocoded").alias("n_geocoded"),
            F.grouping_id().alias("gid"),
        )
    )
