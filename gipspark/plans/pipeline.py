"""The flagship pipeline: scan → extract/geotag → encode → PIP join →
tile assign → clustered write, checkpointed per stage.

This is the BASELINE.json:2 benchmark subject ("H3-encode + PIP-join +
tile-assign … docs/sec end-to-end") and the resume demonstration
(BASELINE.json:6). Each stage is a declarative DataFrame; Python is
crossed exactly twice per row batch (extract+geotag UDF pass, encode
UDF pass) — everything else is whole-stage codegen.

Stage list (names are manifest keys — stable across runs):
  s1_extract  html → text', (lat, lon)        [Arrow UDFs, narrow]
  s2_encode   + s2_cell12 / h3_cell7 / tile   [Arrow UDF + codegen, narrow]
  s3_pip      ⋈ polygons (broadcast prefilter + refine)
  s4_tiles    cluster by cell (repartitionByRange) + final table
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gipspark.functions.cells import h3_cell, s2_cell, tile_of
from gipspark.functions.text import extract_text_udf, geotag_udf
from gipspark.operators.pip import pip_join
from gipspark.operators.skew import cluster_by_cell
from gipspark.sources.checkpoint import CheckpointedRun


def enrich_docs(docs: DataFrame) -> DataFrame:
    """scan → extract/geotag → encode, no checkpointing (bench hot path).

    One combined Python pass: geotag and extraction share the same Arrow
    batch transfer of html; cell encodes run on the resulting lat/lon.
    """
    g = docs.withColumn("__geo", geotag_udf(F.col("html"))).withColumn(
        "text_extracted", extract_text_udf(F.col("html"))
    )
    g = g.withColumn("lat", F.col("__geo.lat")).withColumn("lon", F.col("__geo.lon")).drop("__geo")
    geocoded = F.col("lat").isNotNull()
    return (
        g.withColumn("cell", s2_cell(F.col("lat"), F.col("lon"), 12))
        .withColumn("h3cell", h3_cell(F.col("lat"), F.col("lon"), 7))
        .withColumn(
            "tile_id", F.when(geocoded, tile_of(F.col("lat"), F.col("lon"))).otherwise(F.lit(None))
        )
    )


def run_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    polys: list[dict],
    ckpt_root: str,
    run_id: str = "run0",
) -> tuple[DataFrame, CheckpointedRun]:
    """Checkpointed end-to-end run; returns (final assignments, run)."""
    run = CheckpointedRun(spark, ckpt_root, run_id)

    def s1() -> DataFrame:
        g = docs.withColumn("__geo", geotag_udf(F.col("html"))).withColumn(
            "text_extracted", extract_text_udf(F.col("html"))
        )
        return (
            g.withColumn("lat", F.col("__geo.lat"))
            .withColumn("lon", F.col("__geo.lon"))
            .drop("__geo", "html")  # html never travels past extraction
        )

    extracted = run.stage("s1_extract", s1)

    def s2() -> DataFrame:
        geocoded = F.col("lat").isNotNull()
        return (
            extracted.withColumn("cell", s2_cell(F.col("lat"), F.col("lon"), 12))
            .withColumn("h3cell", h3_cell(F.col("lat"), F.col("lon"), 7))
            .withColumn(
                "tile_id",
                F.when(geocoded, tile_of(F.col("lat"), F.col("lon"))).otherwise(F.lit(None)),
            )
        )

    encoded = run.stage("s2_encode", s2, key_col="cell")

    def s3() -> DataFrame:
        pts = encoded.filter(F.col("lat").isNotNull())
        return pip_join(pts, polys, cell_col="cell").select(
            "url", "warc_ts", "lang", "lat", "lon", "cell", "h3cell", "tile_id", "poly_id"
        )

    matched = run.stage("s3_pip", s3, key_col="cell")

    def s4() -> DataFrame:
        return cluster_by_cell(matched, "cell")

    final = run.stage("s4_tiles", s4, key_col="cell")
    return final, run
