"""Catalog shim: Iceberg tables when a catalog is configured, parquet
paths otherwise (SURVEY.md §7.5).

The north_rule targets "Iceberg tables ... at 10^12-document scale";
the sandbox has no Iceberg runtime jar, so table identity is resolved
at call time:

- names containing a dot ("catalog.db.table") and a configured Spark
  catalog → Iceberg DataFrame API (``spark.table`` / ``writeTo`` with
  snapshot-commit semantics);
- anything else → a parquet directory (the local surrogate; the
  checkpoint layer supplies the atomic-commit manifest that Iceberg
  snapshots would provide — gipspark.sources.checkpoint docstring).

At cluster deploy time, enabling Iceberg is pure configuration:

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.lake.type=hive ...

and passing table names like ``lake.db.docs`` — no code changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _is_catalog_table(spark: SparkSession, name: str) -> bool:
    if "/" in name or "\\" in name or not ("." in name):
        return False
    catalog = name.split(".", 1)[0]
    return spark.conf.get(f"spark.sql.catalog.{catalog}", None) is not None


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """Read a docs/engine table by catalog name or parquet path."""
    if _is_catalog_table(spark, name):
        return spark.table(name)
    return spark.read.parquet(name)


def write_table(
    df: DataFrame, name: str, mode: str = "overwrite", partition_by: list[str] | None = None
) -> None:
    """Write by catalog name (Iceberg snapshot commit) or parquet path."""
    spark = df.sparkSession
    if _is_catalog_table(spark, name):
        writer = df.writeTo(name)
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(name)
