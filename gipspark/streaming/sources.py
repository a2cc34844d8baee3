"""Kafka-style pluggable stream sources behind one canonical schema.

A production deployment of the tiling engine ingests the crawl/event
firehose from Kafka; the sandbox has no Kafka connector jar or broker,
so the source is an ADAPTER: every backend yields a DataFrame with the
same canonical event schema, and everything downstream
(``gipspark.streaming.events`` window/session/dedup operators, the
stateful tracker) is source-agnostic. Swapping file→kafka at deploy
time is a config change, exactly like the Iceberg catalog shim
(gipspark.sources.catalog).

Backends:

- ``file``  — parquet chunk directory, one file per trigger (the
  replayable local stand-in; deterministic, used by all tests).
- ``rate``  — Spark's rate source mapped to synthetic-but-deterministic
  events (event_id = row value), for soak/throughput probes.
- ``kafka`` — ``format("kafka")`` + JSON value parsing into the same
  schema. Requires the spark-sql-kafka package on the classpath
  (spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13);
  raises a clear error locally instead of Spark's opaque
  "Failed to find data source".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gipspark.streaming.events import EVENT_SCHEMA

_EVENT_TYPES = ("view", "click", "purchase", "signup", "share")


def open_source(spark: SparkSession, kind: str, **opts) -> DataFrame:
    """Open a streaming DataFrame of canonical events from ``kind``."""
    try:
        builder = _BACKENDS[kind]
    except KeyError:
        raise ValueError(f"unknown stream source {kind!r}; one of {sorted(_BACKENDS)}") from None
    return builder(spark, **opts)


def _file_source(spark: SparkSession, path: str, files_per_trigger: int = 1) -> DataFrame:
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(path)
    )


def _rate_source(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Deterministic event synthesis from the rate source's (timestamp,
    value) rows — value is a monotonic int64, so every derived column
    is a pure function of it (JVM-side only, no Python)."""
    raw = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    types = F.array(*[F.lit(t) for t in _EVENT_TYPES])
    return raw.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        F.pmod(F.xxhash64(F.col("value")), F.lit(10_000)).alias("user_id"),
        F.element_at(types, (F.pmod(F.col("value"), F.lit(len(_EVENT_TYPES))) + 1).cast("int")).alias(
            "event_type"
        ),
        (F.pmod(F.xxhash64(F.col("value"), F.lit(7)), F.lit(10_000)) / 100.0).alias("value"),
        F.to_json(F.struct(F.pmod(F.col("value"), F.lit(50)).alias("k"))).alias("props"),
    )


def _kafka_source(
    spark: SparkSession, bootstrap_servers: str, topic: str, starting_offsets: str = "earliest"
) -> DataFrame:
    classpath_probe = "org.apache.spark.sql.kafka010.KafkaSourceProvider"
    try:
        spark._jvm.java.lang.Class.forName(classpath_probe)
    except Exception:
        raise RuntimeError(
            "kafka source requires the spark-sql-kafka connector on the "
            "classpath: spark-submit --packages "
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"
        ) from None
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), EVENT_SCHEMA).alias("e")
    ).select("e.*")


_BACKENDS = {"file": _file_source, "rate": _rate_source, "kafka": _kafka_source}
