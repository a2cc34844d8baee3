"""SparkSession factory with scale-oriented defaults.

Local mode is the test surrogate for a multi-executor cluster
(BASELINE.md protocol): one JVM, N threads. All settings below are the
ones that transfer to a real cluster — AQE (runtime re-planning +
skew-join splitting), Arrow for the pandas-UDF boundary, UTC timestamps
for oracle comparison, and shuffle partitions sized to parallelism
rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "gipspark",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    task_cpus: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the gipspark engine.

    ``parallelism`` defaults to ``$SPARK_GRAFT_CPUS`` or all cores.
    ``shuffle_partitions`` defaults to 2×parallelism — enough splits for
    AQE to coalesce, few enough to avoid tiny-task overhead locally.
    """
    cores = int(parallelism or os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 4)
    shuffle = int(shuffle_partitions or 2 * cores)
    # task_cpus=1 even for pandas-UDF stages: with the fused single
    # python pass + small Arrow batches (below), the JVM thread and the
    # python worker of one task PIPELINE (JVM serializes batch k+1 /
    # drains k-1 while python crunches k), so a slot genuinely keeps
    # ~one core busy on each side in alternation, not two at once.
    # task_cpus=2 halves the slot count and measured 2.2× slower on the
    # enrich stage at local[32] (BENCH.md "arrow batch pipelining").
    tcpus = int(task_cpus or os.environ.get("GIPSPARK_TASK_CPUS") or 1)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 16k rows/batch, not the 65k default-ish sizing: html rows are
        # ~1 KB, so 64k-row batches are ~64 MB units that serialize the
        # JVM↔python pipeline into lockstep (python idles while the JVM
        # marshals one giant batch and vice versa). 8–16k batches keep
        # both sides streaming; measured 2.2× on the enrich stage
        # (BENCH.md "arrow batch pipelining").
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        .config("spark.driver.memory", os.environ.get("GIPSPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.task.cpus", str(tcpus))
    )
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
