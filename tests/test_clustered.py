"""Clustered tile layout: partition pruning must be real (inputFiles
shrinks to the matching directory) and the data must round-trip."""

import numpy as np
from pyspark.sql import functions as F

from gipspark.sources.clustered import read_tile_prefix, write_clustered_tiles


def _pts(spark, n=400, seed=3):
    rng = np.random.default_rng(seed)
    rows = [
        (i, float(la), float(lo))
        for i, (la, lo) in enumerate(zip(rng.uniform(-80, 80, n), rng.uniform(-179, 179, n)))
    ]
    return spark.createDataFrame(rows, "id long, lat double, lon double")


def test_partition_pruning_and_roundtrip(spark, tmp_path):
    path = str(tmp_path / "tiles")
    df = _pts(spark)
    write_clustered_tiles(df, path)

    full = spark.read.parquet(path)
    assert full.count() == 400

    one = read_tile_prefix(spark, path, "03")
    one.collect()
    # pruning is physical: the executed scan's numFiles metric counts
    # only the matching directory's files (inputFiles() lists the
    # relation pre-pruning, so it cannot prove this)
    qe = one._jdf.queryExecution()
    leaves = qe.executedPlan().collectLeaves()
    scan = leaves.apply(0)
    pruned_n = scan.metrics().apply("numFiles").value()
    total_n = len(full.inputFiles())
    assert 0 < pruned_n < total_n, (pruned_n, total_n)
    # and the pruning happened at planning time via PartitionFilters
    plan = qe.executedPlan().toString()
    assert "PartitionFilters" in plan and "qk_prefix" in plan

    # row parity with a brute filter over the unpartitioned source
    from gipspark.functions.cells import quadkey_of

    want = {
        r.id
        for r in df.withColumn("qk", quadkey_of(F.col("lat"), F.col("lon"), 8))
        .filter(F.substring("qk", 1, 2) == "03")
        .collect()
    }
    assert {r.id for r in one.collect()} == want


def test_within_partition_sort_order(spark, tmp_path):
    path = str(tmp_path / "tiles")
    write_clustered_tiles(_pts(spark), path)
    import pyarrow.parquet as pq
    import glob, os

    some = sorted(glob.glob(os.path.join(path, "qk_prefix=*", "*.parquet")))[:5]
    for f in some:
        qks = pq.read_table(f, columns=["qk"]).column("qk").to_pylist()
        assert qks == sorted(qks), f
