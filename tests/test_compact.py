"""compact/uncompact round-trip and minimality properties."""

import numpy as np
from pyspark.sql import functions as F

from gipspark.geo import h3x
from gipspark.operators.compact import compact_cells, uncompact_cells


def _cells_at(spark, lats, lons, res):
    ids = h3x.latlng_to_cell(np.asarray(lats, float), np.asarray(lons, float), res)
    return spark.createDataFrame([(int(c),) for c in sorted(set(ids))], "cell long")


def test_compact_uncompact_roundtrip(spark):
    rng = np.random.default_rng(3)
    lats = rng.uniform(-60, 60, 500)
    lons = rng.uniform(-170, 170, 500)
    res = 6
    cells = _cells_at(spark, lats, lons, res)
    n0 = cells.count()
    compacted = compact_cells(cells, res)
    restored = uncompact_cells(compacted, res)
    got = {r.cell for r in restored.collect()}
    want = {r.cell for r in cells.collect()}
    assert got == want and len(got) == n0


def test_compact_promotes_complete_sibling_sets(spark):
    # all 7 children of some parents + a few loose cells: the full
    # families must collapse to their parents, loose cells stay
    rng = np.random.default_rng(9)
    lats = rng.uniform(-50, 50, 40)
    lons = rng.uniform(-150, 150, 40)
    parents = np.unique(h3x.latlng_to_cell(lats, lons, 4))[:5]
    from gipspark.operators.compact import _child_cols

    pdf = spark.createDataFrame([(int(c),) for c in parents], "cell long")
    children = pdf.select(
        F.explode(F.array(*_child_cols(F.col("cell"), 4))).alias("cell")
    )
    loose = _cells_at(spark, rng.uniform(-50, 50, 6), rng.uniform(-150, 150, 6), 5)
    loose = loose.join(children, "cell", "left_anti")
    cells = children.unionByName(loose).distinct()

    compacted = {r.cell for r in compact_cells(cells, 5).collect()}
    assert set(int(p) for p in parents) <= compacted  # families collapsed
    child_set = {r.cell for r in children.collect()}
    assert not (compacted & child_set)  # no promoted child remains
    assert {r.cell for r in loose.collect()} <= compacted  # loose kept


def test_uncompact_counts_multiply_by_seven(spark):
    cells = _cells_at(spark, [10.0, 20.0, -30.0], [40.0, -60.0, 100.0], 3)
    n = cells.count()
    down2 = uncompact_cells(cells, 5)
    assert down2.count() == n * 49
    assert down2.distinct().count() == n * 49  # children never collide