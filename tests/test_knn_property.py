"""Adversarial kNN configurations: the guarantee loop must equal brute
force regardless of point distribution, seams, or parameter corners."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _df(spark, ids, lat, lon, prefix):
    rows = [(int(i), float(la), float(lo)) for i, la, lo in zip(ids, lat, lon)]
    return spark.createDataFrame(rows, f"{prefix}_id long, {prefix}_lat double, {prefix}_lon double")


def _assert_equal(spark, qs, pts, k, level=None):
    from gipspark.operators.knn import knn_join, knn_join_brute

    fast = {(r.q_id, r.p_id, r.rank) for r in knn_join(qs, pts, k=k, level=level).collect()}
    brute = {(r.q_id, r.p_id, r.rank) for r in knn_join_brute(qs, pts, k=k).collect()}
    assert fast == brute


@pytest.mark.parametrize("seed", [0, 1])
def test_hotspot_cluster(spark, seed):
    rng = np.random.default_rng(seed)
    n = 300
    hot = rng.random(n) < 0.7
    lat = np.where(hot, 48.85 + rng.normal(0, 0.02, n), rng.uniform(-60, 60, n))
    lon = np.where(hot, 2.35 + rng.normal(0, 0.02, n), rng.uniform(-180, 180, n))
    pts = _df(spark, np.arange(n), lat, lon, "p")
    qlat = np.concatenate([[48.86, -30.0], rng.uniform(-60, 60, 8)])
    qlon = np.concatenate([[2.34, 100.0], rng.uniform(-180, 180, 8)])
    qs = _df(spark, np.arange(len(qlat)), qlat, qlon, "q")
    _assert_equal(spark, qs, pts, k=5)


def test_antimeridian_and_poles(spark):
    rng = np.random.default_rng(2)
    lat = np.concatenate([rng.uniform(-88, 88, 100), [89.5, -89.5, 0.0, 0.0]])
    lon = np.concatenate([rng.uniform(178, 182, 100) % 360 - 180, [10.0, 10.0, 179.9, -179.9]])
    pts = _df(spark, np.arange(len(lat)), lat, lon, "p")
    qs = _df(spark, [0, 1, 2, 3], [0.0, 89.0, -89.0, 1.0], [179.95, 0.0, 0.0, -179.95], "q")
    _assert_equal(spark, qs, pts, k=3)


def test_k_exceeds_cluster_and_forced_fine_level(spark):
    rng = np.random.default_rng(3)
    lat, lon = rng.uniform(-10, 10, 40), rng.uniform(-10, 10, 40)
    pts = _df(spark, np.arange(40), lat, lon, "p")
    qs = _df(spark, [0], [0.0], [0.0], "q")
    # forced too-fine level: every round under-fills → brute fallback path
    _assert_equal(spark, qs, pts, k=10, level=12)


def _within_brute(spark, lt, rt, radius):
    from gipspark.geo.haversine import haversine_col

    d = (
        lt.crossJoin(rt)
        .withColumn("dist_m", haversine_col(F.col("l_lat"), F.col("l_lon"), F.col("r_lat"), F.col("r_lon")))
        .filter(F.col("dist_m") <= radius)
    )
    return {(r.l_id, r.r_id) for r in d.collect()}


@pytest.mark.parametrize("radius_km,level", [(50, None), (1500, None), (200, 10)])
def test_within_join_equals_brute(spark, radius_km, level):
    from gipspark.operators.knn import within_join

    rng = np.random.default_rng(radius_km)
    n = 250
    lat = np.concatenate([rng.uniform(-70, 70, n), [89.0, 0.0, 0.0]])
    lon = np.concatenate([rng.uniform(-180, 180, n), [0.0, 179.9, -179.9]])
    rt = _df(spark, np.arange(len(lat)), lat, lon, "r")
    qlat = np.concatenate([rng.uniform(-70, 70, 12), [88.5, 0.0]])
    qlon = np.concatenate([rng.uniform(-180, 180, 12), [120.0, 179.95]])
    lt = _df(spark, np.arange(len(qlat)), qlat, qlon, "l")
    radius = radius_km * 1000.0
    fast = {
        (r.l_id, r.r_id)
        for r in within_join(lt, rt, radius_m=radius, level=level).collect()
    }
    assert fast == _within_brute(spark, lt, rt, radius)
