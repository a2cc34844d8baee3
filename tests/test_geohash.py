"""Geohash encode: the Morton-interleave Column must match an
independent textbook bisection implementation (different algorithm, so
a transcription slip in the magic numbers cannot hide) plus the
published example vectors."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gipspark.functions.geohash import BASE32, geohash_col


def _geohash_ref(lat: float, lon: float, precision: int) -> str:
    """Classic alternate-bisection geohash (public algorithm)."""
    lat_r, lon_r = [-90.0, 90.0], [-180.0, 180.0]
    bits, even = [], True
    while len(bits) < precision * 5:
        rng = lon_r if even else lat_r
        v = lon if even else lat
        mid = (rng[0] + rng[1]) / 2
        if v >= mid:
            bits.append(1)
            rng[0] = mid
        else:
            bits.append(0)
            rng[1] = mid
        even = not even
    return "".join(
        BASE32[int("".join(map(str, bits[i : i + 5])), 2)]
        for i in range(0, len(bits), 5)
    )


def _spark_geohash(spark, pts, precision):
    df = spark.createDataFrame(
        [(i, float(la), float(lo)) for i, (la, lo) in enumerate(pts)],
        "id long, lat double, lon double",
    )
    rows = df.select(
        "id", geohash_col(F.col("lat"), F.col("lon"), precision).alias("gh")
    ).collect()
    return [r.gh for r in sorted(rows, key=lambda r: r.id)]


def test_published_examples(spark):
    # the two canonical examples from the public geohash literature
    got = _spark_geohash(spark, [(57.64911, 10.40744), (42.605, -5.603)], 8)
    assert got[0][:8] == "u4pruydq"
    assert got[1][:5] == "ezs42"


@pytest.mark.parametrize("precision", [1, 5, 8])
def test_matches_bisection_reference(spark, precision):
    rng = np.random.default_rng(precision)
    lat = np.concatenate([rng.uniform(-90, 90, 200), [90.0, -90.0, 0.0, 89.999999]])
    lon = np.concatenate([rng.uniform(-180, 180, 200), [179.999999, -180.0, 0.0, 0.0]])
    pts = list(zip(lat, lon))
    got = _spark_geohash(spark, pts, precision)
    ref = [_geohash_ref(la, lo, precision) for la, lo in pts]
    assert got == ref


def test_decode_roundtrip_within_half_cell(spark):
    from gipspark.functions.geohash import QBITS, geohash_decode

    rng = np.random.default_rng(17)
    pts = [
        (float(la), float(lo))
        for la, lo in zip(
            np.concatenate([rng.uniform(-90, 90, 200), [89.99, -89.99, 0.0]]),
            np.concatenate([rng.uniform(-180, 180, 200), [179.99, -179.99, 0.0]]),
        )
    ]
    df = spark.createDataFrame(pts, "lat double, lon double")
    rows = df.select(
        "lat",
        "lon",
        geohash_decode(geohash_col(F.col("lat"), F.col("lon"), 8)).alias("d"),
    ).collect()
    half_lat, half_lon = 180.0 / (1 << (QBITS + 1)), 360.0 / (1 << (QBITS + 1))
    for r in rows:
        assert abs(r.d.lat - r.lat) <= half_lat + 1e-12, (r.lat, r.d.lat)
        assert abs(r.d.lon - r.lon) <= half_lon + 1e-12, (r.lon, r.d.lon)


def test_decode_known_vector(spark):
    from gipspark.functions.geohash import geohash_decode

    # u4pruydq decodes near the published (57.64911, 10.40744) example
    df = spark.createDataFrame([("u4pruydqqvj8",)], "gh string")
    r = df.select(geohash_decode(F.substring("gh", 1, 8)).alias("d")).collect()[0]
    assert abs(r.d.lat - 57.64911) < 0.001 and abs(r.d.lon - 10.40744) < 0.001
