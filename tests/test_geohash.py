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
