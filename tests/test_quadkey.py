"""quadkey_of: hand-derived corner vectors, the parent-prefix property,
and Spark↔driver-side parity of the digit math."""

import numpy as np

from pyspark.sql import functions as F

from gipspark.functions.cells import quadkey_of


def _ref(lat: float, lon: float, level: int) -> str:
    n = 1 << level
    x = min(max(int(np.floor((lon + 180.0) / 360.0 * n)), 0), n - 1)
    y = min(max(int(np.floor((90.0 - lat) / 180.0 * n)), 0), n - 1)
    return "".join(
        str(((x >> k) & 1) + 2 * ((y >> k) & 1)) for k in range(level - 1, -1, -1)
    )


# corner vectors derivable by hand from the digit spec (x_bit + 2*y_bit,
# MSB first): NW corner -> all 0, NE -> all 1, SW -> all 2, SE -> all 3
VECTORS = [
    (89.9, -179.9, 8, "00000000"),
    (89.9, 179.9, 8, "11111111"),
    (-89.9, -179.9, 8, "22222222"),
    (-89.9, 179.9, 8, "33333333"),
    # just south-east of the origin: x=128, y=128 -> first digit 3, rest 0
    (-0.1, 0.1, 8, "30000000"),
    # clamps: poles / antimeridian stay in range
    (90.0, 180.0, 4, "1111"),
    (-90.0, -180.0, 4, "2222"),
]


def test_known_vectors_and_reference(spark):
    rows = [(i, float(la), float(lo), lv, exp) for i, (la, lo, lv, exp) in enumerate(VECTORS)]
    df = spark.createDataFrame(
        [(i, la, lo) for i, la, lo, _, _ in rows], "i long, lat double, lon double"
    )
    for i, la, lo, lv, exp in rows:
        got = (
            df.filter(F.col("i") == i)
            .select(quadkey_of(F.col("lat"), F.col("lon"), lv).alias("qk"))
            .collect()[0]
            .qk
        )
        assert got == exp == _ref(la, lo, lv), (la, lo, lv, got, exp)


def test_parent_is_prefix_property(spark):
    rng = np.random.default_rng(3)
    pts = [(float(la), float(lo)) for la, lo in zip(rng.uniform(-89, 89, 300), rng.uniform(-180, 180, 300))]
    df = spark.createDataFrame(pts, "lat double, lon double")
    out = df.select(
        *[quadkey_of(F.col("lat"), F.col("lon"), lv).alias(f"q{lv}") for lv in (4, 6, 8)]
    ).collect()
    for r in out:
        assert r.q8.startswith(r.q6) and r.q6.startswith(r.q4)
        assert len(r.q8) == 8 and set(r.q8) <= set("0123")


def test_matches_reference_on_random_points(spark):
    rng = np.random.default_rng(9)
    pts = [(float(la), float(lo)) for la, lo in zip(rng.uniform(-90, 90, 500), rng.uniform(-180, 180, 500))]
    df = spark.createDataFrame(pts, "lat double, lon double")
    got = [
        r.qk for r in df.select(quadkey_of(F.col("lat"), F.col("lon"), 8).alias("qk")).collect()
    ]
    assert got == [_ref(la, lo, 8) for la, lo in pts]


def test_adaptive_quadtree_cover_invariants(spark):
    # skewed cloud: half the points in one hot corner, rest uniform
    from gipspark.operators.tiles import adaptive_quadtree

    rng = np.random.default_rng(11)
    hot = zip(rng.uniform(40, 41, 400), rng.uniform(10, 11, 400))
    cold = zip(rng.uniform(-89, 89, 400), rng.uniform(-180, 180, 400))
    pts = [(float(la), float(lo)) for la, lo in list(hot) + list(cold)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    rows = adaptive_quadtree(df, max_occupancy=25, max_depth=6).collect()
    tiles = [r.tile for r in rows]
    # exact partition of the input: counts sum to |points|
    assert sum(r.n for r in rows) == len(pts)
    # prefix-free: no emitted tile is an ancestor of another
    ts = set(tiles)
    assert len(ts) == len(tiles)
    for t in tiles:
        for d in range(1, len(t)):
            assert t[:d] not in ts, f"{t[:d]} is an ancestor of {t}"
    # occupancy bound holds except at forced max-depth leaves
    for r in rows:
        assert r.n <= 25 or r.depth == 6
    # the hot corner actually forced deep splits
    assert max(r.depth for r in rows) == 6 and min(r.depth for r in rows) < 4
