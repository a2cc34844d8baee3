"""Convex hull (operators/hull) and bbox join (operators/bbox)."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from gipspark.operators.bbox import bbox_join
from gipspark.operators.hull import _chain, convex_hull

RNG = np.random.default_rng(1234)


def _inside_or_on(hull, p, eps=1e-9):
    """Point inside/on a CCW hull iff every cross product >= -eps."""
    n = len(hull)
    if n == 1:
        return np.allclose(hull[0], p)
    if n == 2:
        a, b = hull
        cr = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
        return abs(cr) <= eps
    for i in range(n):
        a, b = hull[i], hull[(i + 1) % n]
        if (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) < -eps:
            return False
    return True


def test_chain_contains_all_points_and_is_subset():
    pts = RNG.normal(size=(200, 2)) * 10
    h = _chain(pts)
    pset = {tuple(p) for p in pts}
    assert all(tuple(v) in pset for v in h)
    assert all(_inside_or_on(h, p) for p in pts)


def test_chain_collinear_and_degenerate():
    line = np.array([[float(i), 2.0 * i] for i in range(5)])
    h = _chain(line)
    assert len(h) == 2  # strict turns drop interior collinear points
    assert len(_chain(np.array([[1.0, 1.0]]))) == 1
    assert len(_chain(np.array([[1.0, 1.0], [1.0, 1.0]]))) == 1  # dup collapses


def test_chain_square_with_interior():
    sq = np.array([[0.0, 0], [10, 0], [10, 10], [0, 10], [5, 5], [2, 7], [10, 5]])
    h = _chain(sq)
    assert {tuple(v) for v in h} == {(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)}
    # canonical CCW from lexicographic min
    assert tuple(h[0]) == (0.0, 0.0)


def test_convex_hull_spark_matches_chain_and_partitioning(spark):
    rows = [(int(i % 3), float(x), float(y)) for i, (x, y) in enumerate(RNG.normal(size=(120, 2)) * 5)]
    df = spark.createDataFrame(rows, "g long, lon double, lat double")
    got = convex_hull(df, "g").collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r["g"], []).append((r["vertex_idx"], r["lon"], r["lat"]))
    for g in (0, 1, 2):
        pts = np.array([(x, y) for gg, x, y in rows if gg == g])
        want = _chain(pts)
        vs = sorted(by_g[g])
        assert [(v[1], v[2]) for v in vs] == [tuple(p) for p in want]
    # invariance under repartitioning
    got2 = {tuple(r) for r in convex_hull(df.repartition(13), "g").collect()}
    assert got2 == {tuple(r) for r in got}


def test_bbox_join_equals_brute(spark, sf_dir):
    from gipspark.functions import cells as C

    boxes = [
        {"box_id": 0, "lon_min": -30.0, "lat_min": -20.0, "lon_max": 40.0, "lat_max": 30.0},
        {"box_id": 1, "lon_min": 100.0, "lat_min": -59.0, "lon_max": 179.0, "lat_max": 59.0},
        {"box_id": 2, "lon_min": 1.5, "lat_min": 1.5, "lon_max": 2.5, "lat_max": 2.5},
    ]
    pts = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select(
            "c_custkey",
            C.derived_lat(F.col("c_custkey")).alias("lat"),
            C.derived_lon(F.col("c_custkey")).alias("lon"),
        )
    )
    got = {(r["c_custkey"], r["box_id"]) for r in bbox_join(pts, boxes).collect()}
    rows = pts.collect()
    want = {
        (r["c_custkey"], b["box_id"])
        for r in rows
        for b in boxes
        if b["lon_min"] <= r["lon"] <= b["lon_max"] and b["lat_min"] <= r["lat"] <= b["lat_max"]
    }
    assert got == want and len(got) > 0


def test_bbox_join_rejects_duplicate_ids(spark, sf_dir):
    pts = spark.read.parquet(f"{sf_dir}/customer.parquet").limit(1).select(
        "c_custkey", F.lit(0.0).alias("lat"), F.lit(0.0).alias("lon")
    )
    dup = [{"box_id": 0, "lon_min": 0, "lat_min": 0, "lon_max": 1, "lat_max": 1}] * 2
    with pytest.raises(ValueError):
        bbox_join(pts, dup)


def test_bbox_tile_cover_edge_touching(spark):
    # a box exactly on tile boundaries still covers the right tiles
    from gipspark.operators.bbox import _tile_cover

    cover = _tile_cover({"lon_min": 0.0, "lat_min": 0.0, "lon_max": 5.0, "lat_max": 5.0})
    # ix = floor((lon+180)/5) ∈ {36,37}; iy = floor((90-lat)/5) ∈ {17,18}
    assert set(cover) == {"h36v17", "h36v18", "h37v17", "h37v18"}


def test_diameter_pairs_matches_brute_force(spark):
    """diameter_pairs == all-pairs brute force on adversarial fixtures:
    random clouds, all-collinear, coordinate duplicates, symmetric ties
    (square: two equal diagonals), and an all-coincident group."""
    from gipspark.operators.hull import diameter_pairs

    rng = np.random.default_rng(7)
    rows = []
    # group 0-2: random integer clouds
    for g in range(3):
        for i in range(40):
            rows.append((g, g * 1000 + i, int(rng.integers(-5000, 5000)), int(rng.integers(-5000, 5000))))
    # group 3: all collinear
    rows += [(3, 3000 + i, 10 * i, 20 * i) for i in range(15)]
    # group 4: duplicates at the extremes (min id must win)
    rows += [(4, 4007, 0, 0), (4, 4003, 0, 0), (4, 4009, 100, 0), (4, 4001, 100, 0)]
    # group 5: square — two diagonals tie; lexicographic min id pair wins
    rows += [(5, 5004, 0, 0), (5, 5002, 10, 0), (5, 5003, 0, 10), (5, 5001, 10, 10)]
    # group 6: all points coincide (d2 = 0 pair of two smallest ids)
    rows += [(6, 6005, 7, 7), (6, 6002, 7, 7), (6, 6009, 7, 7)]
    # group 7: single point (no pair -> absent)
    rows += [(7, 7001, 1, 2)]
    df = spark.createDataFrame(rows, "g int, id long, x long, y long")
    got = {
        r.g: (r.id_a, r.id_b, r.d2, r.n_pts)
        for r in diameter_pairs(df, "g", id_col="id", x_col="x", y_col="y").collect()
    }

    by_g = {}
    for g, i, x, y in rows:
        by_g.setdefault(g, []).append((i, x, y))
    for g, pts in by_g.items():
        if len(pts) < 2:
            assert g not in got
            continue
        best = None
        for ai in range(len(pts)):
            for bi in range(len(pts)):
                ia, xa, ya = pts[ai]
                ib, xb, yb = pts[bi]
                if ia >= ib:
                    continue
                d2 = (xa - xb) ** 2 + (ya - yb) ** 2
                key = (-d2, ia, ib)
                if best is None or key < best:
                    best = key
        assert got[g] == (best[1], best[2], -best[0], len(pts)), f"group {g}"
