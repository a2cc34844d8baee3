"""Polygon-polygon overlay join: adversarial semantics cases.

(The all-pairs DuckDB oracle covers the fixture sets; these pin the
corner semantics of the house rule.)"""

from gipspark.operators.overlay import overlay_join


def _sq(pid, cx, cy, r):
    ring = [[cx - r, cy - r], [cx + r, cy - r], [cx + r, cy + r], [cx - r, cy + r]]
    return {"poly_id": pid, "rings": [ring + ring[:1]]}


def _annulus(pid, cx, cy, r_out, r_in):
    outer = [[cx - r_out, cy - r_out], [cx + r_out, cy - r_out],
             [cx + r_out, cy + r_out], [cx - r_out, cy + r_out]]
    inner = [[cx - r_in, cy - r_in], [cx - r_in, cy + r_in],
             [cx + r_in, cy + r_in], [cx + r_in, cy - r_in]]  # reversed
    return {"poly_id": pid, "rings": [outer + outer[:1], inner + inner[:1]]}


def _pairs(df):
    return {(r.a_id, r.b_id): (r.edge_cross, r.a_in_b, r.b_in_a) for r in df.collect()}


def test_overlay_crossing_containment_disjoint(spark):
    a = [_sq(0, 10.0, 10.0, 1.0), _sq(1, 50.0, 0.0, 2.0), _sq(2, -40.0, 20.0, 1.0)]
    b = [
        _sq(0, 10.8, 10.7, 1.0),   # partial overlap with a0 -> edge cross
        _sq(1, 50.0, 0.0, 0.5),    # strictly inside a1 -> b_in_a
        _sq(2, -40.0, 24.0, 1.0),  # disjoint from a2
        _sq(3, 10.0, 10.0, 5.0),   # a0 strictly inside -> a_in_b
    ]
    got = _pairs(overlay_join(spark, a, b))
    assert got[(0, 0)][0]                      # crossing detected
    assert got[(1, 1)] == (False, False, True)  # b inside a, no crossings
    assert got[(0, 3)] == (False, True, False)  # a inside b
    assert (2, 2) not in got                    # disjoint pair absent


def test_overlay_hole_island_not_intersecting(spark):
    # B sits entirely inside A's hole: no edge crossings, B's vertex is
    # outside A (even-odd), A's vertex outside B -> NOT intersecting
    a = [_annulus(0, 0.0, 0.0, 10.0, 4.0)]
    b = [_sq(0, 0.0, 0.0, 1.0)]
    assert _pairs(overlay_join(spark, a, b)) == {}
    # but a square straddling the hole wall crosses the inner ring
    b2 = [_sq(1, 4.0, 0.0, 1.0)]
    got = _pairs(overlay_join(spark, a, b2))
    assert got[(0, 1)][0]


def test_overlay_detects_all_sampled_intersections(spark):
    # one-directional property vs an independent kernel: if a dense
    # grid sample finds a point inside BOTH polygons (fat
    # intersection), the operator must report the pair. Uses the
    # NumPy PIP kernel (itself property-tested vs brute force).
    import numpy as np

    from gipspark.geo import pip as pipgeo

    rng = np.random.default_rng(41)
    def rand_poly(pid):
        cx, cy = rng.uniform(-60, 60), rng.uniform(-40, 40)
        k = int(rng.integers(5, 10))
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        r = rng.uniform(0.5, 3.0)
        ring = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)
        ring = np.vstack([ring, ring[:1]])
        return {"poly_id": pid, "rings": [ring.tolist()]}

    a = [rand_poly(i) for i in range(12)]
    b = [rand_poly(i) for i in range(12)]
    got = {(r.a_id, r.b_id) for r in overlay_join(spark, a, b).collect()}

    for pa in a:
        ra = [np.asarray(r) for r in pa["rings"]]
        for pb in b:
            rb = [np.asarray(r) for r in pb["rings"]]
            ax0, ay0, ax1, ay1 = pipgeo.polygon_bbox(ra)
            bx0, by0, bx1, by1 = pipgeo.polygon_bbox(rb)
            x0, x1 = max(ax0, bx0), min(ax1, bx1)
            y0, y1 = max(ay0, by0), min(ay1, by1)
            if x0 >= x1 or y0 >= y1:
                continue
            xs = np.linspace(x0, x1, 25)
            ys = np.linspace(y0, y1, 25)
            gx, gy = np.meshgrid(xs, ys)
            lon, lat = gx.ravel(), gy.ravel()
            in_a = pipgeo.points_in_polygon(lon, lat, pipgeo.rings_to_edges(ra))
            in_b = pipgeo.points_in_polygon(lon, lat, pipgeo.rings_to_edges(rb))
            if (in_a & in_b).any():
                assert (pa["poly_id"], pb["poly_id"]) in got, (
                    f"sampled intersection missed: {pa['poly_id']},{pb['poly_id']}"
                )


def test_overlay_df_variant_matches_list_variant(spark):
    # the distributed (DataFrame-native) overlay must agree exactly
    # with the driver-dim variant on the same random sets
    import numpy as np

    from gipspark.operators.overlay import overlay_join_df

    rng = np.random.default_rng(7)
    def rand_poly(pid):
        cx, cy = rng.uniform(-12, 12), rng.uniform(-9, 9)
        k = int(rng.integers(5, 9))
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        r = rng.uniform(1.5, 5.0)
        ring = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)
        ring = np.vstack([ring, ring[:1]])
        return {"poly_id": pid, "rings": [ring.tolist()]}

    a = [rand_poly(i) for i in range(10)]
    b = [rand_poly(i) for i in range(10)]
    ring_t = "poly_id long, rings array<array<array<double>>>"
    a_df = spark.createDataFrame([(p["poly_id"], p["rings"]) for p in a], ring_t)
    b_df = spark.createDataFrame([(p["poly_id"], p["rings"]) for p in b], ring_t)
    lst = sorted(tuple(r) for r in overlay_join(spark, a, b).collect())
    dfv = sorted(tuple(r) for r in overlay_join_df(a_df, b_df).collect())
    assert lst == dfv and len(lst) > 0
