"""Antimeridian polygon handling: membership through pip_join on a
wrapped polygon must equal the same query in a longitude-shifted frame
where nothing wraps (the frame shift is the ground truth — the planar
kernel is exact there)."""

import numpy as np
import pytest

from gipspark.geo.antimeridian import normalize_antimeridian
from gipspark.geo.pip import points_in_polygon, rings_to_edges
from gipspark.operators.pip import pip_join

# a quadrilateral straddling ±180: lon from 170 to -170 (20° wide)
WRAPPED = {
    "poly_id": 1,
    "rings": [[[170.0, -10.0], [-170.0, -10.0], [-170.0, 10.0], [170.0, 10.0], [170.0, -10.0]]],
}


def _shift_frame(lon):
    # rotate the frame by 180°: the wrapped polygon becomes a plain box
    return ((np.asarray(lon) + 360.0) % 360.0) - 180.0


def test_normalize_splits_into_strip_pieces():
    out = normalize_antimeridian([WRAPPED])
    rings = out[0]["rings"]
    assert len(rings) == 2
    for r in rings:
        lons = [p[0] for p in r]
        assert max(lons) <= 180.0 and min(lons) >= -180.0
        assert max(abs(r[i + 1][0] - r[i][0]) for i in range(len(r) - 1)) <= 180.0


def test_membership_matches_shifted_frame_kernel():
    rng = np.random.default_rng(4)
    lon = np.concatenate([rng.uniform(-180, 180, 2000), [175.0, -175.0, 0.0, 169.9, -169.9]])
    lat = np.concatenate([rng.uniform(-30, 30, 2000), [0.0, 0.0, 0.0, 0.0, 0.0]])
    # lon == ±180 exactly sits ON the cut seam — excluded by the
    # half-open boundary rule (module docstring), so not compared here
    pieces = normalize_antimeridian([WRAPPED])[0]["rings"]
    got = points_in_polygon(lon, lat, rings_to_edges(pieces))
    # ground truth: shift frame 180° -> box from -10..10 lon
    box = [[[-10.0, -10.0], [10.0, -10.0], [10.0, 10.0], [-10.0, 10.0], [-10.0, -10.0]]]
    want = points_in_polygon(_shift_frame(lon), lat, rings_to_edges(box))
    assert (got == want).all()
    assert got.sum() > 0


def test_pip_join_handles_wrapped_polygon(spark):
    rng = np.random.default_rng(5)
    lon = np.concatenate([rng.uniform(160, 179.99, 150), rng.uniform(-179.99, -160, 150), rng.uniform(-150, 150, 200)])
    lat = rng.uniform(-20, 20, 500)
    pts = spark.createDataFrame(
        [(i, float(la), float(lo)) for i, (la, lo) in enumerate(zip(lat, lon))],
        "pid long, lat double, lon double",
    )
    got = {r.pid for r in pip_join(pts, [WRAPPED]).collect()}
    want = {
        i
        for i, (la, lo) in enumerate(zip(lat, _shift_frame(lon)))
        if -10 < lo < 10 and -10 < la < 10
    }
    assert got == want and len(got) > 0


def test_fence_flags_handles_wrapped_fence(spark):
    # the streaming geofence's literal-edge inside test normalizes too
    # (streaming/geofence.fence_flags) — same shifted-frame ground truth
    from gipspark.streaming.geofence import fence_flags

    rng = np.random.default_rng(6)
    lon = np.concatenate([rng.uniform(160, 179.9, 120), rng.uniform(-179.9, -160, 120), rng.uniform(-140, 140, 160)])
    lat = rng.uniform(-20, 20, 400)
    df = spark.createDataFrame(
        [(i, float(la), float(lo)) for i, (la, lo) in enumerate(zip(lat, lon))],
        "pid long, lat double, lon double",
    )
    got = {r.pid for r in fence_flags(df, [WRAPPED]).collect() if r.inside == 1}
    want = {
        i
        for i, (la, lo) in enumerate(zip(lat, _shift_frame(lon)))
        if -10 < lo < 10 and -10 < la < 10
    }
    assert got == want and len(got) > 0


def test_non_wrapping_polys_returned_unchanged():
    plain = {"poly_id": 2, "rings": [[[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 0.0]]]}
    out = normalize_antimeridian([plain])
    assert out[0] is plain


def test_globe_winding_ring_raises():
    ring = [[float(lo), 0.0] for lo in range(-180, 181, 30)] + [[-180.0, 0.0]]
    # force every step eastward so the unwrap spans 360+
    ring = [[-170 + 100 * i, 10.0 * ((-1) ** i)] for i in range(5)]
    ring = [[p[0], p[1]] for p in ring]
    with pytest.raises(ValueError, match="globe"):
        normalize_antimeridian(
            [{"poly_id": 3, "rings": [[[0, 0], [150, 5], [-60, 10], [120, 15], [0, 0]]]}]
        )
