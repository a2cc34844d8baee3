"""Frozen cell-id golden vectors (FIXTURES.md §1.5).

Regression pins for the vendored S2/h3x encoders: any change to the
kernels that alters an id for these 50 pinned coordinates (incl. poles,
antimeridian, face boundaries, the megacity anchor) fails here — the
tile/cell assignment per url must stay stable across engine versions
(BASELINE.json:6 "identical tile/cell assignments per url").
"""

import json
import os

import numpy as np

from gipspark.geo import h3x, s2

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "cells.json")


def test_golden_cell_ids():
    rows = json.load(open(GOLDEN))
    lat = np.array([r["lat"] for r in rows])
    lon = np.array([r["lon"] for r in rows])
    assert s2.latlng_to_cell(lat, lon, 12).tolist() == [r["s2_12"] for r in rows]
    assert s2.latlng_to_cell(lat, lon, 30).tolist() == [r["s2_30"] for r in rows]
    assert h3x.latlng_to_cell(lat, lon, 7).tolist() == [r["h3_7"] for r in rows]


def test_golden_hierarchy_consistency():
    rows = json.load(open(GOLDEN))
    leaf = np.array([r["s2_30"] for r in rows])
    lvl12 = np.array([r["s2_12"] for r in rows])
    assert (s2.parent(leaf, 12) == lvl12).all()
