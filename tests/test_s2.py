"""Property tests for the vendored S2 kernel (gipspark/geo/s2.py).

The reference fixtures are unavailable (SURVEY.md §0), so correctness is
established structurally: exact encode/decode round trips, hierarchy
containment, level arithmetic, neighbor adjacency and wrap behavior.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gipspark.geo import s2
from gipspark.geo.haversine import haversine_m

RNG = np.random.default_rng(7)
LAT = RNG.uniform(-89.9, 89.9, 5000)
LON = RNG.uniform(-180, 180, 5000)


def test_leaf_roundtrip_exact():
    leaf = s2.latlng_to_cell(LAT, LON, 30)
    clat, clon = s2.cell_to_latlng(leaf)
    assert (s2.latlng_to_cell(clat, clon, 30) == leaf).all()


def test_level_and_parent():
    c12 = s2.latlng_to_cell(LAT, LON, 12)
    assert (s2.cell_level(c12) == 12).all()
    leaf = s2.latlng_to_cell(LAT, LON, 30)
    assert (s2.parent(leaf, 12) == c12).all()
    # parent is monotone in level
    c5 = s2.latlng_to_cell(LAT, LON, 5)
    assert (s2.parent(c12, 5) == c5).all()


def test_center_containment():
    c12 = s2.latlng_to_cell(LAT, LON, 12)
    clat, clon = s2.cell_to_latlng(c12)
    assert (s2.latlng_to_cell(clat, clon, 12) == c12).all()


def test_center_distance_bounded():
    # level-12 cells have ~3-6 km diagonals; centers must be local
    c12 = s2.latlng_to_cell(LAT, LON, 12)
    clat, clon = s2.cell_to_latlng(c12)
    assert haversine_m(LAT, LON, clat, clon).max() < 4000


def test_all_faces_reached():
    leaf = s2.latlng_to_cell(LAT, LON, 30)
    faces = np.asarray(leaf, dtype=np.int64).view(np.uint64) >> np.uint64(61)
    assert set(faces.tolist()) == {0, 1, 2, 3, 4, 5}


def test_grid_disk_contains_self_and_adjacent():
    c = s2.latlng_to_cell(LAT[:500], LON[:500], 12)
    disk = s2.grid_disk(c, 12, 1)
    assert disk.shape == (500, 9)
    assert (disk == c[:, None]).any(axis=1).all()
    # all disk members are level 12 and geographically near the center
    assert (s2.cell_level(disk.ravel()) == 12).all()
    dlat, dlon = s2.cell_to_latlng(disk.ravel())
    clat, clon = s2.cell_to_latlng(np.repeat(c, 9))
    assert haversine_m(clat, clon, dlat, dlon).max() < 20000


def test_grid_disk_symmetry():
    c = s2.latlng_to_cell(LAT[:300], LON[:300], 12)
    disk = s2.grid_disk(c, 12, 1)
    # b in disk(a) => a in disk(b) for lattice disks away from corners
    for i in range(0, 300, 17):
        for b in np.unique(disk[i]):
            if b == c[i]:
                continue
            back = s2.grid_disk(np.array([b]), 12, 1)
            assert c[i] in back


def test_face_wrap_produces_valid_cells():
    # points right at the equator/±45° land near face edges; wrap neighbors
    edge_lat = np.full(100, 0.0)
    edge_lon = np.linspace(44.9, 45.1, 100)  # face 0/1 boundary at lon 45
    c = s2.latlng_to_cell(edge_lat, edge_lon, 12)
    disk = s2.grid_disk(c, 12, 1)
    assert (s2.cell_level(disk.ravel()) == 12).all()
    faces = np.asarray(disk.ravel(), dtype=np.int64).view(np.uint64) >> np.uint64(61)
    assert len(set(faces.tolist())) >= 2  # the ring crosses the face edge


@settings(max_examples=200, deadline=None)
@given(
    lat=st.floats(min_value=-89.99, max_value=89.99),
    lon=st.floats(min_value=-179.99, max_value=179.99),
    level=st.integers(min_value=1, max_value=30),
)
def test_encode_scalar_properties(lat, lon, level):
    c = s2.latlng_to_cell(np.array([lat]), np.array([lon]), level)
    assert s2.cell_level(c)[0] == level
    clat, clon = s2.cell_to_latlng(c)
    assert s2.latlng_to_cell(clat, clon, level)[0] == c[0]


def test_determinism_across_chunking():
    whole = s2.latlng_to_cell(LAT, LON, 12)
    parts = np.concatenate(
        [s2.latlng_to_cell(LAT[i : i + 137], LON[i : i + 137], 12) for i in range(0, 5000, 137)]
    )
    assert (whole == parts).all()


def test_token_roundtrippable_prefixes():
    c = s2.latlng_to_cell(LAT[:10], LON[:10], 12)
    toks = s2.cell_token(c)
    assert all(1 <= len(t) <= 16 for t in toks)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
