"""Property tests for the h3x aperture-7 icosahedral index.

h3x ids are deliberately not canonical-H3-numeric (module docstring);
these tests pin the structural contract: layout bits, exact hierarchy by
digit truncation, locality of decode, determinism, k-ring shape.
"""

import numpy as np
import pytest

from gipspark.geo import h3x
from gipspark.geo.haversine import haversine_m

RNG = np.random.default_rng(13)
LAT = RNG.uniform(-89.9, 89.9, 5000)
LON = RNG.uniform(-180, 180, 5000)


def test_bit_layout():
    c = h3x.latlng_to_cell(LAT, LON, 7)
    assert (c > 0).all()  # bit 63 clear
    assert ((c >> 59) & 0xF == h3x.MODE_CELL).all()
    assert (h3x.cell_res(c) == 7).all()
    assert ((h3x.cell_base(c) >= 0) & (h3x.cell_base(c) <= 19)).all()
    # unused digits are 7
    d = h3x.cell_digits(c, 15)
    assert (d[:, 7:] == 7).all()
    assert (d[:, :7] <= 6).all()


def test_hierarchy_is_digit_truncation():
    c7 = h3x.latlng_to_cell(LAT, LON, 7)
    c5 = h3x.parent(c7, 5)
    assert (h3x.cell_res(c5) == 5).all()
    assert (h3x.cell_base(c5) == h3x.cell_base(c7)).all()
    assert (h3x.cell_digits(c5, 5) == h3x.cell_digits(c7, 5)).all()
    assert (h3x.parent(h3x.parent(c7, 6), 5) == h3x.parent(c7, 5)).all()


def test_decode_locality():
    c7 = h3x.latlng_to_cell(LAT, LON, 7)
    clat, clon = h3x.cell_to_latlng(c7)
    d = haversine_m(LAT, LON, clat, clon)
    assert d.max() < 12000  # within ~1 res-7 hex diameter
    assert np.median(d) < 6000


def test_center_containment_mostly():
    # face-truncated boundary hexes may re-encode across the seam; the
    # h3x contract is >= 99.5% exact containment (docstring deviation)
    c7 = h3x.latlng_to_cell(LAT, LON, 7)
    clat, clon = h3x.cell_to_latlng(c7)
    assert (h3x.latlng_to_cell(clat, clon, 7) == c7).mean() > 0.995


def test_parent_vs_direct_encode_agreement():
    # aperture-7 nesting is approximate (true for canonical H3 too):
    # most points agree, boundary points may not
    c7 = h3x.latlng_to_cell(LAT, LON, 7)
    c5 = h3x.latlng_to_cell(LAT, LON, 5)
    assert (h3x.parent(c7, 5) == c5).mean() > 0.85


def test_grid_disk_shape_and_self():
    c = h3x.latlng_to_cell(LAT[:300], LON[:300], 7)
    for k in (1, 2):
        disk = h3x.grid_disk(c, k)
        assert disk.shape == (300, 3 * k * (k + 1) + 1)
        assert (disk == c[:, None]).any(axis=1).all()
        # all members decode near the center cell
        dlat, dlon = h3x.cell_to_latlng(disk.ravel())
        clat, clon = h3x.cell_to_latlng(np.repeat(c, disk.shape[1]))
        assert haversine_m(clat, clon, dlat, dlon).max() < (k + 1) * 20000


def test_determinism_across_chunking():
    whole = h3x.latlng_to_cell(LAT, LON, 7)
    parts = np.concatenate(
        [h3x.latlng_to_cell(LAT[i : i + 233], LON[i : i + 233], 7) for i in range(0, 5000, 233)]
    )
    assert (whole == parts).all()


def test_all_bases_reached():
    c = h3x.latlng_to_cell(LAT, LON, 7)
    assert len(set(h3x.cell_base(c).tolist())) == 20


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
