"""zranges planner: coverage + exactness properties vs brute Morton."""

from gipspark.operators.zorder import zranges


def brute_morton(gx, gy, bits):
    z = 0
    for b in range(bits):
        z |= ((gx >> b) & 1) << (2 * b)
        z |= ((gy >> b) & 1) << (2 * b + 1)
    return z


def in_ranges(z, ranges):
    return any(lo <= z < hi for lo, hi in ranges)


BOXES = [
    (0, 0, 0, 0),
    (3, 9, 2, 14),
    (0, 31, 0, 31),
    (5, 5, 0, 31),
    (7, 8, 7, 8),  # straddles the center split
    (1, 30, 16, 17),
]


def test_exact_cover_with_unbounded_budget():
    bits = 5
    for x0, x1, y0, y1 in BOXES:
        rs = zranges(x0, x1, y0, y1, bits=bits, max_ranges=10**9)
        inside = {
            brute_morton(gx, gy, bits)
            for gx in range(x0, x1 + 1)
            for gy in range(y0, y1 + 1)
        }
        # every box cell covered
        assert all(in_ranges(z, rs) for z in inside)
        # unbounded budget -> EXACT: nothing outside the box covered
        covered = sum(hi - lo for lo, hi in rs)
        assert covered == len(inside)
        # sorted, disjoint, coalesced
        for (l1, h1), (l2, h2) in zip(rs, rs[1:]):
            assert h1 < l2


def test_superset_cover_under_budget():
    bits = 8
    x0, x1, y0, y1 = 13, 201, 57, 190
    rs = zranges(x0, x1, y0, y1, bits=bits, max_ranges=24)
    assert len(rs) <= 24 + 4  # coalescing can only shrink; slack for splits in flight
    for gx in range(x0, x1 + 1, 7):
        for gy in range(y0, y1 + 1, 7):
            assert in_ranges(brute_morton(gx, gy, bits), rs)
