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
