"""Cross-operator conservation laws for the round-4 closure queries.

flow_accumulation_cells and watershed_basins are two views of the same
D8 pointer forest, so mass conservation must hold exactly: the
drainage recorded at each sink equals the summed density of its basin.
Likewise bom_rollup_parts' subtree sums must conserve total value per
root. These identities catch closure bugs (missed hops, double-counted
pairs) that a string-match oracle at one SF could in principle share.
"""

from __future__ import annotations

import pytest

from gipspark.queries import queries

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def q():
    return queries()


def test_sink_drainage_equals_basin_mass(spark, q):
    acc = {
        (r.cx, r.cy): r
        for r in q["flow_accumulation_cells"](spark, SF_DIR).collect()
    }
    basins = q["watershed_basins"](spark, SF_DIR).collect()
    mass = {}
    size = {}
    for r in basins:
        key = (r.basin_cx, r.basin_cy)
        mass[key] = mass.get(key, 0) + acc[(r.cx, r.cy)].v
        size[key] = size.get(key, 0) + 1
    assert mass, "no basins at sf0.001?"
    for key, m in mass.items():
        sink = acc[key]
        assert sink.is_sink
        assert sink.drainage == m, f"sink {key}: drainage {sink.drainage} != basin mass {m}"
        assert sink.n_upstream == size[key] - 1


def test_nonsink_drainage_bounded_by_sink(spark, q):
    acc = q["flow_accumulation_cells"](spark, SF_DIR).collect()
    sinks = {(r.cx, r.cy): r.drainage for r in acc if r.is_sink}
    total_v = sum(r.v for r in acc)
    # every cell's drainage is positive and no cell exceeds the whole grid
    for r in acc:
        assert r.v <= r.drainage <= total_v


def test_bom_root_conserves_tree_value(spark, q):
    rows = q["bom_rollup_parts"](spark, SF_DIR).collect()
    by_root = {}
    for r in rows:
        by_root.setdefault(r.root_id, []).append(r)
    assert by_root
    for root_id, tree in by_root.items():
        root = next(r for r in tree if r.p_partkey == root_id)
        assert root.depth == 0
        assert int(root.subtree_cents) == sum(r.cents for r in tree)
        assert root.n_desc == len(tree) - 1
        # depth is consistent with the decimal-digit parent rule
        for r in tree:
            assert r.depth == len(str(r.p_partkey)) - len(str(root_id))
