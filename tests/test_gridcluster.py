"""grid_cluster vs a driver-side union-find reference.

Synthetic point layouts with engineered topology: multi-cell blobs,
diagonal-only adjacency, isolated dense cells, sparse noise below the
density threshold. The reference computes dense cells and components
with plain Python sets/union-find — no Spark, no SQL.
"""

import pytest

from gipspark.operators.gridcluster import grid_cluster

DEG = 2.5
MIN_PTS = 3


STRIDE = 1000


def _cell(lat, lon, deg=DEG):
    import math

    return int(math.floor((lon + 180.0) / deg)) * STRIDE + int(math.floor((90.0 - lat) / deg))


def _reference(points, min_points=MIN_PTS, deg=DEG):
    from collections import Counter

    counts = Counter(_cell(la, lo, deg) for la, lo in points)
    dense = {c: n for c, n in counts.items() if n >= min_points}
    parent = {c: c for c in dense}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for c in dense:
        gx, gy = c // STRIDE, c % STRIDE
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == dy == 0:
                    continue
                nb = (gx + dx) * STRIDE + (gy + dy)
                if nb in dense:
                    union(c, nb)
    return {c: (find(c), n) for c, n in dense.items()}


def _pts_df(spark, points):
    return spark.createDataFrame([(la, lo) for la, lo in points], "lat double, lon double")


def _blob(lat, lon, n):
    # n points inside one cell
    return [(lat + 0.01 * i, lon + 0.01 * i) for i in range(n)]


LAYOUTS = {
    # two dense cells sharing an edge + one isolated dense cell
    "edge_pair_plus_isolate": _blob(10.1, 20.1, 3) + _blob(10.1, 22.7, 4) + _blob(-30.1, 100.1, 5),
    # diagonal adjacency only (corner-touching cells must merge under 8-neighborhood)
    "diagonal": _blob(10.1, 20.1, 3) + _blob(12.7, 22.7, 3),
    # chain of four cells -> single component labeled by min cell id
    "chain4": sum((_blob(10.1, 20.1 + DEG * k, 3) for k in range(4)), []),
    # sparse noise below threshold contributes nothing
    "noise_only": [(5.0 + i, 30.0 + 2 * i) for i in range(6)],
    # blob + nearby noise: noise cells vanish, blob survives
    "blob_and_noise": _blob(40.1, -60.2, 6) + [(41.0, -50.0), (42.0, -40.0)],
}


@pytest.mark.parametrize("name", sorted(LAYOUTS))
def test_grid_cluster_matches_union_find(spark, name):
    points = LAYOUTS[name]
    got = {
        r.cell_id: (r.cluster_id, r.n_points)
        for r in grid_cluster(_pts_df(spark, points), DEG, MIN_PTS).collect()
    }
    assert got == _reference(points)


def test_diagonal_layout_is_one_component(spark):
    points = LAYOUTS["diagonal"]
    rows = grid_cluster(_pts_df(spark, points), DEG, MIN_PTS).collect()
    assert len(rows) == 2
    assert len({r.cluster_id for r in rows}) == 1


def test_chain_converges_to_min_label(spark):
    points = LAYOUTS["chain4"]
    rows = grid_cluster(_pts_df(spark, points), DEG, MIN_PTS).collect()
    assert len(rows) == 4
    assert {r.cluster_id for r in rows} == {min(r.cell_id for r in rows)}


def test_noise_only_is_empty(spark):
    assert grid_cluster(_pts_df(spark, LAYOUTS["noise_only"]), DEG, MIN_PTS).count() == 0


def test_pole_row_no_alias_at_cell_deg_1_8(spark):
    # regression (ADVICE r2): at cell_deg=1.8 the old gx*100+gy encoding
    # put lat=-90 at gy=100, aliasing into the next gx column. A dense
    # pole cell and a dense cell in the NEXT gx column's gy=0 slot must
    # stay separate components.
    deg = 1.8
    pole = [(-89.95, 20.1 + 0.01 * i) for i in range(3)]  # gy = 99
    next_col_top = [(89.95, 20.1 + deg + 0.01 * i) for i in range(3)]  # gx+1, gy = 0
    points = pole + next_col_top
    got = {
        r.cell_id: (r.cluster_id, r.n_points)
        for r in grid_cluster(_pts_df(spark, points), deg, MIN_PTS).collect()
    }
    assert got == _reference(points, deg=deg)
    assert len({cid for cid, _ in got.values()}) == 2


def test_cell_deg_below_stride_guard_raises(spark):
    with pytest.raises(ValueError, match="stride"):
        grid_cluster(_pts_df(spark, LAYOUTS["noise_only"]), cell_deg=0.1, min_points=1)
