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


def test_dbscan_point_level_vs_brute(spark):
    # handcrafted geometry + randomized cloud, checked against a
    # literal brute-force DBSCAN: exact ε-ball counts, component
    # minima, min-adjacent border attachment, noise = -1. Includes
    # cell-boundary-straddling pairs, a two-cluster bridge border
    # point, coincident duplicates, and isolated noise.
    import random

    from gipspark.operators.dbscan import dbscan

    rng = random.Random(23)
    pts = [(i, rng.randrange(-20000, 20000), rng.randrange(-20000, 20000)) for i in range(300)]
    # dense blob around (15000, 15000)
    pts += [(300 + i, 15000 + rng.randrange(-800, 800), 15000 + rng.randrange(-800, 800)) for i in range(20)]
    # second blob two cells away, plus a border point between blobs
    pts += [(320 + i, -15000 + rng.randrange(-500, 500), -15000 + rng.randrange(-500, 500)) for i in range(10)]
    pts += [(330, 15950, 15950)]  # likely border of blob 1
    pts += [(331, pts[300][1], pts[300][2])]  # coincident duplicate
    eps, min_pts = 1000, 4

    got = {r.id: (r.role, r.cluster_id) for r in dbscan(
        spark.createDataFrame(pts, "id long, la long, lo long"), eps, min_pts
    ).collect()}
    assert len(got) == len(pts)

    # brute force
    n = len(pts)
    ids = [p[0] for p in pts]
    nbr = {i: set() for i in ids}
    for i in range(n):
        for j in range(i + 1, n):
            d2 = (pts[i][1] - pts[j][1]) ** 2 + (pts[i][2] - pts[j][2]) ** 2
            if d2 <= eps * eps:
                nbr[pts[i][0]].add(pts[j][0])
                nbr[pts[j][0]].add(pts[i][0])
    cores = {i for i in ids if 1 + len(nbr[i]) >= min_pts}
    # components over core-core edges
    comp = {i: i for i in cores}

    def find(x):
        while comp[x] != x:
            comp[x] = comp[comp[x]]
            x = comp[x]
        return x

    for i in cores:
        for j in nbr[i]:
            if j in cores:
                a, b = find(i), find(j)
                if a != b:
                    comp[max(a, b)] = min(a, b)
    cluster = {i: find(i) for i in cores}
    roles = {}
    for i in ids:
        if i in cores:
            roles[i] = ("core", cluster[i])
        else:
            adj = sorted(cluster[j] for j in nbr[i] if j in cores)
            roles[i] = ("border", adj[0]) if adj else ("noise", -1)
    assert got == roles
    # the fixture must actually exercise all three roles
    kinds = {v[0] for v in roles.values()}
    assert kinds == {"core", "border", "noise"}
