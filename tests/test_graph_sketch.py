"""Triangle counting (operators/graph) and count-min sketch (operators/sketch)."""

from itertools import combinations

import pyspark.sql.functions as F

from gipspark.operators.graph import orient_by_degree, triangle_counts, undirect
from gipspark.operators.sketch import cms_build, cms_estimate, cms_heavy_hitters


def _brute_triangles(edge_list):
    """Per-node triangle participation via adjacency-set intersection."""
    adj = {}
    for s, d in edge_list:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    counts = {}
    for u, v, w in combinations(sorted(adj), 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            for x in (u, v, w):
                counts[x] = counts.get(x, 0) + 1
    return counts


def test_triangles_match_brute_force(spark):
    # clustered graph: ring + chords + self-loops + duplicate edges
    n = 24
    edge_list = (
        [(i, (i + 1) % n) for i in range(n)]
        + [(i, (i + 2) % n) for i in range(n)]
        + [(i, (i + 5) % n) for i in range(0, n, 3)]
        + [(4, 4), (7, 7)]           # self-loops must be dropped
        + [(0, 1), (1, 0), (2, 4)]   # duplicates/reversals must collapse
    )
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r["id"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == _brute_triangles(edge_list)


def test_triangles_on_hub_graph(spark):
    # star + one rim edge: exactly one triangle; the hub's raw degree
    # is n-1 but orientation keeps the wedge join tiny
    n = 50
    edge_list = [(0, i) for i in range(1, n)] + [(1, 2)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r["id"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {0: 1, 1: 1, 2: 1}


def test_orientation_is_acyclic_total(spark):
    edge_list = [(i, (i * 3 + 1) % 17) for i in range(17)] + [(i, (i + 1) % 17) for i in range(17)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    und = {(r["a"], r["b"]) for r in undirect(edges).collect()}
    o = orient_by_degree(undirect(edges)).collect()
    assert len(o) == len(und)  # every undirected edge oriented exactly once
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    for r in o:
        # u → v must go from the smaller (deg, id) key to the larger,
        # and kv must be v's packed key
        ku, kv = deg[r["u"]] * (1 << 32) + r["u"], deg[r["v"]] * (1 << 32) + r["v"]
        assert ku < kv and r["kv"] == kv


def test_cms_never_underestimates_and_exact_when_wide(spark):
    rows = [(f"t{i % 7}",) for i in range(140)] + [("rare",)] * 3
    df = spark.createDataFrame(rows, "term string")
    true = {}
    for (t,) in rows:
        true[t] = true.get(t, 0) + 1
    est = {
        r["item"]: r["est"]
        for r in cms_estimate(
            cms_build(df, "term", d=3, w=64), df.select("term").distinct(), "term", d=3, w=64
        ).collect()
    }
    assert set(est) == set(true)
    assert all(est[t] >= c for t, c in true.items())
    # wide sketch → no collisions among 8 items → exact
    est_wide = {
        r["item"]: r["est"]
        for r in cms_estimate(
            cms_build(df, "term", d=3, w=4096),
            df.select("term").distinct(),
            "term",
            d=3,
            w=4096,
        ).collect()
    }
    assert est_wide == true


def test_cms_heavy_hitters_superset_of_true(spark):
    rows = [("hot",)] * 60 + [("warm",)] * 25 + [(f"cold{i}",) for i in range(30)]
    df = spark.createDataFrame(rows, "term string")
    hh = {r["item"] for r in cms_heavy_hitters(df, "term", threshold=25, d=3, w=2048).collect()}
    assert {"hot", "warm"} <= hh  # CMS never misses a true heavy hitter


def test_cms_sketch_bounded(spark):
    rows = [(f"t{i}",) for i in range(5000)]
    df = spark.createDataFrame(rows, "term string")
    assert cms_build(df, "term", d=3, w=256).count() <= 3 * 256


def test_missing_item_estimates_small(spark):
    df = spark.createDataFrame([("a",)] * 10 + [("b",)] * 10, "term string")
    sketch = cms_build(df, "term", d=3, w=1024)
    ghost = spark.createDataFrame([("never-seen",)], "term string")
    est = cms_estimate(sketch, ghost, "term", d=3, w=1024).collect()[0]["est"]
    assert est <= 10  # min over rows caps a ghost at worst-collision mass
