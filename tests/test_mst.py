"""Borůvka MST vs a plain-Python Kruskal (union-find) — a third
algorithm, so operator, oracle, and test are pairwise independent.
Distinct weights ⇒ unique MST ⇒ exact edge-set equality."""

import pytest

from gipspark.operators.mst import boruvka_mst


def _kruskal(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for w, a, b in sorted((w, a, b) for a, b, w in edges):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.add((min(a, b), max(a, b), w))
    return out


def _mk(seed, n, m):
    """Deterministic pseudo-random simple graph with distinct weights."""
    es = {}
    x = seed
    while len(es) < m:
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a, b = x % n, (x >> 20) % n
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        if k not in es:
            # weight embeds the pair for guaranteed distinctness
            es[k] = ((x >> 40) % 1000) * n * n + k[0] * n + k[1]
    return [(a, b, w) for (a, b), w in es.items()]


@pytest.mark.parametrize(
    "seed,n,m",
    [(1, 12, 20), (2, 30, 60), (3, 50, 80), (4, 40, 45)],  # last one likely a forest
)
def test_boruvka_matches_kruskal(spark, seed, n, m):
    edges = _mk(seed, n, m)
    df = spark.createDataFrame(edges, "a long, b long, w long")
    got = {(r["a"], r["b"], r["w"]) for r in boruvka_mst(df).collect()}
    assert got == _kruskal(n, edges)


def test_boruvka_single_edge_and_duplicates(spark):
    df = spark.createDataFrame(
        [(1, 2, 10), (2, 1, 10), (2, 2, 5)], "a long, b long, w long"
    )
    got = {(r["a"], r["b"], r["w"]) for r in boruvka_mst(df).collect()}
    assert got == {(1, 2, 10)}
