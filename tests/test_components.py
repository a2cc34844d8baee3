"""Connected components vs a python union-find oracle."""

import random

from pyspark.sql import functions as F

from gipspark.operators.components import connected_components


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min node of the component
    comp = {}
    for n in list(parent):
        comp[n] = find(n)
    return comp


def test_components_match_union_find_random_graph(spark):
    rng = random.Random(17)
    edges = set()
    # 30 chains/stars/cliques mixed, 400 nodes
    for c in range(30):
        base = c * 13
        kind = c % 3
        if kind == 0:  # chain — worst case for propagation depth
            for i in range(6):
                edges.add((base + i, base + i + 1))
        elif kind == 1:  # star
            for i in range(1, 7):
                edges.add((base, base + i))
        else:  # random clique-ish
            nodes = [base + rng.randrange(8) for _ in range(6)]
            for a, b in zip(nodes, nodes[1:]):
                if a != b:
                    edges.add((min(a, b), max(a, b)))
    df = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
    got = {r.node: r.comp for r in connected_components(df).collect()}
    want = _union_find(sorted(edges))
    assert got == want


def test_components_close_near_dup_chain(spark):
    # a~b and b~c but never a~c directly: closure must unify all three
    df = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    got = {r.node: r.comp for r in connected_components(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_components_long_chain_converges_fast(spark):
    # diameter 60 ≫ the old per-round hop limit; pointer-jumping must
    # close it well inside max_iter (2^10 > 60 → ~7 rounds)
    edges = [(i, i + 1) for i in range(60)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: r.comp for r in connected_components(df, max_iter=10).collect()}
    assert got == {i: 0 for i in range(61)}


def test_components_raises_when_not_converged(spark):
    # max_iter=1 cannot close a 6-chain even with jumping; must raise,
    # never silently return partial labels
    edges = [(i, i + 1) for i in range(6)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    try:
        connected_components(df, max_iter=1)
        raise AssertionError("expected RuntimeError")
    except RuntimeError as e:
        assert "converge" in str(e)


# --- alias-chain resolution (operators/chains.py) ---------------------------


def test_resolve_chains_vs_brute(spark):
    import random

    from gipspark.operators.chains import resolve_chains

    rng = random.Random(13)
    n = 300
    nxt = {}
    for i in range(n):
        if i < 3 or rng.random() < 0.15:
            nxt[i] = None
        else:
            nxt[i] = i - rng.randrange(1, 4)  # strictly decreasing → acyclic
    rows = [(i, nxt[i]) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, next long")
    got = {(r.id, r.final_id, r.hops) for r in resolve_chains(df).collect()}

    want = set()
    for i in range(n):
        cur, hops = i, 0
        while nxt.get(cur) is not None:
            cur = nxt[cur]
            hops += 1
        want.add((i, cur, hops))
    assert got == want


def test_resolve_chains_cycle_raises(spark):
    import pytest

    from gipspark.operators.chains import resolve_chains

    df = spark.createDataFrame([(0, 1), (1, 0)], "id long, next long")
    with pytest.raises(RuntimeError, match="cycle|converge"):
        resolve_chains(df, max_iter=6)


def test_resolve_chains_unknown_target_terminates(spark):
    from gipspark.operators.chains import resolve_chains

    # 2 aliases to 99 which is not a known node: resolves to 99 at 1 hop
    df = spark.createDataFrame([(1, None), (2, 99)], "id long, next long")
    got = {(r.id, r.final_id, r.hops) for r in resolve_chains(df).collect()}
    assert got == {(1, 1, 0), (2, 99, 1)}
