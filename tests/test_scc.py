"""strongly_connected_components vs pure-Python Tarjan.

Covers the algorithm's structural edge cases: pure DAG (all
singletons, dissolved by trim alone), one global cycle, a chain of
2-cycles (the FW-BW worst case — one SCC per outer round without
trim help), nested/overlapping cycles, isolated nodes, and a
deterministic random digraph.
"""

import pytest

from gipspark.operators.scc import strongly_connected_components


def tarjan(n_nodes, edges):
    """Iterative Tarjan; returns {node: min_member_of_scc}."""
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    result = {}
    counter = [0]

    for root in range(n_nodes):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            for i in range(pi, len(adj.get(v, []))):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    result[w] = m
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    return result


CASES = {
    "dag": (8, [(0, 1), (1, 2), (2, 3), (0, 4), (4, 5), (5, 3), (6, 7)]),
    "one_cycle": (6, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0)]),
    "chain_of_2cycles": (
        10,
        [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (3, 4), (4, 5), (5, 4), (5, 6), (6, 7), (7, 6), (7, 8), (8, 9), (9, 8)],
    ),
    "nested": (7, [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (4, 5), (5, 6)]),
    "isolated": (5, [(1, 2), (2, 1)]),
    "reversed_path": (8, [(7, 6), (6, 5), (5, 4), (4, 3), (3, 2), (2, 1), (1, 0)]),
}


def _random_digraph(n=60, seed=99991):
    s = seed
    edges = []
    for v in range(n):
        for _ in range(2):
            s = (s * 48271) % 2147483647
            edges.append((v, s % n))
    return n, [(a, b) for a, b in edges if a != b]


@pytest.mark.parametrize("case", sorted(CASES))
def test_scc_matches_tarjan(spark, case):
    n, edges = CASES[case]
    _check(spark, n, edges)


def test_scc_random_digraph(spark):
    n, edges = _random_digraph()
    _check(spark, n, edges)


def _check(spark, n, edges):
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.scc
        for r in strongly_connected_components(nodes, edf).collect()
    }
    want = tarjan(n, edges)
    assert got == want
