"""khop_cheapest vs driver-side Bellman-Ford, K-round and converged."""

import numpy as np
import pytest

from gipspark.operators.shortestpath import khop_cheapest


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long, w long")


def _reference(edges, source, rounds):
    dist = {source: 0}
    for _ in range(rounds):
        new = dict(dist)
        for s, d, w in edges:
            if s in dist and dist[s] + w < new.get(d, float("inf")):
                new[d] = dist[s] + w
        dist = new
    return dist


def _random_graph(seed, n=40, m=160):
    rng = np.random.default_rng(seed)
    return [
        (int(rng.integers(n)), int(rng.integers(n)), int(rng.integers(1, 50)))
        for _ in range(m)
    ]


@pytest.mark.parametrize("seed", [0, 1])
def test_khop_matches_reference(spark, seed):
    edges = _random_graph(seed)
    got = {r.node: r.dist for r in khop_cheapest(_edges_df(spark, edges), 0, k=4).collect()}
    assert got == _reference(edges, 0, 4)


def test_converge_reaches_fixpoint_and_equals_full_bellman_ford(spark):
    edges = _random_graph(7)
    got = {
        r.node: r.dist
        for r in khop_cheapest(_edges_df(spark, edges), 0, k=0, converge=True).collect()
    }
    assert got == _reference(edges, 0, rounds=40)  # n rounds = full SSSP


def test_converge_raises_on_round_cap(spark):
    # a long chain cannot settle in 2 rounds
    edges = [(i, i + 1, 1) for i in range(10)]
    with pytest.raises(RuntimeError, match="converge"):
        khop_cheapest(_edges_df(spark, edges), 0, k=0, converge=True, max_rounds=2)
