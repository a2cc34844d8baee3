"""Luby MIS: independence + maximality properties, sequential replay,
and adversarial shapes (clique, star, path, isolated nodes)."""

import pytest
from pyspark.sql import functions as F

from gipspark.operators.dedup import md5_long
from gipspark.operators.mis import luby_mis


def _df_graph(spark, n, edge_list):
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    if edge_list:
        edges = spark.createDataFrame(edge_list, "src long, dst long")
    else:
        edges = spark.createDataFrame([], "src long, dst long")
    return nodes, edges


def _brute_mis(spark, n, edge_list):
    """Sequential replay of the exact same round rule in plain Python."""
    pri = {
        r["node"]: r["p"]
        for r in spark.createDataFrame([(i,) for i in range(n)], "node long")
        .withColumn("p", md5_long(F.concat(F.lit("mis:"), F.col("node").cast("string"))))
        .collect()
    }
    adj = {i: set() for i in range(n)}
    for s, d in edge_list:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    active = set(range(n))
    out = {}
    rnd = 0
    while active:
        rnd += 1
        winners = {
            v
            for v in active
            if all((pri[v], v) > (pri[u], u) for u in adj[v] & active)
        }
        assert winners, "deterministic Luby must make progress"
        for v in winners:
            out[v] = rnd
        removed = set(winners)
        for v in winners:
            removed |= adj[v] & active
        active -= removed
    return out


GRAPHS = {
    "path": (6, [(i, i + 1) for i in range(5)]),
    "clique": (5, [(i, j) for i in range(5) for j in range(i + 1, 5)]),
    "star": (7, [(0, i) for i in range(1, 7)]),
    "two_comps_isolated": (8, [(0, 1), (1, 2), (4, 5)]),
    "self_loops_dups": (4, [(0, 0), (0, 1), (1, 0), (2, 3), (2, 3)]),
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_mis_matches_sequential_replay(spark, name):
    n, el = GRAPHS[name]
    nodes, edges = _df_graph(spark, n, el)
    got = {r["node"]: r["round"] for r in luby_mis(nodes, edges).collect()}
    assert got == _brute_mis(spark, n, el)


def test_mis_independent_and_maximal(spark, sf_dir):
    """On the md5 doc-link fixture: no two MIS members adjacent, and
    every non-member has an MIS neighbor (maximality)."""
    from gipspark.sources.tables import load, table_rows

    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    nodes = d.select(F.col("doc_id").alias("id"))
    edges = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    md5_long(F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))) % n
                    for j in range(3)
                ]
            )
        ).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    mis = luby_mis(nodes, edges).select(F.col("node").alias("m"))
    und = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    # independence: no edge with both endpoints in the MIS
    viol = (
        und.join(mis.withColumnRenamed("m", "a"), "a")
        .join(mis.withColumnRenamed("m", "b"), "b")
        .count()
    )
    assert viol == 0
    # maximality: every non-member is adjacent to a member
    sym = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    covered = sym.join(mis.withColumnRenamed("m", "b"), "b").select("a").distinct()
    uncovered = (
        nodes.join(mis.withColumnRenamed("m", "id"), "id", "anti")
        .join(covered.withColumnRenamed("a", "id"), "id", "anti")
        .count()
    )
    assert uncovered == 0
