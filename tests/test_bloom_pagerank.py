"""Bloom pre-join pruning and integer PageRank (operators/bloom, pagerank)."""

import pyspark.sql.functions as F
import pytest

from gipspark.operators.bloom import bloom_candidates, bloom_semi_join, build_bloom_bits
from gipspark.operators.pagerank import SCALE, pagerank_int


def test_bloom_semi_join_equals_plain_semi(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    build = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(F.col("c_acctbal") > 8000)
    got = {tuple(r) for r in bloom_semi_join(orders, build, "o_custkey", "c_custkey").collect()}
    want = {
        tuple(r)
        for r in orders.join(
            build.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "left_semi"
        ).collect()
    }
    assert got == want and len(got) > 0


def test_bloom_candidates_superset_and_selective(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    build = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(F.col("c_acctbal") > 9900)
    cand = bloom_candidates(orders, build, "o_custkey", "c_custkey")
    true_keys = {r[0] for r in build.select("c_custkey").collect()}
    cand_rows = cand.collect()
    # superset: every true match survives the bitmask gate
    hits = [r for r in cand_rows if r["o_custkey"] in true_keys]
    want = orders.filter(F.col("o_custkey").isin(list(true_keys))).count()
    assert len(hits) == want
    # selective: with a tiny build side, the gate prunes most of the probe
    assert len(cand_rows) < orders.count() * 0.2


def test_bloom_bits_bounded_by_mask_width(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    bits = build_bloom_bits(cust, "c_custkey", m_bits=256, k=3)
    assert bits and all(0 <= b < 256 for b in bits)


def test_bloom_rejects_bad_mask_width(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    with pytest.raises(AssertionError):
        build_bloom_bits(cust, "c_custkey", m_bits=1000, k=3)  # not a power of two


def _pagerank_reference(n, edge_list, iters, scale):
    """Driver-side integer replay: same floor-division damping."""
    from collections import defaultdict

    outdeg = defaultdict(int)
    for s, _ in edge_list:
        outdeg[s] += 1
    base = (15 * (scale // n)) // 100
    rank = {i: scale // n for i in range(n)}
    for _ in range(iters):
        in_sum = defaultdict(int)
        for s, d in edge_list:
            in_sum[d] += rank[s] // outdeg[s]
        rank = {i: base + (85 * in_sum.get(i, 0)) // 100 for i in range(n)}
    return rank


def test_pagerank_matches_integer_reference(spark):
    n = 40
    edge_list = [(i, (i * 7 + j * 13) % n) for i in range(n) for j in range(3)]
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r["id"]: r["rank"] for r in pagerank_int(nodes, edges, n_nodes=n, iters=4).collect()}
    want = _pagerank_reference(n, edge_list, iters=4, scale=SCALE)
    assert got == want


def test_pagerank_invariant_to_partitioning(spark):
    n = 30
    edge_list = [(i, (i * 11 + j * 5) % n) for i in range(n) for j in range(2)]
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    a = {tuple(r) for r in pagerank_int(nodes, edges, n, iters=3).collect()}
    b = {
        tuple(r)
        for r in pagerank_int(
            nodes.repartition(7), edges.repartition(11, "dst"), n, iters=3
        ).collect()
    }
    assert a == b


def test_pagerank_sink_attracts_mass(spark):
    # star: everyone links to node 0 and one other; node 0's rank must dominate
    n = 20
    edge_list = [(i, 0) for i in range(n)] + [(i, (i + 1) % n) for i in range(n)]
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    ranks = {r["id"]: r["rank"] for r in pagerank_int(nodes, edges, n, iters=5).collect()}
    assert ranks[0] == max(ranks.values())
    assert ranks[0] > 3 * (SCALE // n)


def test_hits_int_vs_brute(spark):
    import random
    from collections import defaultdict

    from gipspark.operators.graph import hits_int

    rng = random.Random(21)
    n = 120
    edge_list = {(rng.randrange(n), rng.randrange(n)) for _ in range(400)}
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(sorted(edge_list), "src long, dst long")
    got = {(r.id, r.hub, r.auth) for r in hits_int(nodes, edges).collect()}

    a1 = defaultdict(int)
    for s, d in edge_list:
        a1[d] += 1
    h1 = defaultdict(int)
    for s, d in edge_list:
        h1[s] += a1[d]
    a2 = defaultdict(int)
    for s, d in edge_list:
        a2[d] += h1[s]
    want = {(i, h1[i], a2[i]) for i in range(n)}
    assert got == want
