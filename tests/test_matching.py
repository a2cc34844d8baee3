"""Property tests for the round-4 assignment/itemset operators.

capacity_matching_customers: beyond the bit-exact oracle, assert the
INVARIANTS the unrolled SQL can't state — no supplier ever exceeds its
capacity, no customer matches twice, and each matched customer's
supplier was genuinely its nearest supplier that still had a slot at
the start of its round (greedy per-round consistency, checked against
a brute-force replay in plain Python).

frequent_triples_docs: downward closure — every reported frequent
triple's three constituent pairs must each meet the same support floor
(the A-Priori prune's correctness condition; a bug in the semi-join
gating would surface here as a triple whose pair is infrequent).
"""

from __future__ import annotations

import math

from gipspark.queries import queries

SF_DIR = "/root/testdata/sf0.001"


def _haversine(lat1, lon1, lat2, lon2):
    r = 6371000.0
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = math.radians(lat2 - lat1)
    dl = math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * r * math.asin(math.sqrt(a))


def _pts(keys, mul=1, add=0):
    out = {}
    for k in keys:
        kk = k * mul + add
        out[k] = (
            ((kk * 48271) % 120000) / 1000.0 - 60.0,
            ((kk * 69621) % 360000) / 1000.0 - 180.0,
        )
    return out


def test_matching_invariants_and_greedy_replay(spark):
    import duckdb

    con = duckdb.connect()
    custkeys = [
        r[0]
        for r in con.sql(
            f"SELECT c_custkey FROM '{SF_DIR}/customer.parquet'"
        ).fetchall()
    ]
    suppkeys = [
        r[0]
        for r in con.sql(
            f"SELECT s_suppkey FROM '{SF_DIR}/supplier.parquet'"
        ).fetchall()
    ]
    rows = queries()["capacity_matching_customers"](spark, SF_DIR).collect()

    cap = {s: 1 + s % 3 for s in suppkeys}
    # invariant 1: no supplier over capacity
    per_sup: dict[int, int] = {}
    for r in rows:
        per_sup[r.s_suppkey] = per_sup.get(r.s_suppkey, 0) + 1
    for s, n in per_sup.items():
        assert n <= cap[s], f"supplier {s} over capacity: {n} > {cap[s]}"
    # invariant 2: each customer matched at most once
    assert len({r.c_custkey for r in rows}) == len(rows)

    # greedy replay in plain python (deferred acceptance, 3 rounds)
    cpts = _pts(custkeys)
    spts = _pts(suppkeys, mul=31, add=7)
    rem = dict(cap)
    unmatched = set(custkeys)
    expect = {}
    for rnd in range(1, 4):
        avail = [s for s in suppkeys if rem[s] > 0]
        if not avail:
            break
        props: dict[int, list] = {}
        for c in sorted(unmatched):
            best = min(
                avail,
                key=lambda s: (_haversine(*cpts[c], *spts[s]), s),
            )
            d = _haversine(*cpts[c], *spts[best])
            props.setdefault(best, []).append((d, c))
        for s, plist in props.items():
            plist.sort()
            for d, c in plist[: rem[s]]:
                expect[c] = (s, rnd)
                unmatched.discard(c)
            rem[s] -= min(rem[s], len(plist))
    got = {r.c_custkey: (r.s_suppkey, r.rnd) for r in rows}
    assert got == expect


def test_triples_downward_closure(spark):
    q = queries()
    triples = q["frequent_triples_docs"](spark, SF_DIR).collect()
    assert triples, "no frequent triples at sf0.001?"
    # recompute pair supports from the same capped-token definition
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from gipspark.functions import text as T
    from gipspark.queries import _COOC_CAP, _FT_SUP
    from gipspark.sources.tables import load

    d = load(spark, SF_DIR, "documents")
    dt = (
        d.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("w"))
        .filter(F.col("w").rlike("^[a-z]{3,}$"))
        .distinct()
    )
    capped = (
        dt.withColumn(
            "rn", F.row_number().over(Window.partitionBy("doc_id").orderBy("w"))
        )
        .filter(F.col("rn") <= _COOC_CAP)
        .select("doc_id", "w")
    )
    a = capped.select("doc_id", F.col("w").alias("x"))
    b = capped.select("doc_id", F.col("w").alias("y"))
    pair_sup = {
        (r.x, r.y): r.n
        for r in a.join(b, "doc_id")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for t in triples:
        for pair in ((t.w1, t.w2), (t.w1, t.w3), (t.w2, t.w3)):
            assert pair_sup.get(pair, 0) >= _FT_SUP, f"triple {t} has infrequent pair {pair}"
        # triple support can never exceed any pair's support
        assert t.support <= min(
            pair_sup[(t.w1, t.w2)], pair_sup[(t.w1, t.w3)], pair_sup[(t.w2, t.w3)]
        )
