"""PAVA isotonic regression: kernel properties + grouped operator vs
brute force.

The kernel oracle is an O(n²)-ish reference PAVA written differently
(repeated full left-to-right sweeps until no violation) so agreement
is method-independent, plus the defining optimality properties:
monotone fit, pool means = pooled data means, and fit preserved on
already-monotone input.
"""

import random

from pyspark.sql import functions as F

from gipspark.operators.isotonic import isotonic_fit, pava_pools


def brute_pava(sums, cnts):
    """Reference PAVA by repeated full sweeps (different algorithm
    shape from the stack kernel)."""
    pools = [[i, i, s, c] for i, (s, c) in enumerate(zip(sums, cnts))]  # [b0,b1,s,c]
    changed = True
    while changed:
        changed = False
        i = 0
        while i + 1 < len(pools):
            a, b = pools[i], pools[i + 1]
            if a[2] * b[3] > b[2] * a[3]:  # mean(a) > mean(b)
                pools[i] = [a[0], b[1], a[2] + b[2], a[3] + b[3]]
                del pools[i + 1]
                changed = True
                i = max(i - 1, 0)
            else:
                i += 1
    out = []
    for pid, (b0, b1, s, c) in enumerate(pools):
        for b in range(b0, b1 + 1):
            out.append((b, s, c, pid))
    return out


def test_kernel_matches_brute_random():
    rng = random.Random(7)
    for trial in range(200):
        n = rng.randint(1, 12)
        sums = [rng.randint(0, 50) for _ in range(n)]
        cnts = [rng.randint(1, 9) for _ in range(n)]
        assert pava_pools(sums, cnts) == brute_pava(sums, cnts), (sums, cnts)


def test_kernel_monotone_and_mean_preserving():
    rng = random.Random(13)
    for trial in range(100):
        n = rng.randint(2, 15)
        sums = [rng.randint(0, 100) for _ in range(n)]
        cnts = [rng.randint(1, 7) for _ in range(n)]
        pools = pava_pools(sums, cnts)
        # fitted means non-decreasing (cross-multiplied)
        for (b1, s1, c1, _), (b2, s2, c2, _) in zip(pools, pools[1:]):
            assert s1 * c2 <= s2 * c1
        # total mass preserved: each pool's (sum, cnt) equals the sum of
        # its member bins
        by_pool = {}
        for b, s, c, pid in pools:
            by_pool.setdefault(pid, [s, c, 0, 0])
            by_pool[pid][2] += sums[b]
            by_pool[pid][3] += cnts[b]
        for s, c, ms, mc in by_pool.values():
            assert (s, c) == (ms, mc)


def test_kernel_identity_on_monotone_input():
    sums = [0, 2, 6, 12, 40]
    cnts = [2, 2, 3, 4, 8]  # means 0, 1, 2, 3, 5 — already increasing
    pools = pava_pools(sums, cnts)
    assert [p[3] for p in pools] == [0, 1, 2, 3, 4]
    assert [(p[1], p[2]) for p in pools] == list(zip(sums, cnts))


def test_grouped_operator_matches_kernel(spark):
    rng = random.Random(99)
    rows = []
    expected = {}
    for g in ("a", "b", "c"):
        n = rng.randint(3, 10)
        sums = [rng.randint(0, 30) for _ in range(n)]
        cnts = [rng.randint(1, 5) for _ in range(n)]
        expected[g] = pava_pools(sums, cnts)
        for b, (s, c) in enumerate(zip(sums, cnts)):
            rows.append((g, b, s, c))
    df = spark.createDataFrame(rows, "g string, bin int, sum_y bigint, cnt bigint")
    got = isotonic_fit(df, ["g"]).collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r["g"], []).append(
            (r["bin"], r["pool_sum"], r["pool_cnt"], r["pool_id"], r["fitted_q"])
        )
    for g, pools in expected.items():
        rows_g = sorted(by_g[g])
        assert len(rows_g) == len(pools)
        for (b, s, c, pid), (gb, gs, gc, gpid, gq) in zip(pools, rows_g):
            assert (b, s, c, pid) == (gb, gs, gc, gpid)
            assert gq == (s * 1000000) // c
