"""Douglas-Peucker trajectory simplification vs an independent
recursive reference (textbook formulation, no shared code with the
iterative NumPy kernel)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from gipspark.operators.trajectory import (
    rdp_keep_mask,
    simplify_trajectories,
    simplify_trajectory_points,
)


def _rdp_ref(pts: list[tuple[float, float]], eps: float) -> list[int]:
    """Recursive textbook Douglas-Peucker; returns kept indices."""

    def perp(p, a, b):
        (px, py), (ax, ay), (bx, by) = p, a, b
        dx, dy = bx - ax, by - ay
        n = math.hypot(dx, dy)
        if n == 0.0:
            return math.hypot(px - ax, py - ay)
        return abs(dx * (py - ay) - dy * (px - ax)) / n

    def rec(lo, hi):
        if hi - lo < 2:
            return []
        dmax, imax = -1.0, -1
        for i in range(lo + 1, hi):
            d = perp(pts[i], pts[lo], pts[hi])
            if d > dmax:
                dmax, imax = d, i
        if dmax > eps:
            return rec(lo, imax) + [imax] + rec(imax, hi)
        return []

    n = len(pts)
    if n == 0:
        return []
    if n == 1:
        return [0]
    return sorted([0, n - 1] + rec(0, n - 1))


@pytest.mark.parametrize("seed", [7, 21, 99])
@pytest.mark.parametrize("eps", [0.5, 2.0, 10.0])
def test_mask_matches_recursive_reference(seed, eps):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(3, 120))
    x = np.cumsum(rng.normal(0, 3.0, n))
    y = np.cumsum(rng.normal(0, 3.0, n))
    got = np.flatnonzero(rdp_keep_mask(x, y, eps)).tolist()
    want = _rdp_ref(list(zip(x.tolist(), y.tolist())), eps)
    assert got == want


def test_mask_edge_cases():
    # empty / single / pair / all-collinear / coincident endpoints
    assert rdp_keep_mask(np.array([]), np.array([]), 1.0).tolist() == []
    assert rdp_keep_mask(np.array([1.0]), np.array([2.0]), 1.0).tolist() == [True]
    assert rdp_keep_mask(np.array([0.0, 5.0]), np.array([0.0, 0.0]), 1.0).tolist() == [True, True]
    x = np.arange(10.0)
    assert rdp_keep_mask(x, 2 * x, 0.01).sum() == 2  # collinear -> endpoints only
    # closed loop (first == last): degenerate chord falls back to point distance
    xs = np.array([0.0, 3.0, 3.0, 0.0, 0.0])
    ys = np.array([0.0, 0.0, 3.0, 3.0, 0.0])
    keep = rdp_keep_mask(xs, ys, 0.5)
    assert keep[0] and keep[-1] and keep.sum() >= 4


def test_eps_monotone():
    rng = np.random.default_rng(5)
    x = np.cumsum(rng.normal(0, 2.0, 200))
    y = np.cumsum(rng.normal(0, 2.0, 200))
    kept = [rdp_keep_mask(x, y, e).sum() for e in (0.1, 1.0, 5.0, 50.0)]
    assert kept == sorted(kept, reverse=True)
    assert kept[-1] == 2


def _pts(spark, n_users=12, n_per=40):
    import pandas as pd

    rng = np.random.default_rng(11)
    rows = []
    for u in range(n_users):
        for i in range(n_per):
            rows.append(
                {
                    "user_id": u,
                    "ts": i,
                    "event_id": u * 1000 + i,
                    "lat": float(np.cumsum(rng.normal(0, 1.0, 1))[0] + u),
                    "lon": float(rng.normal(0, 4.0)),
                }
            )
    return spark.createDataFrame(pd.DataFrame(rows))


def test_spark_matches_local_and_partitioning_invariant(spark):
    pts = _pts(spark)
    out1 = {
        r.user_id: (r.n_points, r.n_kept, r.endpoints_kept)
        for r in simplify_trajectories(pts, 2.0, order_cols=("ts", "event_id")).collect()
    }
    out2 = {
        r.user_id: (r.n_points, r.n_kept, r.endpoints_kept)
        for r in simplify_trajectories(
            pts.repartition(7, "event_id"), 2.0, order_cols=("ts", "event_id")
        ).collect()
    }
    assert out1 == out2
    # cross-check one user against the reference on the same data
    pdf = pts.where("user_id = 3").toPandas().sort_values(["ts", "event_id"])
    want = _rdp_ref(list(zip(pdf.lon.tolist(), pdf.lat.tolist())), 2.0)
    assert out1[3] == (len(pdf), len(want), True)


def test_point_level_variant_consistent(spark):
    pts = _pts(spark, n_users=4, n_per=30)
    summary = {r.user_id: r.n_kept for r in simplify_trajectories(pts, 1.0).collect()}
    kept = simplify_trajectory_points(pts, 1.0).collect()
    by_user: dict[int, list] = {}
    for r in kept:
        by_user.setdefault(r.user_id, []).append(r.seq)
    assert {u: len(s) for u, s in by_user.items()} == summary
    for u, seqs in by_user.items():
        assert min(seqs) == 0 and max(seqs) == 29  # endpoints retained


def test_hausdorff_pairs_vs_brute(spark):
    # blocked max-min == literal brute-force Hausdorff for every pair
    # the blocking emits; directed asymmetry exercised (a tight cluster
    # vs a spread path gives d_ab != d_ba)
    import random

    from gipspark.operators.trajectory import hausdorff_pairs

    rng = random.Random(5)
    rows = []
    traj = {}
    for u in range(8):
        k = rng.randrange(3, 9)
        ps = [(rng.randrange(-5000, 5000), rng.randrange(-5000, 5000)) for _ in range(k)]
        traj[u] = ps
        rows += [(u, u * 100 + i, la, lo) for i, (la, lo) in enumerate(ps)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, la long, lo long")
    got = {
        (r.user_a, r.user_b): (r.d2_ab, r.d2_ba, r.d2_hausdorff)
        for r in hausdorff_pairs(df, block_w=4000).collect()
    }
    assert got, "blocking produced no candidate pairs"

    def directed(a, b):
        return max(min((p[0]-q[0])**2 + (p[1]-q[1])**2 for q in b) for p in a)

    for (ua, ub), (dab, dba, dh) in got.items():
        assert dab == directed(traj[ua], traj[ub])
        assert dba == directed(traj[ub], traj[ua])
        assert dh == max(dab, dba)
    assert any(v[0] != v[1] for v in got.values())


def test_frechet_matches_brute_force_and_bounds_hausdorff(spark):
    """frechet_pairs == recursive brute-force DP per pair, and the
    discrete Fréchet distance lower-bounds at the Hausdorff distance
    (dF ≥ dH always) on the same capped point sets."""
    import functools

    from gipspark.operators.trajectory import frechet_pairs, hausdorff_pairs

    rng = np.random.default_rng(11)
    rows = []
    for u in range(8):
        n = int(rng.integers(1, 9))
        for i in range(n):
            rows.append((u, u * 100 + i, i, int(rng.integers(0, 100)), int(rng.integers(0, 100))))
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts long, la long, lo long")
    got = {
        (r.user_a, r.user_b): (r.n_a, r.n_b, r.d2_frechet)
        for r in frechet_pairs(df, block_w=1000).collect()
    }
    # block_w=1000 covers everything: all pairs are candidates
    assert len(got) == 8 * 7 // 2

    by_u = {}
    for u, _, ts, la, lo in sorted(rows, key=lambda r: (r[0], r[2], r[1])):
        by_u.setdefault(u, []).append((la, lo))

    def brute(a, b):
        @functools.lru_cache(maxsize=None)
        def dp(i, j):
            d2 = (a[i][0] - b[j][0]) ** 2 + (a[i][1] - b[j][1]) ** 2
            if i == 0 and j == 0:
                return d2
            if i == 0:
                return max(d2, dp(0, j - 1))
            if j == 0:
                return max(d2, dp(i - 1, 0))
            return max(d2, min(dp(i - 1, j), dp(i, j - 1), dp(i - 1, j - 1)))

        return dp(len(a) - 1, len(b) - 1)

    for (ua, ub), (n_a, n_b, d2f) in got.items():
        a, b = by_u[ua], by_u[ub]
        assert (n_a, n_b) == (len(a), len(b))
        assert d2f == brute(tuple(a), tuple(b)), (ua, ub)

    haus = {
        (r.user_a, r.user_b): r.d2_hausdorff
        for r in hausdorff_pairs(df, block_w=1000).collect()
    }
    for k, (_, _, d2f) in got.items():
        assert d2f >= haus[k]
