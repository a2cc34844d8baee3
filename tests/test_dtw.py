"""Banded-DTW fold vs brute-force NumPy DP — exact equality.

The registry op (dtw_banded_traj_pairs) runs the antidiagonal
two-diagonal-state fold entirely in Catalyst; this test recomputes the
same banded DTW with an explicit O(n·m) NumPy DP from the same derived
fixes and asserts every pair's integer cost matches bit-for-bit.
"""

import numpy as np

from gipspark.queries import REGISTRY
from gipspark.functions.cells import LAT_MOD, LAT_MUL, LON_MOD, LON_MUL

SF_DIR = "/root/testdata/sf0.01"
USERS = 6
MAXLEN = 40
BAND = 5
INF = 10**15


def _haversine_m(la1, lo1, la2, lo2):
    d2r = 0.017453292519943295
    p1, p2 = la1 * d2r, la2 * d2r
    sp = np.sin((p2 - p1) / 2)
    sl = np.sin((lo2 * d2r - lo1 * d2r) / 2)
    a = sp * sp + np.cos(p1) * np.cos(p2) * sl * sl
    return round(2.0 * 6371000.0 * float(np.arcsin(np.sqrt(a))))


def _brute_dtw(A, B):
    n1, n2 = len(A), len(B)
    dp = [[INF] * (n2 + 1) for _ in range(n1 + 1)]
    for i in range(1, n1 + 1):
        for j in range(1, n2 + 1):
            if abs(i - j) > BAND:
                continue
            c = _haversine_m(A[i - 1][0], A[i - 1][1], B[j - 1][0], B[j - 1][1])
            if i == 1 and j == 1:
                dp[i][j] = c
            else:
                best = min(dp[i - 1][j], dp[i][j - 1], dp[i - 1][j - 1])
                dp[i][j] = c + best if best < INF else INF
    return dp[n1][n2]


def _trajs(spark):
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .where(f"user_id < {USERS}")
        .selectExpr("user_id", "unix_timestamp(ts) as t", "event_id")
        .collect()
    )
    per = {}
    for r in ev:
        lat = ((r.event_id * LAT_MUL) % LAT_MOD) / 1000.0 - 60.0
        lon = ((r.event_id * LON_MUL) % LON_MOD) / 1000.0 - 180.0
        per.setdefault(r.user_id, []).append((r.t, r.event_id, lat, lon))
    return {
        u: [(lat, lon) for _, _, lat, lon in sorted(v)[:MAXLEN]]
        for u, v in per.items()
    }


def test_dtw_fold_matches_brute(spark):
    got = {
        (r.u1, r.u2): r.dtw_m
        for r in REGISTRY["dtw_banded_traj_pairs"][0](spark, SF_DIR).collect()
    }
    trajs = _trajs(spark)
    assert len(got) == USERS * (USERS - 1) // 2
    for (u1, u2), val in got.items():
        expect = _brute_dtw(trajs[u1], trajs[u2])
        assert val == expect, (u1, u2, val, expect)
