"""Sequential integer recurrences over grouped, ordered series.

Two operator families share this shape: the recurrence is genuinely
order-dependent (floored integer state updates are non-associative, so
no window/agg can express them), but the series PER GROUP is bounded by
the calendar (observed days per cell; distinct gap-minutes per event
type), so one `applyInPandas` per group with an exact Python-int loop
is both correct and scale-safe: the shuffle is the group key, the
per-group work is O(series length), and no state ever crosses groups.
The DuckDB oracles replay the identical recurrence with WITH RECURSIVE
over the step index — bit-exact because every update is integer
arithmetic with truncating division (DuckDB `//` and Spark `div`
truncate toward zero; the kernels below implement the same rule
explicitly, since Python's `//` floors).

Exactness envelope: kernels accumulate in arbitrary-precision Python
ints and cast to int64 on emit, so outputs are exact wherever they fit
int64 (documented per query); the HOLT tick scale (1e6) and KM tick
scale (1e12) keep final states well inside that at any realistic
per-group magnitude.
"""

from __future__ import annotations

import pandas as pd

HOLT_TICK = 1_000_000
KM_TICK = 1_000_000_000_000


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (toward zero) for positive b —
    matches Spark `div` and DuckDB `//`, NOT Python `//` (floors)."""
    q = abs(a) // b
    return -q if a < 0 else q


def holt_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Holt double-exponential smoothing, alpha=1/5, beta=1/10, in
    integer micro-ticks with truncating division:

        l_1 = x_1*T, b_1 = 0
        l_k = trunc((x_k*T + 4*(l_{k-1}+b_{k-1})) / 5)
        b_k = trunc(((l_k - l_{k-1}) + 9*b_{k-1}) / 10)

    One-step forecast error e_k = x_k*T - (l_{k-1}+b_{k-1}) accumulates
    into SSE (exact Python ints inside the loop)."""
    pdf = pdf.sort_values("d")
    xs = [int(v) for v in pdf["x"]]
    lvl = xs[0] * HOLT_TICK
    trd = 0
    sse = 0
    for x in xs[1:]:
        prev = lvl + trd
        err = x * HOLT_TICK - prev
        sse += err * err
        new_lvl = _tdiv(x * HOLT_TICK + 4 * prev, 5)
        trd = _tdiv((new_lvl - lvl) + 9 * trd, 10)
        lvl = new_lvl
    return pd.DataFrame(
        [
            {
                "gx": int(pdf["gx"].iloc[0]),
                "gy": int(pdf["gy"].iloc[0]),
                "n_days": len(xs),
                "level_q": lvl,
                "trend_q": trd,
                "forecast_q": lvl + trd,
                "sse_q": sse,
            }
        ]
    )


def burst2_kernel(flat_cost: int, switch_cost: int):
    """Two-state burst Viterbi (Kleinberg-style, integer costs) with
    path statistics carried FORWARD so no backtracking is needed:
    state 0 (normal) pays `flat_cost` per gap, state 1 (burst) pays
    the gap itself, switching pays `switch_cost`. Each state carries
    the optimal (cost, n_bursts, burst_minutes) ending there; ties
    prefer STAYING in the current state (deterministic, mirrored by
    the oracle's <=). Start: state 0 free; state 1 starts one switch
    deep with its burst already counted."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("k")
        gaps = [int(g) for g in pdf["g"]]
        c0, b0, t0 = 0, 0, 0
        c1, b1, t1 = switch_cost, 1, 0
        for g in gaps:
            n0 = (
                (c0 + flat_cost, b0, t0)
                if c0 <= c1 + switch_cost
                else (c1 + switch_cost + flat_cost, b1, t1)
            )
            n1 = (
                (c1 + g, b1, t1 + g)
                if c1 <= c0 + switch_cost
                else (c0 + switch_cost + g, b0 + 1, t0 + g)
            )
            (c0, b0, t0), (c1, b1, t1) = n0, n1
        if c0 <= c1:
            cost, nb, tb = c0, b0, t0
        else:
            cost, nb, tb = c1, b1, t1
        return pd.DataFrame(
            [
                {
                    "user_id": int(pdf["user_id"].iloc[0]),
                    "n_gaps": len(gaps),
                    "total_cost": cost,
                    "n_bursts": nb,
                    "burst_minutes": tb,
                }
            ]
        )

    return kernel


def km_kernel(horizons: list[int]):
    """Kaplan-Meier product-limit estimator in integer ticks: process
    distinct duration minutes ascending; at each step the survival
    update S <- trunc(S * (n - d) / n) happens BEFORE the risk set
    drops the step's censored rows (the standard deaths-first
    convention). Emits the curve sampled at the fixed horizon grid."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("m")
        g = pdf["g"].iloc[0]
        steps = [(int(m), int(d), int(c)) for m, d, c in zip(pdf["m"], pdf["d"], pdf["c"])]
        total = sum(d + c for _, d, c in steps)
        out = []
        surv = KM_TICK
        n = total
        i = 0
        for h in horizons:
            while i < len(steps) and steps[i][0] <= h:
                _, d, c = steps[i]
                if d > 0:
                    surv = _tdiv(surv * (n - d), n)
                n -= d + c
                i += 1
            out.append({"event_type": g, "horizon_min": h, "surv_q12": surv, "at_risk": n})
        return pd.DataFrame(out)

    return kernel
