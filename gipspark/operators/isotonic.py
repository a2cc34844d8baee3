"""Isotonic regression (PAVA) as a grouped vectorized operator.

Pool-Adjacent-Violators over PRE-BINNED data: the caller reduces the
big table to (group, bin, sum_y, cnt) — one map-side-combinable
aggregate — and PAVA runs per group over the bounded bin vector inside
one applyInPandas batch (the frechet_pairs/viterbi pattern: Python
touches only dim-scale data, never the fact table). Means are carried
as exact integer (sum, cnt) pairs; the merge rule compares pooled
means by cross-multiplication (sum_a·cnt_b ≥ sum_b·cnt_a), so the fit
is bit-deterministic — no float division until the caller quantizes.

The sequential-merge recurrence is why this is not SQL-expressible
(each pool depends on every previous merge decision); the registry
entry is rows-only with a brute-force pytest oracle
(tests/test_isotonic.py) instead.

At 100 TB the shape holds: the binning aggregate is the only
fact-table shuffle; groups × bins is dim-scale by construction
(calibration curves have 10-100 bins), and applyInPandas partitions
by group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pava_pools(sums: list[int], cnts: list[int]) -> list[tuple[int, int, int, int]]:
    """Pure PAVA kernel over exact integer (sum, cnt) bins (increasing
    fit). Returns one tuple per input bin: (pool_start_bin, pool_sum,
    pool_cnt, pool_id). Merge rule: while the last pool's mean exceeds
    the new pool's mean (cross-multiplied — no division), merge."""
    # stack of [start_bin, sum, cnt]
    stack: list[list[int]] = []
    for i, (s, c) in enumerate(zip(sums, cnts)):
        cur = [i, int(s), int(c)]
        # violator: prev_mean > cur_mean  ⇔  prev_s * cur_c > cur_s * prev_c
        while stack and stack[-1][1] * cur[2] > cur[1] * stack[-1][2]:
            prev = stack.pop()
            cur = [prev[0], prev[1] + cur[1], prev[2] + cur[2]]
        stack.append(cur)
    out: list[tuple[int, int, int, int]] = []
    for pid, (start, s, c) in enumerate(stack):
        end = stack[pid + 1][0] if pid + 1 < len(stack) else len(sums)
        for b in range(start, end):
            out.append((b, s, c, pid))
    return out


def isotonic_fit(
    binned: DataFrame,
    group_cols: list[str],
    bin_col: str = "bin",
    sum_col: str = "sum_y",
    cnt_col: str = "cnt",
    scale: int = 1000000,
) -> DataFrame:
    """Grouped isotonic fit over pre-binned (group, bin, sum, cnt) rows.

    Returns one row per input bin with the pooled (sum, cnt), the pool
    id, and the fitted mean quantized to ``scale`` ticks (exact integer
    division — deterministic in any engine)."""
    import pandas as pd

    out_fields = ", ".join(f"{c} string" for c in group_cols)
    schema = (
        f"{out_fields}, {bin_col} int, pool_sum bigint, pool_cnt bigint, "
        f"pool_id int, fitted_q bigint"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(bin_col)
        pools = pava_pools(pdf[sum_col].tolist(), pdf[cnt_col].tolist())
        rows = []
        keys = {c: pdf.iloc[0][c] for c in group_cols}
        bins = pdf[bin_col].tolist()
        for b_idx, s, c, pid in pools:
            rows.append(
                {
                    **keys,
                    bin_col: bins[b_idx],
                    "pool_sum": s,
                    "pool_cnt": c,
                    "pool_id": pid,
                    "fitted_q": (s * scale) // c,
                }
            )
        return pd.DataFrame(rows)

    return binned.groupBy(*[F.col(c) for c in group_cols]).applyInPandas(fit, schema)
