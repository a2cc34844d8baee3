"""Count-min sketch: fixed-size frequency summary + heavy hitters.

The sketch is a d × w integer matrix: cell (r, c) holds the exact sum
of counts of every item whose r-th hash lands on column c. Build is ONE
hash aggregate whose output cardinality is ≤ d·w regardless of the
item-domain size — the whole point at 100 TB, where a per-item groupBy
of the full domain may be too wide but a 3×1024 summary always fits.
The point estimate for an item is min over rows of its d cells — an
overestimate (collisions only add), never an underestimate, with the
classic (ε = e/w, δ = e^-d) guarantee.

Hashes are the repo's md5-hex convention (operators/dedup.md5_long) so
a DuckDB oracle replays the sketch and the estimates bit-exactly —
every quantity is an integer sum or an integer min.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gipspark.operators.dedup import md5_long


def _col_of(item: Column, r: int, w: int) -> Column:
    return F.pmod(md5_long(F.concat(F.lit(f"{r}:"), item.cast("string"))), F.lit(w))


def cms_build(df: DataFrame, item_col: str, d: int = 3, w: int = 1024) -> DataFrame:
    """→ sketch(r, c, cnt): one explode (d rows per item occurrence)
    and one map-side-combinable aggregate with ≤ d·w output rows."""
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), _col_of(F.col(item_col), r, w).alias("c")
                    )
                    for r in range(d)
                ]
            )
        ).alias("cell")
    ).select("cell.r", "cell.c")
    return cells.groupBy("r", "c").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame, items: DataFrame, item_col: str, d: int = 3, w: int = 1024
) -> DataFrame:
    """→ (item, est): CMS point estimate per candidate item.

    The sketch side is ≤ d·w rows, so it broadcasts; the candidate set
    can be arbitrarily large — the lookup is a broadcast join plus a
    min aggregate, never a full-corpus rescan."""
    probes = items.select(
        F.col(item_col).alias("item"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), _col_of(F.col(item_col), r, w).alias("c")
                    )
                    for r in range(d)
                ]
            )
        ).alias("cell"),
    ).select("item", "cell.r", "cell.c")
    hit = probes.join(F.broadcast(sketch), ["r", "c"], "left").select(
        "item", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    return hit.groupBy("item").agg(F.min("cnt").alias("est"))


def cms_heavy_hitters(
    df: DataFrame,
    item_col: str,
    threshold: int,
    d: int = 3,
    w: int = 1024,
) -> DataFrame:
    """Items whose CMS estimate ≥ threshold (superset of the true heavy
    hitters — CMS never underestimates). Candidates are the distinct
    items; at web scale you'd feed a pre-filtered candidate stream
    instead, the sketch itself never changes size."""
    sketch = cms_build(df, item_col, d, w)
    cand = df.select(item_col).distinct()
    est = cms_estimate(sketch, cand, item_col, d, w)
    return est.filter(F.col("est") >= threshold)
