"""Spatio-temporal co-location join ("contact join").

Find pairs of entities observed in the same spatial cell within the
same time bucket — the canonical proximity/contact-tracing query over
telemetry. The scalable shape is NOT a distance θ-join (all-pairs per
window) but a three-step reduction:

1. quantize every fix to (cell, bucket) — narrow, in-scan;
2. DISTINCT occupancy rows per (entity, cell, bucket) — one
   map-side-combinable aggregate that collapses dwell-time repeats,
   so the join input is bounded by occupancy, not by raw fix count;
3. self equi-join on (cell, bucket) with ``id_a < id_b`` — shuffle
   keyed on the composite cell/bucket key, candidate output bounded
   by sum-over-buckets of (occupants choose 2), never |fixes|².

At 100 TB the only risk is a mega-cell (stadium hotspot): the join is
an equi-join, so AQE skew-split handles it, or callers shrink the
grid. Cell ids use the same integer lattice as
operators/gridcluster.py; production spherical cells would use the S2
index (gipspark.geo.s2) — the lattice keeps the DuckDB oracle exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def colocation_pairs(
    fixes: DataFrame,
    *,
    id_col: str = "user_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    ts_col: str = "ts",
    grid_deg: float = 10.0,
    bucket_sec: int = 21600,
) -> DataFrame:
    """Pairs (id_a, id_b, n_shared) co-present in ≥1 (cell, bucket).

    n_shared counts distinct shared (cell, bucket) slots, so repeated
    fixes inside one slot count once — the dwell-insensitive contact
    measure.
    """
    cell = (
        F.floor((F.col(lon_col) + F.lit(180.0)) / F.lit(grid_deg)).cast("int") * 100
        + F.floor((F.lit(90.0) - F.col(lat_col)) / F.lit(grid_deg)).cast("int")
    ).alias("cell")
    # unix_timestamp (UTC session) truncates sub-second — same bucket as
    # the oracle's floor(epoch(ts)/B): the fraction can't cross a
    # multiple of B because the truncated value is never on one side of
    # a boundary the fractional value is on the other side of.
    bucket = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(bucket_sec)).cast("long").alias(
        "bucket"
    )
    occ = fixes.select(F.col(id_col).alias("id"), cell, bucket).distinct()
    a = occ.select(F.col("id").alias("id_a"), "cell", "bucket")
    b = occ.select(F.col("id").alias("id_b"), "cell", "bucket")
    pairs = a.join(b, ["cell", "bucket"]).filter(F.col("id_a") < F.col("id_b"))
    return pairs.groupBy("id_a", "id_b").agg(F.count("*").alias("n_shared"))


def colocation_sql(
    pts_cte: str,
    *,
    id_col: str = "user_id",
    grid_deg: float = 10.0,
    bucket_sec: int = 21600,
) -> str:
    """DuckDB oracle for :func:`colocation_pairs` over a CTE exposing
    (id, lat, lon, ts) — textually the same quantization. Returned as
    a ``occ AS (...) SELECT ...`` fragment: callers prepend
    ``WITH {pts_cte} AS (...),``."""
    return f"""
occ AS (
  SELECT DISTINCT {id_col} AS id,
         cast(floor((lon + 180.0) / {grid_deg}) as int) * 100
           + cast(floor((90.0 - lat) / {grid_deg}) as int) AS cell,
         cast(floor(epoch(ts) / {bucket_sec}) as bigint) AS bucket
  FROM {pts_cte}
)
SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
FROM occ a JOIN occ b USING (cell, bucket)
WHERE a.id < b.id
GROUP BY a.id, b.id
"""
