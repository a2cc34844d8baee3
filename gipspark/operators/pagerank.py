"""Integer-exact PageRank over a link graph (iterative DataFrame op).

The web-analytics op the crawl corpus implies: rank pages by in-link
mass. Floating-point PageRank is order-dependent (parallel float sums
reassociate), so this variant keeps every quantity an exact BIGINT:
ranks live in integer "mass ticks" out of a global scale S, each node
ships ``rank div outdeg`` to its out-neighbors, and the damping update
is ``(15 * (S div N)) div 100 + (85 * in_sum) div 100`` — floor
division on non-negative ints, associative integer sums, so a DuckDB
oracle replaying the same unrolled iterations hashes bit-identically
regardless of partitioning.

Scale shape per iteration: one shuffle for contribs (groupBy dst) and
one key-co-partitioned join back to the node frame — the standard
distributed PageRank round. On a real cluster you pre-partition edges
by src once and reuse that exchange across iterations; iterations are
a fixed small constant (a hyperparameter, not data-dependent), and no
step materializes anything on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # total rank mass in ticks (10^12)


def pagerank_int(
    nodes: DataFrame,
    edges: DataFrame,
    n_nodes: int,
    iters: int = 3,
    scale: int = SCALE,
) -> DataFrame:
    """nodes(id), edges(src, dst) → (id, rank:bigint) after ``iters``
    damped rounds, all arithmetic BIGINT floor division (`div`).

    Dangling mass (nodes with outdeg 0, or edges to ids outside
    ``nodes``) is simply dropped — identical on both engines, and the
    synthetic link generator gives every node outdeg>0 anyway.
    """
    base = (15 * (scale // n_nodes)) // 100
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.select("id", F.lit(scale // n_nodes).cast("long").alias("rank"))
    for _ in range(iters):
        contribs = (
            edges.join(ranks.withColumnRenamed("id", "src"), "src")
            .join(deg, "src")
            .select("dst", F.expr("rank div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contribs.withColumnRenamed("dst", "id"), "id", "left")
            .select(
                "id",
                F.expr(
                    f"cast({base}L + (85L * coalesce(in_sum, 0L)) div 100L as bigint)"
                ).alias("rank"),
            )
        )
    return ranks


def trustrank_int(
    nodes: DataFrame,
    edges: DataFrame,
    n_seeds: int,
    seed_col: str = "is_seed",
    iters: int = 3,
    scale: int = SCALE,
) -> DataFrame:
    """Integer-exact TrustRank (Gyongyi et al.): PageRank with the
    teleport vector concentrated on a trusted seed set instead of
    uniform. ``nodes(id, is_seed)`` carries the deterministic seed flag;
    total trust mass ``scale`` starts (and teleports back) only on the
    ``n_seeds`` seeds, so spam pages far from the seeds accumulate
    little trust no matter how much raw link mass they collect.

    Same BIGINT tick discipline as :func:`pagerank_int` — floor
    division on non-negative ints, associative sums — so the unrolled
    DuckDB oracle hashes bit-identically. Same per-round scale shape:
    one contrib shuffle + one node join; the seed flag rides the node
    frame, never the driver.
    """
    seed_tick = scale // n_seeds
    base = (15 * seed_tick) // 100
    seed = F.when(F.col(seed_col) == 1, F.lit(1)).otherwise(F.lit(0))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.select(
        "id", seed_col, (seed * F.lit(seed_tick)).cast("long").alias("trust")
    )
    for _ in range(iters):
        contribs = (
            edges.join(
                ranks.select(F.col("id").alias("src"), "trust"), "src"
            )
            .join(deg, "src")
            .select("dst", F.expr("trust div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = nodes.join(contribs.withColumnRenamed("dst", "id"), "id", "left").select(
            "id",
            seed_col,
            F.expr(
                f"cast(case when {seed_col} = 1 then {base}L else 0L end"
                " + (85L * coalesce(in_sum, 0L)) div 100L as bigint)"
            ).alias("trust"),
        )
    return ranks.select("id", "trust")
