"""Alias/redirect-chain resolution by pointer doubling.

The Common-Crawl-shaped problem: pages alias to other pages (HTTP
redirects, rel=canonical, URL normalization) forming chains; every
page must resolve to its terminal target plus the hop count — at
10^12 rows you cannot walk chains one hop per pass.

Pointer doubling: carry (ptr, dist) per node, where ptr is the node
reached after `dist` hops. Each round self-joins the state on ptr =
node and composes: (ptr, dist) ← (ptr[ptr], dist + dist[ptr]).
Terminals point at themselves with dist 0 (the fixpoint), so reach
DOUBLES per round and a depth-D chain resolves in ⌈log₂ D⌉ rounds of
plain equi-joins — each a hash shuffle on node id, no driver-side
data. Same localCheckpoint-per-round discipline as
operators/components.py (constant-size plans), same loud RuntimeError
if the fixpoint isn't reached (a cycle in the alias graph never
terminates — detecting "sum of dist stopped growing but ptrs still
move" would be the cycle extension; inputs here are DAGs by
construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_chains(
    edges: DataFrame,
    id_col: str = "id",
    next_col: str = "next",
    max_iter: int = 20,
) -> DataFrame:
    """(id, final_id, hops) for every node.

    ``edges``: one row per node; ``next`` NULL marks a terminal.
    Non-terminal ``next`` values must themselves appear as ids (every
    alias target is a known node) — unknown targets resolve as
    terminals of the last known hop.
    """
    state = edges.select(
        F.col(id_col).alias("node"),
        F.coalesce(F.col(next_col), F.col(id_col)).alias("ptr"),
        F.when(F.col(next_col).isNull(), F.lit(0)).otherwise(F.lit(1)).cast("long").alias("dist"),
    ).localCheckpoint()
    prev_sum = state.agg(F.sum("dist")).first()[0]

    converged = False
    for _ in range(max_iter):
        nxt = state.select(
            F.col("node").alias("__pnode"),
            F.col("ptr").alias("__pptr"),
            F.col("dist").alias("__pdist"),
        )
        new_state = (
            state.join(nxt, state.ptr == F.col("__pnode"), "left")
            .select(
                "node",
                F.coalesce(F.col("__pptr"), F.col("ptr")).alias("ptr"),
                (F.col("dist") + F.coalesce(F.col("__pdist"), F.lit(0))).alias("dist"),
            )
            .localCheckpoint()
        )
        new_sum = new_state.agg(F.sum("dist")).first()[0]
        state = new_state
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        raise RuntimeError(
            f"resolve_chains did not converge in {max_iter} rounds — "
            "chain depth > 2^max_iter or the alias graph has a cycle"
        )
    return state.select(
        F.col("node").alias(id_col), F.col("ptr").alias("final_id"), F.col("dist").alias("hops")
    )
