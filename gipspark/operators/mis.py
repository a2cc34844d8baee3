"""Deterministic Luby maximal independent set.

Luby's classic round-based MIS: every active node gets a priority; a
node joins the MIS when its priority beats every active neighbor's;
winners and their neighborhoods leave the graph; repeat until empty.
With random priorities re-drawn per round the expected round count is
O(log n). This variant draws the priority ONCE from md5(node id) —
fully deterministic (the same graph always yields the same MIS and the
same per-node selection round, which is what lets a DuckDB recursive
CTE replay it bit-for-bit), at the cost of the per-round independence
in Luby's analysis; md5 priorities are adversary-free in practice and
the loop raises on non-convergence rather than returning a partial set
(the components.py / scc.py contract).

Distributed shape per round: one neighbor-max aggregate (shuffle keyed
on node), one anti join to peel the closed neighborhood, frames
localCheckpoint-ed so the plan stays constant-size across rounds.
Priorities compare as (p, id) structs — a strict total order even if
md5 ever collided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gipspark.operators.dedup import md5_long


def luby_mis(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 60,
) -> DataFrame:
    """(node, round) for every MIS member; round = the 1-based Luby
    round that selected it. Priorities are md5('mis:' || id)."""
    act = (
        nodes.select(F.col(id_col).alias("node"))
        .distinct()
        .withColumn("p", md5_long(F.concat(F.lit("mis:"), F.col("node").cast("string"))))
        .localCheckpoint(eager=True)
    )
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
    )
    sym = und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b"))).persist()

    out: DataFrame | None = None
    for rnd in range(1, max_rounds + 1):
        n_active = act.count()
        if n_active == 0:
            break
        # max neighbor (p, id) among ACTIVE neighbors only
        nbr = (
            sym.join(act.select(F.col("node").alias("a")), "a")
            .join(
                act.select(F.col("node").alias("b"), F.col("p").alias("bp")),
                "b",
            )
            .groupBy("a")
            .agg(F.max(F.struct(F.col("bp").alias("p"), F.col("b").alias("n"))).alias("mx"))
        )
        flagged = act.join(nbr, act["node"] == nbr["a"], "left").select(
            "node",
            "p",
            (
                F.col("mx").isNull()
                | (F.struct(F.col("p").alias("p"), F.col("node").alias("n")) > F.col("mx"))
            ).alias("win"),
        )
        winners = flagged.filter("win").select("node", "p").localCheckpoint(eager=True)
        sel = winners.select("node", F.lit(rnd).alias("round"))
        out = sel if out is None else out.unionAll(sel)
        # peel winners and their neighbors
        w_nbrs = (
            sym.join(winners.select(F.col("node").alias("a")), "a")
            .select(F.col("b").alias("node"))
            .distinct()
        )
        act = (
            flagged.filter(~F.col("win"))
            .select("node", "p")
            .join(w_nbrs, "node", "anti")
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(f"luby_mis: not converged after {max_rounds} rounds")
    sym.unpersist()
    assert out is not None
    return out
