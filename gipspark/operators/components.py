"""Connected components by min-label propagation (DataFrame loop).

Closes the near-dup graph transitively: near_dedup_decision (one-hop,
oracle-checkable) marks each dup with its smallest *direct* partner;
chains a~b~c need the component's global minimum as the canonical id.
That closure is inherently iterative — the driver loops DataFrame
rounds, each one a join + two min-aggregates, all JVM:

    label(v) ← min(label(v), min over neighbors u of label(u))

Labels are node ids, only ever decrease, and the component minimum is
a fixpoint. Each round does (a) one hop of neighbor-min propagation and
(b) a pointer-jump (comp(v) ← comp(comp(v)) — comp values are node ids,
so they are themselves labeled rows): the known distance a label can
travel per round therefore *doubles*, giving convergence in O(log
diameter) rounds instead of O(diameter) — max_iter=25 covers any
component with diameter up to ~2^25 hops. Scale shape: edges shuffle on
src per round; each round's labels are localCheckpoint-ed — constant-size
plans (a lazy persist would let the self-join double the logical plan
every round), superseded blocks freed by the ContextCleaner. Convergence is
detected by the strictly-decreasing label sum — one cheap agg per round
instead of a changed-rows join; exhausting max_iter without the sum
stabilizing raises (silently-wrong labels are worse than a retry with a
higher cap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, comp) for every node in ``pairs``; comp = min node id of
    the node's connected component.

    Raises ``RuntimeError`` if ``max_iter`` rounds pass without the
    label assignment reaching its fixpoint (never silently returns
    unconverged labels).
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .persist()
    )
    # localCheckpoint (not persist) per round: persist caches blocks but
    # the LOGICAL plan keeps nesting — with the self-join below the plan
    # tree doubles per round and the driver OOMs just building plan
    # strings by round ~8. localCheckpoint cuts lineage to a LogicalRDD
    # (constant-size plans); superseded rounds' blocks are freed by the
    # ContextCleaner when the DataFrame refs drop.
    labels = (
        edges.select(F.col("src").alias("node")).distinct().withColumn("comp", F.col("node"))
    ).localCheckpoint()
    prev_sum = labels.agg(F.sum("comp")).first()[0]

    converged = False
    for _ in range(max_iter):
        prop = (
            edges.join(labels, edges.src == labels.node)
            .select(F.col("dst").alias("node"), "comp")
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        hop = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()
        )
        # pointer-jump: follow the label one more step (comp is a node
        # id, so it has its own row in `hop`). Doubles the effective
        # propagation distance per round → O(log diameter) convergence.
        new_labels = (
            hop.join(
                hop.select(F.col("node").alias("__cnode"), F.col("comp").alias("__ccomp")),
                hop.comp == F.col("__cnode"),
                "left",
            )
            .select(
                hop.node.alias("node"),
                F.least(hop.comp, F.coalesce(F.col("__ccomp"), hop.comp)).alias("comp"),
            )
            .localCheckpoint()
        )
        new_sum = new_labels.agg(F.sum("comp")).first()[0]
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(label sum still decreasing) — raise max_iter; with "
            "pointer-jumping each round doubles reach, so this indicates "
            "a component of diameter > ~2^max_iter or a non-terminating input"
        )
    return labels
