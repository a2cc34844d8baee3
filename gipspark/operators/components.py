"""Connected components by min-label propagation (DataFrame loop).

Closes the near-dup graph transitively: near_dedup_decision (one-hop,
oracle-checkable) marks each dup with its smallest *direct* partner;
chains a~b~c need the component's global minimum as the canonical id.
That closure is inherently iterative — the driver loops DataFrame
rounds, each one a join + two min-aggregates, all JVM:

    label(v) ← min(label(v), min over neighbors u of label(u))

Labels are node ids, only ever decrease, and the component minimum is
a fixpoint — convergence in ≤ diameter rounds (dedup graphs are
star-ish: 2–4 rounds in practice). Scale shape: edges shuffle on src
per round; labels persist per round and unpersist after the next round
materializes (bounded memory, truncated lineage). Convergence is
detected by the strictly-decreasing label sum — one cheap agg per
round instead of a changed-rows join.
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
    the node's connected component."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node")).distinct().withColumn("comp", F.col("node"))
    ).persist()
    prev_sum = labels.agg(F.sum("comp")).first()[0]

    for _ in range(max_iter):
        prop = (
            edges.join(labels, edges.src == labels.node)
            .select(F.col("dst").alias("node"), "comp")
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        new_labels = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .persist()
        )
        new_sum = new_labels.agg(F.sum("comp")).first()[0]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    edges.unpersist()
    return labels
