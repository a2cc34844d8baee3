"""Strongly connected components: trim + forward-max coloring + backward sweep.

The directed twin of operators/components.py. WCC's min-label trick is
unsound on digraphs (labels would cross one-way edges), so this is the
distributed FW-BW/coloring algorithm (Orzan; Slota et al.'s Multistep),
built from the same primitives the rest of the engine uses — joins, max
aggregates, localCheckpoint-ed rounds:

  outer round:
    1. TRIM — nodes with in-degree 0 or out-degree 0 in the remaining
       subgraph are singleton SCCs; peel repeatedly. This alone
       dissolves DAG tails/chains that would otherwise cost one outer
       round EACH (a reversed path trims away entirely in one sweep).
    2. COLOR — forward max-label propagation to fixpoint:
       color(v) = max over ancestors-including-self. Sound to pointer-
       jump: color(v) = c means c is an ancestor of v, so ancestors of
       c are ancestors of v and color(v) may absorb color(c) — the
       known propagation distance doubles per round, O(log diameter)
       rounds like WCC.
    3. SWEEP — for each pivot c (color(c) == c), SCC(c) = nodes with
       color c that REACH c: backward BFS from the pivots, restricted
       to same-color nodes. Every swept node (pivots included —
       singleton SCCs) is emitted and removed.

Per outer round all pivots sweep concurrently (one flag DataFrame keyed
by color), so disjoint color classes resolve in parallel. Worst case is
the classic FW-BW one: a long chain of small SCCs all painted by one
global max color resolves one SCC per outer round — real deployments
recurse on the descendant/ancestor/remainder partitions to cut that;
here max_outer bounds it and raises rather than returning partial
labels (the components.py contract). Convergence of the color loop is
detected by the monotone non-decreasing color sum, one cheap agg per
round; every round's frames are localCheckpoint-ed to keep plans
constant-size (the lesson hard-learned in components.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def strongly_connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_outer: int = 50,
    max_inner: int = 40,
) -> DataFrame:
    """(node, scc) for every node; scc = min node id of the strongly
    connected component. Raises RuntimeError on non-convergence rather
    than returning partial labels."""
    remaining = nodes.select(F.col(id_col).alias("id")).distinct().localCheckpoint()
    all_edges = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    out_parts: list[DataFrame] = []

    for _outer in range(max_outer):
        n_left = remaining.count()
        if n_left == 0:
            break

        # live edges of the remaining subgraph
        live = (
            all_edges.join(remaining.select(F.col("id").alias("src")), "src", "semi")
            .join(remaining.select(F.col("id").alias("dst")), "dst", "semi")
            .localCheckpoint()
        )

        # 1. TRIM: no in-edge or no out-edge => singleton SCC; repeat
        while True:
            has_out = live.select(F.col("src").alias("id")).distinct()
            has_in = live.select(F.col("dst").alias("id")).distinct()
            core = (
                remaining.join(has_out, "id", "semi").join(has_in, "id", "semi").localCheckpoint()
            )
            n_core = core.count()
            trimmed = n_left - n_core
            if trimmed == 0:
                break
            out_parts.append(
                remaining.join(core, "id", "anti").select("id", F.col("id").alias("scc"))
            )
            remaining = core
            n_left = n_core
            if n_left == 0:
                break
            live = (
                live.join(core.select(F.col("id").alias("src")), "src", "semi")
                .join(core.select(F.col("id").alias("dst")), "dst", "semi")
                .localCheckpoint()
            )
        if n_left == 0:
            break

        # 2. COLOR: forward max propagation with pointer jumping
        color = remaining.select("id", F.col("id").alias("color")).localCheckpoint()
        prev = None
        for _inner in range(max_inner):
            msg = (
                live.join(color.withColumnRenamed("id", "src"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.max("color").alias("mc"))
            )
            stepped = (
                color.join(msg, "id", "left")
                .select("id", F.greatest("color", F.coalesce("mc", "color")).alias("color"))
            )
            jumped = (
                stepped.alias("a")
                .join(
                    stepped.select(F.col("id").alias("color"), F.col("color").alias("cc")).alias("b"),
                    "color",
                    "left",
                )
                .select(
                    F.col("a.id").alias("id"),
                    F.greatest(F.col("color"), F.coalesce(F.col("cc"), F.col("color"))).alias(
                        "color"
                    ),
                )
                .localCheckpoint()
            )
            s = jumped.agg(F.sum("color")).collect()[0][0]
            color = jumped
            if s == prev:
                break
            prev = s
        else:
            raise RuntimeError(f"scc color loop did not converge in {max_inner} rounds")

        # 3. SWEEP: backward reach to the pivot within each color class
        flag = color.filter(F.col("id") == F.col("color")).select(
            "id", F.col("color").alias("scc")
        ).localCheckpoint()
        prev_n = flag.count()
        for _inner in range(max_inner):
            # u -> v with flagged v and color(u) == scc(v): u joins
            cand = (
                live.join(flag.withColumnRenamed("id", "dst"), "dst")
                .select(F.col("src").alias("id"), "scc")
                .distinct()
                .join(color, "id")
                .filter(F.col("color") == F.col("scc"))
                .select("id", "scc")
            )
            flag = flag.unionByName(cand).groupBy("id").agg(F.min("scc").alias("scc")).localCheckpoint()
            n = flag.count()
            if n == prev_n:
                break
            prev_n = n
        else:
            raise RuntimeError(f"scc sweep loop did not converge in {max_inner} rounds")

        # pivots are the max id of their SCC under forward-max coloring,
        # but the engine contract labels by MIN member id
        relabel = flag.groupBy("scc").agg(F.min("id").alias("mn"))
        out_parts.append(
            flag.join(relabel, "scc").select("id", F.col("mn").alias("scc"))
        )
        remaining = remaining.join(flag.select("id"), "id", "anti").localCheckpoint()
    else:
        if remaining.count() > 0:
            raise RuntimeError(f"scc did not converge in {max_outer} outer rounds")

    all_edges.unpersist()
    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.unionByName(p)
    return out.select(F.col("id").alias("node"), "scc")
