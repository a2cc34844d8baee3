"""Triangle counting with degree-ordered orientation (web-graph op).

The standard scalable triangle count (compact-forward / node-iterator
with degree ordering): orient every undirected edge from the endpoint
with the smaller (degree, id) key to the larger, so each triangle is
enumerated exactly once from its lowest-key corner and — critically —
every node's oriented out-degree is O(sqrt(m)), which bounds the wedge
self-join to sum(d_out²) = O(m^1.5) instead of sum(deg²) (a single hub
in a web graph would otherwise explode the join). This is the same
orientation trick every distributed triangle engine uses.

All arithmetic is BIGINT (the total-order key packs (degree, id) into
one long), so a DuckDB oracle replaying the same CTEs hashes
bit-identically.

Scale shape: one degree aggregate, one key-attach join per endpoint,
one wedge self-join shuffled on the pivot node, one closing join
shuffled on the (v, w) edge key. Nothing is ever collected; no step is
quadratic in a hub's raw degree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY_SHIFT = 1 << 32  # key = degree * 2^32 + id — a total order by (deg, id)


def undirect(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (a < b), self-loops dropped,
    duplicates collapsed. Input columns (src, dst)."""
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def orient_by_degree(und: DataFrame) -> DataFrame:
    """(a, b) undirected → (u, v, kv) oriented low-key → high-key, with
    kv = packed (deg, id) key of v carried for wedge ordering."""
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e = (
        und.join(deg.select(F.col("id").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("deg").alias("db")), "b")
        .select(
            "a",
            "b",
            (F.col("da") * KEY_SHIFT + F.col("a")).alias("ka"),
            (F.col("db") * KEY_SHIFT + F.col("b")).alias("kb"),
        )
    )
    low_first = F.col("ka") < F.col("kb")
    return e.select(
        F.when(low_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(low_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.greatest("ka", "kb").alias("kv"),
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """edges(src, dst) → (id, n_triangles) for every node in ≥1
    triangle. Each triangle contributes 1 to all three corners."""
    o = orient_by_degree(undirect(edges))
    e1 = o.select(F.col("u"), F.col("v").alias("v1"), F.col("kv").alias("k1"))
    e2 = o.select(F.col("u"), F.col("v").alias("v2"), F.col("kv").alias("k2"))
    wedges = e1.join(e2, "u").filter(F.col("k1") < F.col("k2"))
    closing = o.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    tris = wedges.join(closing, ["v1", "v2"])
    return (
        tris.select(
            F.explode(F.array(F.col("u"), F.col("v1"), F.col("v2"))).alias("id")
        )
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def hits_int(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Two half-rounds of un-normalized HITS with exact BIGINT scores:
    auth₁ = in-degree (all hubs start at 1), hub₁ = Σ auth₁ over
    out-links, auth₂ = Σ hub₁ over in-links. Skipping the float
    normalization keeps every score an exact integer sum — the ranking
    is identical (normalization is a positive scalar per round) and the
    DuckDB oracle replays it bit-for-bit. Plan shape per half-round:
    one contrib shuffle (groupBy on the receiving endpoint) + one hash
    join — the same aggregate-exchange pattern as pagerank_int, so the
    10^12-edge story is the same: edges partition by the join key, no
    driver-side state.

    Returns (id, hub, auth) — hub = hub₁, auth = auth₂, 0 for nodes
    with no links in the respective direction.
    """
    a1 = edges.groupBy("dst").agg(F.count("*").cast("long").alias("a1"))
    h1 = (
        edges.join(a1, "dst")
        .groupBy("src")
        .agg(F.sum("a1").cast("long").alias("hub"))
    )
    a2 = (
        edges.join(h1, "src")
        .groupBy("dst")
        .agg(F.sum("hub").cast("long").alias("auth"))
    )
    return (
        nodes.join(h1.withColumnRenamed("src", "id"), "id", "left")
        .join(a2.withColumnRenamed("dst", "id"), "id", "left")
        .select(
            "id",
            F.coalesce("hub", F.lit(0)).cast("long").alias("hub"),
            F.coalesce("auth", F.lit(0)).cast("long").alias("auth"),
        )
    )


def kcore(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """Bounded k-core peeling: ``rounds`` iterations of "drop every node
    with degree < k, then drop edges touching dropped nodes" over an
    UNDIRECTED edge set (columns a, b from :func:`undirect`).

    Returns (node, degree) for survivors after the last peel, with the
    degree measured in the surviving subgraph. Full k-core = peel to
    fixpoint (≤ n rounds); the bounded form keeps the work per round to
    one degree aggregate + two semi-joins and makes the oracle a finite
    unrolled recursion — at web scale the peel count is the classic
    degeneracy-ordering sweep and converges in tens of rounds.
    Lineage is cut per round (components.py discipline) so the plan
    does not deepen multiplicatively.
    """
    cur = edges
    for _ in range(rounds):
        deg = (
            cur.select(F.col("a").alias("node"))
            .unionAll(cur.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("node")
        cur = (
            cur.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    return (
        cur.select(F.col("a").alias("node"))
        .unionAll(cur.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .filter(F.col("degree") >= k)
    )


def label_propagation(nodes: DataFrame, und: DataFrame, rounds: int) -> DataFrame:
    """Synchronous label propagation (community detection), integer-exact.

    Every node starts labeled with its own id; each round it adopts the
    most frequent label among its neighbors, ties to the SMALLEST label,
    isolated nodes keep their own — all deterministic, so a fixed-round
    unroll is an exact spec both engines can replay (no modes, no
    randomized tie-breaks like the classic async LPA). Complements the
    repo's other graph ops: components finds connectivity, k-core finds
    density, LPA finds assortative communities.

    Scale shape per round: one neighbor-label equi-join shuffled on the
    edge key, one (node, label) hash-agg (map-side partial), one
    WindowGroupLimit-style argmax window partitioned by node — the same
    one-shuffle-per-round budget as pagerank. Rounds are a small fixed
    constant (communities stabilize in a few sync rounds; a fixed K is
    the deterministic contract).

    Inputs: ``nodes(id)``, ``und(a, b)`` canonical undirected edges
    (see :func:`undirect`). Returns (id, community).
    """
    from pyspark.sql.window import Window

    both = und.select(F.col("a").alias("v"), F.col("b").alias("n")).unionAll(
        und.select(F.col("b").alias("v"), F.col("a").alias("n"))
    )
    labels = nodes.select("id", F.col("id").cast("long").alias("community"))
    w = Window.partitionBy("v").orderBy(F.col("cnt").desc(), F.col("community").asc())
    for _ in range(rounds):
        nbr = both.join(
            labels.select(F.col("id").alias("n"), "community"), "n"
        ).groupBy("v", "community").agg(F.count(F.lit(1)).alias("cnt"))
        best = (
            nbr.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("v").alias("id"), "community")
        )
        labels = (
            nodes.join(best, "id", "left")
            .select(
                "id",
                F.coalesce(F.col("community"), F.col("id").cast("long")).alias("community"),
            )
        )
    return labels


def _edge_support(und: DataFrame) -> DataFrame:
    """Per-edge triangle support over canonical undirected edges
    (a < b): for each edge, the number of triangles containing it.
    Enumeration reuses the degree-ordered orientation (every triangle
    found exactly once from its lowest-(deg,id) corner, wedge fan-out
    bounded by O(sqrt(m)) per node), then each triangle credits its
    three canonical edges. Returns (a, b, support) for edges in >=1
    triangle."""
    o = orient_by_degree(und)
    e1 = o.select(F.col("u"), F.col("v").alias("v1"), F.col("kv").alias("k1"))
    e2 = o.select(F.col("u"), F.col("v").alias("v2"), F.col("kv").alias("k2"))
    wedges = e1.join(e2, "u").filter(F.col("k1") < F.col("k2"))
    closing = o.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    tris = wedges.join(closing, ["v1", "v2"])
    edges3 = tris.select(
        F.explode(
            F.array(
                F.struct(F.least("u", "v1").alias("a"), F.greatest("u", "v1").alias("b")),
                F.struct(F.least("u", "v2").alias("a"), F.greatest("u", "v2").alias("b")),
                F.struct(F.least("v1", "v2").alias("a"), F.greatest("v1", "v2").alias("b")),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    return edges3.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("support"))


def ktruss(und: DataFrame, k: int, rounds: int) -> DataFrame:
    """Bounded k-truss peeling: ``rounds`` iterations of "drop every
    edge in fewer than k-2 triangles" over canonical undirected edges
    (a, b), then report survivors with their support in the final
    graph (filtered >= k-2, mirroring :func:`kcore`'s final filter).

    The truss is the standard cohesion tier above the k-core (every
    edge in a k-truss sits in >= k-2 triangles inside it); bounded
    rounds keep the oracle a finite unrolled recursion, and at web
    scale the peel converges in few rounds because support only falls.
    Per round: one degree-ordered wedge self-join + one closing join +
    one (a, b) hash agg — the triangle_counts budget — with lineage cut
    between rounds. Returns (a, b, support)."""
    cur = und.select("a", "b")
    for _ in range(rounds):
        sup = _edge_support(cur)
        cur = (
            cur.join(
                sup.filter(F.col("support") >= k - 2).select("a", "b"),
                ["a", "b"],
                "left_semi",
            )
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    return _edge_support(cur).filter(F.col("support") >= k - 2)
