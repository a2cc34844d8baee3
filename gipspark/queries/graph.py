"""Registry family: graph (split from the single-file registry; query names and behavior unchanged)."""

from __future__ import annotations

from gipspark.queries._base import (  # noqa: F401
    C,
    D,
    DataFrame,
    F,
    Window,
    _LAT,
    _LON,
    load,
    register,
    table_rows,
)
from gipspark.queries._shared import (  # noqa: F401
    _ATTACK_KS,
    _BALL_HOPS,
    _BALL_SEEDS,
    _BIP_ROUNDS,
    _BOW_HOPS,
    _CHAIN_NXT_SQL,
    _EIG_ROUNDS,
    _EIG_TOPK,
    _HA_HOPS,
    _HA_LNQ,
    _HA_M,
    _HC_K,
    _KCORE_K,
    _KCORE_ROUNDS,
    _KT_K,
    _KT_ROUNDS,
    _LPA_DST,
    _LPA_ROUND_SQL,
    _MIS_P,
    _PDS_DAMPINGS,
    _PDS_ROUNDS,
    _PDS_SCALE,
    _PEEL_ROUNDS,
    _PR_EDGE_DST,
    _PR_N,
    _RA_TICK,
    _RC_KS,
    _SCC_B,
    _SCC_F,
    _SCC_G,
    _SCC_H,
    _SCC_K,
    _SCC_N,
    _SHAPE_GRID,
    _SP_K,
    _TRI_DST,
    _TR_BUCKET,
    _TR_GRID,
    _TR_ROUNDS,
    _TR_SEEDS,
    _WCC_EDGE,
    _WCC_PREV,
    _WIDEST_HOPS,
    _WIDEST_SEEDS,
    _attack_oracle_sql,
    _blen_col,
    _blen_sql,
    _dag_oracle_sql,
    _eig_sql,
    _ha_rho_col,
    _ha_rho_sql,
    _hc_oracle_sql,
    _kcore_oracle_sql,
    _ktruss_oracle_sql,
    _pds_oracle_sql,
    _peel_sql,
    _percolation_oracle_sql,
    _ppr_oracle_sql,
    _sp_oracle_sql,
    _trustrank_oracle_sql,
    _walk_oracle_sql,
)



@register(
    "pagerank_doc_links",
    f"""
WITH nodes AS (SELECT doc_id AS id FROM documents),
edges AS (
  SELECT doc_id AS src, {_PR_EDGE_DST} % {_PR_N} AS dst
  FROM documents, (VALUES (0),(1),(2)) AS t(j)
),
deg AS (SELECT src, cast(count(*) as bigint) AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT id, 1000000000000 // {_PR_N} AS rank FROM nodes),
c1 AS (SELECT dst, cast(sum(rank // outdeg) as bigint) AS in_sum
       FROM edges JOIN r0 ON edges.src = r0.id JOIN deg ON edges.src = deg.src GROUP BY dst),
r1 AS (SELECT n.id,
              cast((15 * (1000000000000 // {_PR_N})) // 100
                   + (85 * coalesce(in_sum, 0)) // 100 as bigint) AS rank
       FROM nodes n LEFT JOIN c1 ON n.id = c1.dst),
c2 AS (SELECT dst, cast(sum(rank // outdeg) as bigint) AS in_sum
       FROM edges JOIN r1 ON edges.src = r1.id JOIN deg ON edges.src = deg.src GROUP BY dst),
r2 AS (SELECT n.id,
              cast((15 * (1000000000000 // {_PR_N})) // 100
                   + (85 * coalesce(in_sum, 0)) // 100 as bigint) AS rank
       FROM nodes n LEFT JOIN c2 ON n.id = c2.dst),
c3 AS (SELECT dst, cast(sum(rank // outdeg) as bigint) AS in_sum
       FROM edges JOIN r2 ON edges.src = r2.id JOIN deg ON edges.src = deg.src GROUP BY dst)
SELECT n.id,
       cast((15 * (1000000000000 // {_PR_N})) // 100
            + (85 * coalesce(in_sum, 0)) // 100 as bigint) AS rank
FROM nodes n LEFT JOIN c3 ON n.id = c3.dst
""",
)
def pagerank_doc_links(spark, sf_dir):
    """Integer-exact PageRank over a deterministic doc link graph
    (operators/pagerank.py): every doc links to 3 md5-derived
    neighbors; ranks are BIGINT mass ticks with floor-division damping,
    so the DuckDB oracle replaying the same 3 unrolled rounds hashes
    bit-identically regardless of partitioning or sum order. One
    contrib shuffle + one node join per round — the standard
    distributed PageRank shape; n_nodes comes from parquet footer
    metadata, never a count() job."""
    from gipspark.operators.pagerank import pagerank_int

    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    nodes = d.select(F.col("doc_id").alias("id"))
    edges = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    D.md5_long(
                        F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))
                    )
                    % n
                    for j in range(3)
                ]
            )
        ).alias("dst"),
    )
    return pagerank_int(nodes, edges, n_nodes=n, iters=3)



@register(
    "triangle_count_links",
    f"""
WITH edges_raw AS (
  SELECT doc_id AS src,
         (doc_id + 1 + {_TRI_DST} % 25) % (SELECT count(*) FROM documents) AS dst
  FROM documents, (VALUES (0),(1),(2),(4),(5)) AS t(j)
), und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges_raw WHERE src <> dst
), deg AS (
  SELECT id, cast(count(*) as bigint) AS deg
  FROM (SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und)
  GROUP BY id
), keyed AS (
  SELECT und.a, und.b,
         dd1.deg * 4294967296 + und.a AS ka,
         dd2.deg * 4294967296 + und.b AS kb
  FROM und
  JOIN deg dd1 ON dd1.id = und.a
  JOIN deg dd2 ON dd2.id = und.b
), o AS (
  SELECT CASE WHEN ka < kb THEN a ELSE b END AS u,
         CASE WHEN ka < kb THEN b ELSE a END AS v,
         greatest(ka, kb) AS kv
  FROM keyed
), wedges AS (
  SELECT e1.u, e1.v AS v1, e2.v AS v2
  FROM o e1 JOIN o e2 ON e1.u = e2.u AND e1.kv < e2.kv
), tris AS (
  SELECT w.u, w.v1, w.v2
  FROM wedges w JOIN o e3 ON e3.u = w.v1 AND e3.v = w.v2
), corners AS (
  SELECT u AS id FROM tris
  UNION ALL SELECT v1 FROM tris
  UNION ALL SELECT v2 FROM tris
)
SELECT id, cast(count(*) as bigint) AS n_triangles
FROM corners GROUP BY id
""",
)
def triangle_count_links(spark, sf_dir):
    """Per-node triangle counts over a deterministic small-world link
    graph (operators/graph.py): each doc links to 5 md5-offset
    neighbors within a 25-wide window (short-range links make the
    graph clustered). Degree-ordered orientation bounds every node's
    oriented out-degree by O(sqrt(m)), so the wedge self-join — THE
    blow-up risk on a hub-heavy web graph — costs sum(d_out²) =
    O(m^1.5), not sum(deg²). All keys BIGINT; the oracle replays the
    identical CTE chain."""
    from gipspark.operators.graph import triangle_counts

    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    offs = [
        D.md5_long(F.concat(F.lit(f"t:{j}:"), F.col("doc_id").cast("string"))) % 25
        for j in (0, 1, 2, 4, 5)
    ]
    edges = d.select(
        F.col("doc_id").alias("src"),
        F.explode(F.array(*[(F.col("doc_id") + 1 + o) % n for o in offs])).alias("dst"),
    )
    return triangle_counts(edges)



@register(
    "hits_hub_auth_links",
    f"""
WITH nodes AS (SELECT doc_id AS id FROM documents),
edges AS (
  SELECT doc_id AS src, {_PR_EDGE_DST} % {_PR_N} AS dst
  FROM documents, (VALUES (0),(1),(2)) AS t(j)
),
a1 AS (SELECT dst, cast(count(*) as bigint) AS a1 FROM edges GROUP BY dst),
h1 AS (SELECT e.src, cast(sum(a1.a1) as bigint) AS hub
       FROM edges e JOIN a1 ON e.dst = a1.dst GROUP BY e.src),
a2 AS (SELECT e.dst, cast(sum(h1.hub) as bigint) AS auth
       FROM edges e JOIN h1 ON e.src = h1.src GROUP BY e.dst)
SELECT n.id, cast(coalesce(h1.hub, 0) as bigint) AS hub,
       cast(coalesce(a2.auth, 0) as bigint) AS auth
FROM nodes n LEFT JOIN h1 ON n.id = h1.src LEFT JOIN a2 ON n.id = a2.dst
""",
)
def hits_hub_auth_links(spark, sf_dir):
    """HITS hubs/authorities over the same deterministic doc link graph
    as pagerank_doc_links (operators/graph.py hits_int): un-normalized
    integer half-rounds — auth₁ = in-degree, hub₁ = Σ auth₁ out,
    auth₂ = Σ hub₁ in — exact bigints, identical ranking to the
    normalized algorithm, replayed join-for-join by the oracle."""
    from gipspark.operators.graph import hits_int

    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    nodes = d.select(F.col("doc_id").alias("id"))
    edges = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    D.md5_long(F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))) % n
                    for j in range(3)
                ]
            )
        ).alias("dst"),
    )
    return hits_int(nodes, edges)



@register(
    "resolve_redirect_chains",
    f"""
WITH RECURSIVE nodes AS (
  SELECT doc_id AS id, {_CHAIN_NXT_SQL} AS nxt FROM documents
), walk(src, cur, hops) AS (
  SELECT id, id, 0 FROM nodes
  UNION ALL
  SELECT w.src, n.nxt, w.hops + 1
  FROM walk w JOIN nodes n ON n.id = w.cur
  WHERE n.nxt IS NOT NULL
)
SELECT w.src AS doc_id, w.cur AS final_id, cast(w.hops as bigint) AS hops
FROM walk w
WHERE w.cur NOT IN (SELECT id FROM nodes WHERE nxt IS NOT NULL)
""",
)
def resolve_redirect_chains(spark, sf_dir):
    """Redirect/alias chain resolution (the Common-Crawl URL-canonical
    problem, operators/chains.py): pointer doubling carries (ptr, dist)
    per page and composes it with itself each round, so a depth-D chain
    resolves in ⌈log₂ D⌉ equi-join rounds instead of D sequential
    passes — the only way chain-walking survives 10^12 rows. The oracle
    walks the same synthesized alias graph one hop at a time with a
    recursive CTE."""
    from gipspark.operators.chains import resolve_chains

    docs = load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    nxt_raw = did - 1 - ((did * 48271) % 3)
    nxt = F.when((did % 16 < 2) | (nxt_raw < 0), F.lit(None).cast("long")).otherwise(nxt_raw)
    edges = docs.select(did.alias("doc_id"), nxt.alias("next"))
    return resolve_chains(edges, id_col="doc_id", next_col="next").select(
        "doc_id", "final_id", F.col("hops").cast("long").alias("hops")
    )



@register("khop_cheapest_doc_links", _sp_oracle_sql())
def khop_cheapest_doc_links(spark, sf_dir):
    """K-round Bellman-Ford (K-hop cheapest path) from doc 0 over the
    deterministic weighted link graph: each round relaxes every edge
    out of the current distance frontier and takes the per-node min —
    operators/shortestpath.khop_cheapest. Integer weights keep both
    engines bit-exact; bounding at K rounds makes the oracle a finite
    unrolled recursion (full shortest path = run until fixpoint, which
    the operator supports via converge=True; the K-round form is what
    a 10^12-edge job runs anyway — one shuffle per round, lineage cut
    between rounds)."""
    from gipspark.operators.shortestpath import khop_cheapest

    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    edges = d.select(
        F.col("doc_id").alias("src"),
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("j"),
    ).select(
        "src",
        (
            D.md5_long(
                F.concat(F.lit("e:"), F.col("j").cast("string"), F.lit(":"), F.col("src").cast("string"))
            )
            % n
        ).alias("dst"),
        (
            1
            + D.md5_long(
                F.concat(F.lit("w:"), F.col("j").cast("string"), F.lit(":"), F.col("src").cast("string"))
            )
            % 100
        ).cast("long").alias("w"),
    )
    return khop_cheapest(edges, source=0, k=_SP_K)



@register("kcore_doc_links", _kcore_oracle_sql())
def kcore_doc_links(spark, sf_dir):
    """Bounded k-core peeling (k=3) over the undirected doc link graph
    — the web-graph denoising op that strips low-degree fringe before
    community/centrality analysis. Each round = one map-side-combinable
    degree aggregate + two semi-joins, lineage cut between rounds
    (operators/graph.kcore); the oracle unrolls the same peels."""
    from gipspark.operators.graph import kcore, undirect

    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    raw = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    D.md5_long(F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))) % n
                    for j in range(3)
                ]
            )
        ).alias("dst"),
    )
    return kcore(undirect(raw), k=_KCORE_K, rounds=_KCORE_ROUNDS)



@register(
    "lpa_communities_links",
    # synchronous LPA, 3 unrolled rounds, min-label tie-break — the
    # deterministic community-detection spec both engines replay.
    f"""
WITH nodes AS (SELECT doc_id AS id FROM documents),
edges_raw AS (
  SELECT doc_id AS src,
         (doc_id + 1 + {_LPA_DST} % 25) % (SELECT count(*) FROM documents) AS dst
  FROM documents, (VALUES (0),(1),(2)) AS t(j)
),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges_raw WHERE src <> dst
),
nb AS (
  SELECT a AS v, b AS n FROM und UNION ALL SELECT b AS v, a AS n FROM und
),
lab0 AS (SELECT id, cast(id as bigint) AS community FROM nodes),
{_LPA_ROUND_SQL.format(r=1, p=0)},
{_LPA_ROUND_SQL.format(r=2, p=1)},
{_LPA_ROUND_SQL.format(r=3, p=2)},
cs AS (SELECT community, cast(count(*) as bigint) AS csize FROM lab3 GROUP BY community)
SELECT l.id, l.community, cs.csize FROM lab3 l JOIN cs USING (community)
""",
)
def lpa_communities_links(spark, sf_dir):
    """Label-propagation communities over the deterministic local doc
    link graph (operators/graph.py label_propagation): 3 synchronous
    rounds, most-frequent neighbor label with min-label ties — the
    assortative-community complement to components (connectivity),
    k-core (density) and pagerank (centrality). Integer labels end to
    end; the oracle replays the same unrolled rounds. One edge-key
    join + one (node, label) hash-agg + one node-partitioned argmax
    window per round — the pagerank per-round shuffle budget."""
    from gipspark.operators.graph import label_propagation, undirect

    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    nodes = d.select(F.col("doc_id").alias("id"))
    edges = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    (
                        (
                            F.col("doc_id")
                            + 1
                            + D.md5_long(
                                F.concat(F.lit(f"l:{j}:"), F.col("doc_id").cast("string"))
                            )
                            % 25
                        )
                        % n
                    )
                    for j in range(3)
                ]
            )
        ).alias("dst"),
    )
    lab = label_propagation(nodes, undirect(edges), rounds=3)
    cs = lab.groupBy("community").agg(F.count("*").cast("long").alias("csize"))
    return lab.join(cs, "community").select("id", "community", "csize")



@register(
    "assortativity_links",
    f"""
WITH nodes AS (SELECT doc_id AS id FROM documents),
edges AS (
  SELECT doc_id AS src, {_PR_EDGE_DST} % {_PR_N} AS dst
  FROM documents, (VALUES (0),(1),(2)) AS t(j)
),
indeg AS (SELECT dst AS id, cast(count(*) as bigint) AS ind FROM edges GROUP BY dst),
deg AS (SELECT n.id, 3 + coalesce(ind, 0) AS d FROM nodes n LEFT JOIN indeg ON n.id = indeg.id),
ed AS (
  SELECT ds.d AS x, dd.d AS y
  FROM edges e JOIN deg ds ON e.src = ds.id JOIN deg dd ON e.dst = dd.id
),
st AS (
  SELECT cast(count(*) as DECIMAL(38,0)) AS m,
         cast(sum(x) as DECIMAL(38,0)) AS sx,
         cast(sum(y) as DECIMAL(38,0)) AS sy,
         cast(sum(cast(x as DECIMAL(38,0)) * x) as DECIMAL(38,0)) AS sxx,
         cast(sum(cast(y as DECIMAL(38,0)) * y) as DECIMAL(38,0)) AS syy,
         cast(sum(cast(x as DECIMAL(38,0)) * y) as DECIMAL(38,0)) AS sxy
  FROM ed
)
SELECT cast(m as bigint) AS n_edges,
       cast(m * sxy - sx * sy as double) AS num,
       cast(m * sxx - sx * sx as double) AS vx,
       cast(m * syy - sy * sy as double) AS vy,
       CASE WHEN m * sxx - sx * sx = 0 OR m * syy - sy * sy = 0 THEN 0.0
            ELSE cast(m * sxy - sx * sy as double)
                 / sqrt(cast(m * sxx - sx * sx as double))
                 / sqrt(cast(m * syy - sy * sy as double)) END AS r
FROM st
""",
)
def assortativity_links(spark, sf_dir):
    """Degree assortativity of the doc link graph (the md5-derived
    3-out-edge fixture shared with pagerank_doc_links): the Pearson
    correlation, over directed edges, between the total degree of the
    source and of the destination. Positive r = hubs link to hubs
    (assortative web core), negative = hub-and-spoke. Scale shape: one
    hash agg for in-degree, two hash equi-joins of the edge table
    against the node-sized degree table (NOT broadcast — deg is
    node-sized; AQE picks the strategy), then a single-row aggregate of
    exact DECIMAL(38,0) moments (x,y are small ints but their squared
    sums pass int64 near 1e12 edges — the chisq overflow lesson). r is
    the only double, identical textual order in both engines."""
    dec = "decimal(38,0)"
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    nodes = d.select(F.col("doc_id").alias("id"))
    edges = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    D.md5_long(
                        F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))
                    )
                    % n
                    for j in range(3)
                ]
            )
        ).alias("dst"),
    )
    indeg = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count("*").cast("long").alias("ind")
    )
    deg = nodes.join(indeg, "id", "left").select(
        "id", (F.lit(3) + F.coalesce(F.col("ind"), F.lit(0))).alias("dg")
    )
    ed = (
        edges.join(deg.select(F.col("id").alias("src"), F.col("dg").alias("x")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("dg").alias("y")), "dst")
        .select("x", "y")
    )
    st = ed.agg(
        F.count("*").cast(dec).alias("m"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).cast(dec).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y")).cast(dec).alias("syy"),
        F.sum(F.col("x").cast(dec) * F.col("y")).cast(dec).alias("sxy"),
    )
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")
    return st.select(
        F.col("m").cast("long").alias("n_edges"),
        num.cast("double").alias("num"),
        vx.cast("double").alias("vx"),
        vy.cast("double").alias("vy"),
        F.when((vx == 0) | (vy == 0), F.lit(0.0))
        .otherwise(
            num.cast("double") / F.sqrt(vx.cast("double")) / F.sqrt(vy.cast("double"))
        )
        .alias("r"),
    )



@register(
    "cocitation_pairs_links",
    f"""
WITH edges AS (
  SELECT DISTINCT doc_id AS src, {_PR_EDGE_DST} % {_PR_N} AS dst
  FROM documents, (VALUES (0),(1),(2)) AS t(j)
), pairs AS (
  SELECT a.src AS src_a, b.src AS src_b, cast(count(*) as bigint) AS n_common
  FROM edges a JOIN edges b ON a.dst = b.dst AND a.src < b.src
  GROUP BY a.src, b.src
)
SELECT src_a, src_b, n_common
FROM pairs ORDER BY n_common DESC, src_a, src_b LIMIT 25
""",
)
def cocitation_pairs_links(spark, sf_dir):
    """Co-citation related-page mining over the shared md5 link
    fixture: the top document pairs that link to the most common
    targets (Small 1973's relatedness signal; the web-graph cousin of
    the inverted-index posting join). Scale shape: the DISTINCT edge
    table is one hash agg; the self equi-join on dst is bounded by
    in-degree² per target (in-degree is ~Poisson(3) under the md5 map —
    the same per-key occupancy argument as the LSH band join); top-25
    with the full (count desc, a, b) deterministic order. Exact
    bigint counts only."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    edges = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    D.md5_long(
                        F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))
                    )
                    % n
                    for j in range(3)
                ]
            )
        ).alias("dst"),
    ).distinct()
    a = edges.select(F.col("src").alias("src_a"), "dst")
    b = edges.select(F.col("src").alias("src_b"), "dst")
    pairs = (
        a.join(b, ["dst"])
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    return pairs.orderBy(F.desc("n_common"), "src_a", "src_b").limit(25)



# ---------------------------------------------------------------------------
# round-3 batch: link reciprocity + directed modularity of the source partition
# ---------------------------------------------------------------------------


@register(
    "reciprocity_links",
    f"""
WITH edges AS (
  SELECT DISTINCT doc_id AS src, {_PR_EDGE_DST} % {_PR_N} AS dst
  FROM documents, (VALUES (0),(1),(2)) AS t(j)
), st AS (
  SELECT (SELECT cast(count(*) as bigint) FROM edges) AS n_edges,
         (SELECT cast(count(*) as bigint)
          FROM edges a JOIN edges b ON a.src = b.dst AND a.dst = b.src) AS n_mutual
)
SELECT n_edges, n_mutual,
       cast(n_mutual as double) / cast(n_edges as double) AS reciprocity
FROM st
""",
)
def reciprocity_links(spark, sf_dir):
    """Link reciprocity of the doc graph: the share of directed edges
    whose reverse edge also exists (a self-loop is its own reverse and
    counts once, identically in both engines) — the mutual-linking
    signal separating organic cross-referencing from link farms. Scale
    shape: DISTINCT edges in one hash agg, then ONE self equi-join on
    the swapped (dst, src) key — per-key occupancy is the forward
    in/out degree (~Poisson(3) under the md5 map), never quadratic.
    Exact bigint counts; the ratio is the only double."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    edges = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    D.md5_long(
                        F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))
                    )
                    % n
                    for j in range(3)
                ]
            )
        ).alias("dst"),
    ).distinct()
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    mutual = edges.join(rev, ["src", "dst"]).agg(
        F.count("*").cast("long").alias("n_mutual")
    )
    tot = edges.agg(F.count("*").cast("long").alias("n_edges"))
    return tot.crossJoin(F.broadcast(mutual)).select(
        "n_edges",
        "n_mutual",
        (F.col("n_mutual").cast("double") / F.col("n_edges").cast("double")).alias(
            "reciprocity"
        ),
    )



@register(
    "modularity_by_source",
    f"""
WITH edges AS (
  SELECT DISTINCT doc_id AS src, {_PR_EDGE_DST} % {_PR_N} AS dst
  FROM documents, (VALUES (0),(1),(2)) AS t(j)
), lab AS (SELECT doc_id AS id, source FROM documents),
e2 AS (
  SELECT ls.source AS src_c, ld.source AS dst_c
  FROM edges e JOIN lab ls ON e.src = ls.id JOIN lab ld ON e.dst = ld.id
), m AS (SELECT cast(count(*) as bigint) AS m FROM e2),
per AS (
  SELECT c.source,
         coalesce(ecc.e_cc, 0) AS e_cc,
         coalesce(dout.d_out, 0) AS d_out,
         coalesce(din.d_in, 0) AS d_in
  FROM (SELECT DISTINCT source FROM documents) c
  LEFT JOIN (SELECT src_c AS source, cast(count(*) as bigint) AS e_cc
             FROM e2 WHERE src_c = dst_c GROUP BY src_c) ecc ON c.source = ecc.source
  LEFT JOIN (SELECT src_c AS source, cast(count(*) as bigint) AS d_out
             FROM e2 GROUP BY src_c) dout ON c.source = dout.source
  LEFT JOIN (SELECT dst_c AS source, cast(count(*) as bigint) AS d_in
             FROM e2 GROUP BY dst_c) din ON c.source = din.source
)
SELECT p.source,
       cast(p.e_cc as bigint) AS e_cc,
       cast(p.d_out as bigint) AS d_out,
       cast(p.d_in as bigint) AS d_in,
       cast(p.e_cc * m.m - p.d_out * p.d_in as bigint) AS q_num_c
FROM per p, m ORDER BY p.source
""",
)
def modularity_by_source(spark, sf_dir):
    """Directed Newman modularity of the SOURCE partition over the doc
    link graph: per community c, Q_c·m² = e_cc·m − dout_c·din_c (sum
    over c then divide by m² for Q) — does linking stay within a
    source (siloed crawl) or cross sources? Kept as exact bigint
    numerators (m ≤ 3n keeps e_cc·m under int64 up to ~10^9 docs; at
    the sf1 contract move to DECIMAL(38,0) per the chisq lesson —
    documented, not silently wrapped). Scale shape: two node-sized
    equi-joins label the edge endpoints (AQE strategy), then three hash
    aggs on the SOURCE-dim key and a 1-row m broadcast. The partition
    spine is the distinct source dim, so silent communities appear with
    zeros."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    edges = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    D.md5_long(
                        F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))
                    )
                    % n
                    for j in range(3)
                ]
            )
        ).alias("dst"),
    ).distinct()
    lab = d.select(F.col("doc_id").alias("id"), "source")
    e2 = (
        edges.join(lab.select(F.col("id").alias("src"), F.col("source").alias("src_c")), "src")
        .join(lab.select(F.col("id").alias("dst"), F.col("source").alias("dst_c")), "dst")
        .select("src_c", "dst_c")
    )
    m = e2.agg(F.count("*").cast("long").alias("m"))
    spine = d.select("source").distinct()
    ecc = (
        e2.filter(F.col("src_c") == F.col("dst_c"))
        .groupBy(F.col("src_c").alias("source"))
        .agg(F.count("*").cast("long").alias("e_cc"))
    )
    dout = e2.groupBy(F.col("src_c").alias("source")).agg(
        F.count("*").cast("long").alias("d_out")
    )
    din = e2.groupBy(F.col("dst_c").alias("source")).agg(
        F.count("*").cast("long").alias("d_in")
    )
    per = (
        spine.join(ecc, "source", "left")
        .join(dout, "source", "left")
        .join(din, "source", "left")
        .select(
            "source",
            F.coalesce(F.col("e_cc"), F.lit(0)).cast("long").alias("e_cc"),
            F.coalesce(F.col("d_out"), F.lit(0)).cast("long").alias("d_out"),
            F.coalesce(F.col("d_in"), F.lit(0)).cast("long").alias("d_in"),
        )
    )
    return per.crossJoin(F.broadcast(m)).select(
        "source",
        "e_cc",
        "d_out",
        "d_in",
        (F.col("e_cc") * F.col("m") - F.col("d_out") * F.col("d_in"))
        .cast("long")
        .alias("q_num_c"),
    ).orderBy("source")



@register(
    "resource_allocation_links",
    f"""
WITH edges AS (
  SELECT DISTINCT doc_id AS src, {_PR_EDGE_DST} % {_PR_N} AS dst
  FROM documents, (VALUES (0),(1),(2)) AS t(j)
), indeg AS (
  SELECT dst, cast(count(*) as bigint) AS deg FROM edges GROUP BY dst
), pairs AS (
  SELECT a.src AS id_a, b.src AS id_b, a.dst AS c
  FROM edges a JOIN edges b ON a.dst = b.dst AND a.src < b.src
)
SELECT p.id_a, p.id_b,
       cast(count(*) as bigint) AS n_common,
       cast(sum({_RA_TICK} // i.deg) as bigint) AS ra_score
FROM pairs p JOIN indeg i ON p.c = i.dst
GROUP BY p.id_a, p.id_b
ORDER BY ra_score DESC, id_a, id_b LIMIT 30
""",
)
def resource_allocation_links(spark, sf_dir):
    """Resource-allocation link prediction (Zhou/Lü/Zhang 2009) over
    the shared deterministic doc link graph: candidate pair score
    Σ_c 1/deg(c) over common neighbors c, in integer ticks
    (10^12 // deg) so both engines agree bit-exactly. Unlike the plain
    common-neighbor count (cocitation_pairs_links) this downweights
    hub intermediaries — the score that actually ranks well on web
    graphs. Shape: dedup edges, ONE self equi-join on the shared
    neighbor key (shuffle ∝ Σ indeg², bounded because indeg is
    Poisson-thin here; a real crawl would df-cap supernode neighbors
    exactly like the containment posting cap), then group by pair.
    Never materializes the non-edge candidate universe."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    edges = (
        d.select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.array(
                    *[
                        D.md5_long(
                            F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))
                        )
                        % n
                        for j in range(3)
                    ]
                )
            ).alias("dst"),
        )
        .distinct()
    )
    indeg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("deg"))
    e2 = edges.select(F.col("src").alias("src_b"), F.col("dst").alias("dst_b"))
    pairs = edges.join(
        e2, (F.col("dst") == F.col("dst_b")) & (F.col("src") < F.col("src_b"))
    ).select(F.col("src").alias("id_a"), F.col("src_b").alias("id_b"), F.col("dst").alias("c"))
    return (
        pairs.join(indeg, F.col("c") == F.col("dst"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum(F.expr(f"cast({_RA_TICK} as bigint) div deg")).cast("long").alias("ra_score"),
        )
        .orderBy(F.col("ra_score").desc(), "id_a", "id_b")
        .limit(30)
    )



@register(
    "local_clustering_links",
    f"""
WITH edges_raw AS (
  SELECT doc_id AS src,
         (doc_id + 1 + {_TRI_DST} % 25) % (SELECT count(*) FROM documents) AS dst
  FROM documents, (VALUES (0),(1),(2),(4),(5)) AS t(j)
), und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges_raw WHERE src <> dst
), deg AS (
  SELECT id, cast(count(*) as bigint) AS deg
  FROM (SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und)
  GROUP BY id
), keyed AS (
  SELECT und.a, und.b,
         dd1.deg * 4294967296 + und.a AS ka,
         dd2.deg * 4294967296 + und.b AS kb
  FROM und
  JOIN deg dd1 ON dd1.id = und.a
  JOIN deg dd2 ON dd2.id = und.b
), o AS (
  SELECT CASE WHEN ka < kb THEN a ELSE b END AS u,
         CASE WHEN ka < kb THEN b ELSE a END AS v,
         greatest(ka, kb) AS kv
  FROM keyed
), wedges AS (
  SELECT e1.u, e1.v AS v1, e2.v AS v2
  FROM o e1 JOIN o e2 ON e1.u = e2.u AND e1.kv < e2.kv
), tris AS (
  SELECT w.u, w.v1, w.v2
  FROM wedges w JOIN o e3 ON e3.u = w.v1 AND e3.v = w.v2
), corners AS (
  SELECT u AS id FROM tris
  UNION ALL SELECT v1 FROM tris
  UNION ALL SELECT v2 FROM tris
), tc AS (
  SELECT id, cast(count(*) as bigint) AS n_triangles FROM corners GROUP BY id
)
SELECT d.id, d.deg, coalesce(t.n_triangles, cast(0 as bigint)) AS n_triangles,
       cast(2 * coalesce(t.n_triangles, 0) as double)
         / (cast(d.deg as double) * cast(d.deg - 1 as double)) AS lcc
FROM deg d LEFT JOIN tc t ON t.id = d.id
WHERE d.deg >= 2
""",
)
def local_clustering_links(spark, sf_dir):
    """Per-node local clustering coefficient over the small-world link
    fixture (shared with triangle_count_links): lcc = 2·tri(v) /
    (deg·(deg−1)) — the node-level cohesion score whose graph-wide mean
    is the Watts–Strogatz clustering statistic; on a web graph it
    separates mesh-linked communities from star-shaped spam hubs.
    Exact: triangle and degree counts are integers, lcc is ONE
    fixed-form double expression. Scale shape: identical to
    triangle_count_links (degree-ordered wedge join, O(m^1.5) not
    Σdeg²) plus one dim-scale degree join."""
    from gipspark.operators.graph import triangle_counts, undirect

    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    offs = [
        D.md5_long(F.concat(F.lit(f"t:{j}:"), F.col("doc_id").cast("string"))) % 25
        for j in (0, 1, 2, 4, 5)
    ]
    edges = d.select(
        F.col("doc_id").alias("src"),
        F.explode(F.array(*[(F.col("doc_id") + 1 + o) % n for o in offs])).alias("dst"),
    )
    und = undirect(edges)
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    tri = triangle_counts(edges).select("id", F.col("n_triangles").cast("long").alias("n_triangles"))
    return (
        deg.filter(F.col("deg") >= 2)
        .join(tri, "id", "left")
        .select(
            "id", "deg",
            F.coalesce("n_triangles", F.lit(0).cast("long")).alias("n_triangles"),
            (
                (F.lit(2.0) * F.coalesce("n_triangles", F.lit(0)).cast("double"))
                / (F.col("deg").cast("double") * (F.col("deg") - 1).cast("double"))
            ).alias("lcc"),
        )
    )



@register("harmonic_centrality_links", _hc_oracle_sql())
def harmonic_centrality_links(spark, sf_dir):
    """K-bounded harmonic centrality over the deterministic doc link
    graph: H(u) = Σ_{{0<dist(u,v)≤K}} floor(10⁶/dist) — the centrality
    that, unlike closeness, is defined on disconnected graphs and,
    unlike PageRank, measures OUT-reach. Exact-integer ticks (10⁶/1,
    /2, /3) so parallel sums reassociate freely. The unbounded version
    is all-pairs BFS (O(V·E) — never at 100 TB); the K-bound caps the
    frontier at outdeg^K pairs per source, and each of the K unrolled
    rounds is one equi-join + per-(src,node) min-agg — the same
    frontier-relax shape as khop_cheapest, fanned out from EVERY node
    at once instead of one seed. The oracle replays the identical K
    rounds as chained CTEs."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    edges = d.select(
        F.col("doc_id").alias("esrc"),
        F.explode(
            F.array(
                *[
                    D.md5_long(F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))) % n
                    for j in range(3)
                ]
            )
        ).alias("dst"),
    )
    dist = d.select(
        F.col("doc_id").alias("src"),
        F.col("doc_id").cast("long").alias("node"),
        F.lit(0).cast("long").alias("dist"),
    )
    for _ in range(_HC_K):
        expand = (
            dist.join(edges, dist.node == edges.esrc)
            .select("src", F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        dist = (
            dist.unionByName(expand)
            .groupBy("src", "node")
            .agg(F.min("dist").cast("long").alias("dist"))
        )
    return (
        dist.filter(F.col("dist") > 0)
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_reach"),
            F.sum(F.expr("1000000L div dist")).cast("long").alias("h_ticks"),
        )
    )



@register(
    "wcc_chain_docs",
    f"""
WITH f AS (
  SELECT cast(doc_id as bigint) AS i,
         ({_WCC_EDGE} % 100 < 70
          AND doc_id < (SELECT count(*) FROM documents) - 1) AS hn,
         (doc_id > 0 AND {_WCC_PREV} % 100 < 70) AS hp
  FROM documents
), g AS (
  SELECT i, hn, hp,
         max(CASE WHEN NOT hp THEN i END)
           OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS comp
  FROM f
)
SELECT i AS doc_id, cast(comp as bigint) AS comp FROM g WHERE hn OR hp
""",
)
def wcc_chain_docs(spark, sf_dir):
    """Weakly-connected components as a first-class registry query
    (operators/components.py — min-label propagation with pointer
    jumping, O(log diameter) rounds). The graph is a deterministic
    chain: edge (i, i+1) exists iff md5('w:'||i) % 100 < 70, giving
    components of highly variable path length (the adversarial case
    for label propagation — diameter = component size). The ORACLE is
    method-independent: on a chain, a node's component minimum is the
    last break at-or-before it, a single running-max window — so the
    iterative Spark labeling is checked against a closed form, not a
    replay of itself. (near_dedup_clusters checks the same operator
    against DuckDB's recursive closure on an arbitrary graph.)"""
    from gipspark.operators.components import connected_components

    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    edges = (
        d.filter(F.col("doc_id") < n - 1)
        .filter(D.md5_long(F.concat(F.lit("w:"), F.col("doc_id").cast("string"))) % 100 < 70)
        .select(
            F.col("doc_id").cast("long").alias("id_a"),
            (F.col("doc_id") + 1).cast("long").alias("id_b"),
        )
    )
    comp = connected_components(edges)
    return comp.select(
        F.col("node").cast("long").alias("doc_id"), F.col("comp").cast("long").alias("comp")
    )



@register(
    "scc_doc_links",
    f"""
WITH RECURSIVE nodes AS (SELECT cast(doc_id as bigint) AS id FROM documents),
edges AS (
  SELECT id AS src, least(id + 1 + {_SCC_F} % 25, {_SCC_N} - 1) AS dst
  FROM nodes WHERE id < {_SCC_N} - 1
  UNION
  SELECT id AS src, least(id + 1 + {_SCC_H} % 7, {_SCC_N} - 1) AS dst
  FROM nodes WHERE id < {_SCC_N} - 1 AND {_SCC_G} % 100 < 60
  UNION
  SELECT id AS src, greatest(id - 1 - {_SCC_B} % 40, 0) AS dst
  FROM nodes WHERE id > 0 AND {_SCC_K} % 100 < 45
),
e2 AS (SELECT src, dst FROM edges WHERE src <> dst),
fwd(a, b) AS (
  SELECT src, dst FROM e2
  UNION
  SELECT f.a, e.dst FROM fwd f JOIN e2 e ON f.b = e.src
),
mut AS (SELECT f1.a, f1.b FROM fwd f1 JOIN fwd f2 ON f1.a = f2.b AND f1.b = f2.a)
SELECT n.id AS doc_id, least(n.id, coalesce(min(m.b), n.id)) AS scc_id
FROM nodes n LEFT JOIN mut m ON n.id = m.a
GROUP BY n.id
""",
)
def scc_doc_links(spark, sf_dir):
    """Strongly connected components over a deterministic crawl-like
    digraph (short md5-derived forward hops + bounded back links —
    overlapping local cycles along the id line, the redirect-ring /
    link-farm shape). Runs the distributed trim + forward-max-coloring
    + backward-sweep algorithm (operators/scc.py): trim dissolves DAG
    tails as singletons, coloring pointer-jumps to its fixpoint in
    O(log diameter) rounds, and all pivots sweep their color classes
    concurrently. The oracle is method-independent: DuckDB's recursive
    transitive closure both ways — scc_id(v) = min over mutually
    reachable partners. Labels are min-member ids, matching WCC's
    contract (wcc_chain_docs, near_dedup_clusters)."""
    from gipspark.operators.scc import strongly_connected_components

    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents").select(F.col("doc_id").cast("long").alias("id"))

    def h(tag):
        return D.md5_long(F.concat(F.lit(tag + ":"), F.col("id").cast("string")))

    fe = d.filter(F.col("id") < n - 1).select(
        F.col("id").alias("src"),
        F.least(F.col("id") + 1 + h("f") % 25, F.lit(n - 1).cast("long")).alias("dst"),
    )
    ge = (
        d.filter((F.col("id") < n - 1) & (h("g") % 100 < 60))
        .select(
            F.col("id").alias("src"),
            F.least(F.col("id") + 1 + h("h") % 7, F.lit(n - 1).cast("long")).alias("dst"),
        )
    )
    be = (
        d.filter((F.col("id") > 0) & (h("k") % 100 < 45))
        .select(
            F.col("id").alias("src"),
            F.greatest(F.col("id") - 1 - h("b") % 40, F.lit(0).cast("long")).alias("dst"),
        )
    )
    edges = fe.unionByName(ge).unionByName(be)
    comp = strongly_connected_components(d, edges)
    return comp.select(F.col("node").alias("doc_id"), F.col("scc").alias("scc_id"))



@register(
    "stress_centrality_links",
    f"""
WITH nodes AS (SELECT cast(doc_id as bigint) AS id FROM documents),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT doc_id AS src, {_PR_EDGE_DST} % {_PR_N} AS dst
    FROM documents, (VALUES (0),(1),(2)) AS t(j))
  WHERE src <> dst
),
l1 AS (SELECT src AS s, dst AS v, cast(1 as bigint) AS sig FROM edges),
l2 AS (
  SELECT a.s, e.dst AS v, cast(sum(a.sig) as bigint) AS sig
  FROM l1 a JOIN edges e ON a.v = e.src
  WHERE e.dst <> a.s
    AND NOT EXISTS (SELECT 1 FROM l1 x WHERE x.s = a.s AND x.v = e.dst)
  GROUP BY a.s, e.dst
),
l3 AS (
  SELECT a.s, e.dst AS v, cast(sum(a.sig) as bigint) AS sig
  FROM l2 a JOIN edges e ON a.v = e.src
  WHERE e.dst <> a.s
    AND NOT EXISTS (SELECT 1 FROM l1 x WHERE x.s = a.s AND x.v = e.dst)
    AND NOT EXISTS (SELECT 1 FROM l2 x WHERE x.s = a.s AND x.v = e.dst)
  GROUP BY a.s, e.dst
),
p AS (
  SELECT s, v, 1 AS d, sig FROM l1
  UNION ALL SELECT s, v, 2 AS d, sig FROM l2
  UNION ALL SELECT s, v, 3 AS d, sig FROM l3
),
st AS (
  SELECT i.v AS node, cast(sum(i.sig * o.sig) as bigint) AS stress
  FROM p i JOIN p o ON i.v = o.s
  JOIN p dd ON dd.s = i.s AND dd.v = o.v AND dd.d = i.d + o.d
  WHERE o.v <> i.s
  GROUP BY i.v
)
SELECT n.id AS doc_id, cast(coalesce(st.stress, 0) as bigint) AS stress
FROM nodes n LEFT JOIN st ON n.id = st.node
""",
)
def stress_centrality_links(spark, sf_dir):
    """K-bounded stress centrality: for every node, the number of
    shortest paths (dist ≤ 3) passing THROUGH it — exact BIGINT path
    counting, the integer-only member of the betweenness family
    (betweenness itself needs σ_sv/σ_st rationals; stress is the
    pure-count variant, Shimbel 1953). Three unrolled BFS rounds with
    the σ recurrence (σ_d(t) = Σ σ_{d-1}(b) over frontier in-edges,
    anti-joined against closer levels), then one triple join: split
    pairs (s→v, v→t) are shortest s-t paths iff d(s,v)+d(v,t)=d(s,t)
    — the membership join against the pair table enforces it. All
    shuffle sizes are bounded by outdeg^K per source (the
    harmonic_centrality_links contract); the oracle replays the same
    unrolled rounds."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    nodes = d.select(F.col("doc_id").cast("long").alias("id"))
    edges = (
        d.select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.array(
                    *[
                        D.md5_long(F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))) % n
                        for j in range(3)
                    ]
                )
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    l1 = edges.select(F.col("src").alias("s"), F.col("dst").alias("v"), F.lit(1).cast("long").alias("sig"))

    def _next(prev: DataFrame, *closer: DataFrame) -> DataFrame:
        step = (
            prev.join(edges, prev["v"] == edges["src"])
            .filter(F.col("dst") != F.col("s"))
            .select("s", F.col("dst").alias("nv"), "sig")
        )
        for c in closer:
            step = step.join(
                c.select(F.col("s").alias("cs"), F.col("v").alias("cv")),
                (F.col("s") == F.col("cs")) & (F.col("nv") == F.col("cv")),
                "anti",
            )
        return step.groupBy("s", F.col("nv").alias("v")).agg(F.sum("sig").cast("long").alias("sig"))

    l2 = _next(l1, l1)
    l3 = _next(l2, l1, l2)
    p = (
        l1.withColumn("d", F.lit(1))
        .unionByName(l2.withColumn("d", F.lit(2)))
        .unionByName(l3.withColumn("d", F.lit(3)))
    )
    i = p.select(F.col("s").alias("i_s"), F.col("v").alias("i_v"), F.col("d").alias("i_d"), F.col("sig").alias("i_sig"))
    o = p.select(F.col("s").alias("o_s"), F.col("v").alias("o_v"), F.col("d").alias("o_d"), F.col("sig").alias("o_sig"))
    dd = p.select(F.col("s").alias("d_s"), F.col("v").alias("d_v"), F.col("d").alias("d_d"))
    st = (
        i.join(o, i["i_v"] == o["o_s"])
        .filter(F.col("o_v") != F.col("i_s"))
        .join(
            dd,
            (F.col("d_s") == F.col("i_s"))
            & (F.col("d_v") == F.col("o_v"))
            & (F.col("d_d") == F.col("i_d") + F.col("o_d")),
        )
        .groupBy(F.col("i_v").alias("node"))
        .agg(F.sum(F.col("i_sig") * F.col("o_sig")).cast("long").alias("stress"))
    )
    return nodes.join(st, nodes["id"] == st["node"], "left").select(
        F.col("id").alias("doc_id"),
        F.coalesce(F.col("stress"), F.lit(0)).cast("long").alias("stress"),
    )



@register(
    "mis_luby_links",
    f"""
WITH RECURSIVE und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM (SELECT doc_id AS src, {_PR_EDGE_DST} % {_PR_N} AS dst
        FROM documents, (VALUES (0),(1),(2)) AS t(j))
  WHERE src <> dst
), sym AS (
  SELECT a AS u, b AS v FROM und UNION ALL SELECT b AS u, a AS v FROM und
), r(it, node, p, is_mis) AS (
  SELECT 0, doc_id, {_MIS_P}, false FROM documents
  UNION ALL
  (
    WITH act AS (SELECT it, node, p FROM r WHERE NOT is_mis),
    nb AS (
      SELECT x.node AS nd, max(struct_pack(p := y.p, n := y.node)) AS mx
      FROM act x JOIN sym e ON x.node = e.u JOIN act y ON y.node = e.v
      GROUP BY x.node
    ),
    win AS (
      SELECT a.it, a.node, a.p,
             (nb.mx IS NULL OR struct_pack(p := a.p, n := a.node) > nb.mx) AS w
      FROM act a LEFT JOIN nb ON a.node = nb.nd
    )
    SELECT it + 1, node, p, true FROM win WHERE w
    UNION ALL
    SELECT w1.it + 1, w1.node, w1.p, false
    FROM win w1
    WHERE NOT w1.w
      AND NOT EXISTS (
        SELECT 1 FROM win w2 JOIN sym e ON w2.node = e.u AND e.v = w1.node
        WHERE w2.w)
  )
)
SELECT node, cast(it as int) AS round FROM r WHERE is_mis
""",
)
def mis_luby_links(spark, sf_dir):
    """Deterministic Luby maximal independent set on the md5 doc link
    graph — the degree-bounded scheduling/coloring primitive (pick a
    conflict-free set of crawl hosts, then peel and repeat).  Each
    round is one neighbor-max shuffle + one anti join, frames
    localCheckpoint-ed (operators/mis.py); priorities are md5-derived
    once, so the selection AND the round each node is selected in are
    replayable — the oracle is a WITH RECURSIVE CTE running the very
    same round rule.  Emits (node, round): independence, maximality,
    and the round trace all hash-checked."""
    from gipspark.operators.mis import luby_mis

    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    nodes = d.select(F.col("doc_id").alias("id"))
    edges = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    D.md5_long(F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))) % n
                    for j in range(3)
                ]
            )
        ).alias("dst"),
    )
    out = luby_mis(nodes, edges)
    return out.select("node", F.col("round").cast("int").alias("round"))



@register(
    "mst_customers",
    f"""
WITH RECURSIVE nd AS (
  SELECT c_custkey AS ck,
         ((cast(c_custkey as bigint) * {C.LAT_MUL}) % {C.LAT_MOD}) // 100 AS la,
         ((cast(c_custkey as bigint) * {C.LON_MUL}) % {C.LON_MOD}) // 100 AS lo
  FROM customer WHERE c_custkey % 7 = 1
), ed AS (
  SELECT x.ck AS a, y.ck AS b,
         ((x.la - y.la) * (x.la - y.la) + (x.lo - y.lo) * (x.lo - y.lo)) * 1073741824
           + least(x.ck, y.ck) * 32768 + greatest(x.ck, y.ck) AS w
  FROM nd x JOIN nd y ON x.ck <> y.ck
), root AS (
  SELECT min(ck) AS r FROM nd
), r(it, visited, eout) AS (
  SELECT 0, [(SELECT r FROM root)], CAST([] AS STRUCT(a BIGINT, b BIGINT, w BIGINT)[])
  UNION ALL
  SELECT r.it + 1, list_append(r.visited, p.s.b), list_append(r.eout, p.s)
  FROM r CROSS JOIN LATERAL (
    SELECT arg_min(struct_pack(a := cast(e.a as bigint), b := cast(e.b as bigint),
                               w := cast(e.w as bigint)), e.w) AS s
    FROM ed e
    WHERE list_contains(r.visited, e.a) AND NOT list_contains(r.visited, e.b)
  ) p
  WHERE p.s IS NOT NULL
)
SELECT least(u.s.a, u.s.b) AS a, greatest(u.s.a, u.s.b) AS b, u.s.w AS w
FROM (SELECT eout FROM r ORDER BY it DESC LIMIT 1) f, unnest(f.eout) AS u(s)
""",
)
def mst_customers(spark, sf_dir):
    """Minimum spanning tree of the capped customer point set (every
    7th key, complete graph on the integer hectometre-degree lattice)
    via distributed Borůvka (operators/mst.py) — the clustering /
    network-design primitive (single-linkage dendrogram = MST + cut).
    Weights pack (d², min_key, max_key) into one BIGINT so they are
    pairwise DISTINCT ⇒ the MST is unique and the DuckDB oracle — a
    recursive-CTE PRIM replay, a genuinely different algorithm — must
    produce the identical edge set: a method-independent check, not a
    mirror.  The fixture's complete graph is bounded by the key cap
    (diameter_pairs contract); at scale you feed Borůvka the kNN-graph
    edges from knn_join instead — the operator itself only ever
    shuffles the edge list by component label and contracts via WCC on
    the SELECTED edges (≤ #components per round, O(log n) rounds)."""
    from gipspark.operators.mst import boruvka_mst

    nd = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 7 == 1)
        .select(
            F.col("c_custkey").alias("ck"),
            F.floor(((F.col("c_custkey").cast("long") * F.lit(C.LAT_MUL)) % F.lit(C.LAT_MOD)) / 100)
            .cast("long")
            .alias("la"),
            F.floor(((F.col("c_custkey").cast("long") * F.lit(C.LON_MUL)) % F.lit(C.LON_MOD)) / 100)
            .cast("long")
            .alias("lo"),
        )
    )
    y = nd.select(F.col("ck").alias("bck"), F.col("la").alias("bla"), F.col("lo").alias("blo"))
    d2 = (F.col("la") - F.col("bla")) * (F.col("la") - F.col("bla")) + (
        F.col("lo") - F.col("blo")
    ) * (F.col("lo") - F.col("blo"))
    ed = nd.join(y, F.col("ck") < F.col("bck")).select(
        F.col("ck").alias("a"),
        F.col("bck").alias("b"),
        (
            d2 * F.lit(1073741824).cast("long")
            + F.least("ck", "bck") * F.lit(32768)
            + F.greatest("ck", "bck")
        ).alias("w"),
    )
    return boruvka_mst(ed)



@register("walk_counts_links", _walk_oracle_sql())
def walk_counts_links(spark, sf_dir):
    """Length-4 walk counts into each node (the unnormalized power-
    iteration / eigenvector-centrality estimate x = A^4·1, and exactly
    the katz numerator at beta=1) over the shared 3-out md5 link graph
    (same edge fixture as pagerank_doc_links). Kept in BIGINT so the
    oracle's unrolled 4-round replay hashes identically regardless of
    partition sum order — the repo-wide no-ln()/no-float-reduction
    rule. One contrib shuffle per round on dst (the distributed
    SpMV shape); mass grows ×outdeg per round so 4 rounds stay far
    inside int64 at any corpus size with bounded out-degree."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    nodes = d.select(F.col("doc_id").alias("id"))
    edges = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    D.md5_long(F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))) % n
                    for j in range(3)
                ]
            )
        ).alias("dst"),
    )
    x = nodes.select("id", F.lit(1).cast("long").alias("w"))
    for _ in range(4):
        contrib = (
            edges.join(x.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum("w").cast("long").alias("w"))
        )
        x = nodes.join(contrib.withColumnRenamed("dst", "id"), "id", "left").select(
            "id", F.coalesce(F.col("w"), F.lit(0)).cast("long").alias("w")
        )
    return x.select("id", F.col("w").alias("walks4"))



@register("dag_maxpath4_links", _dag_oracle_sql())
def dag_maxpath4_links(spark, sf_dir):
    """Critical-path / longest-path over a DAG, depth-bounded to 4
    hops: max-plus relaxation (the tropical-semiring twin of the
    walk-count SpMV) over forward-only md5 edges (dst = src+1..src+25,
    so the graph is acyclic by construction) with integer weights
    1..97. best_k(v) = max(best_{k-1}(v), max_{(u,v,w)} best_{k-1}(u)
    + w) — the scheduling/lineage-depth primitive. Exact BIGINT; the
    oracle replays the same 4 unrolled rounds. Each round is one
    shuffle on dst; unbounded-depth callers use the converge loop in
    operators/shortestpath.py (localCheckpoint every few rounds)."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    nodes = d.select(F.col("doc_id").alias("id"))
    eraw = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (
                            F.col("doc_id")
                            + 1
                            + D.md5_long(
                                F.concat(F.lit(f"dag:{j}:"), F.col("doc_id").cast("string"))
                            )
                            % 25
                        ).alias("dst"),
                        (
                            1
                            + D.md5_long(
                                F.concat(F.lit(f"dag:{j}:"), F.col("doc_id").cast("string"))
                            )
                            % 97
                        ).alias("w"),
                    )
                    for j in range(3)
                ]
            )
        ).alias("e"),
    ).select("src", F.col("e.dst").alias("dst"), F.col("e.w").alias("w"))
    edges = (
        eraw.filter(F.col("dst") < n)
        .groupBy("src", "dst")
        .agg(F.max("w").cast("long").alias("w"))
    )
    best = nodes.select("id", F.lit(0).cast("long").alias("best"))
    for _ in range(4):
        relax = (
            edges.join(best.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.max(F.col("best") + F.col("w")).alias("nb"))
        )
        best = best.join(relax.withColumnRenamed("dst", "id"), "id", "left").select(
            "id",
            F.greatest(F.col("best"), F.coalesce(F.col("nb"), F.lit(-1))).cast("long").alias("best"),
        )
    return best.select("id", F.col("best").alias("maxpath4"))



@register("ppr_seeded_links", _ppr_oracle_sql())
def ppr_seeded_links(spark, sf_dir):
    """Personalized PageRank from a seed set (every 50th doc — the
    trusted-host / topic-seed diffusion that ranks pages by proximity
    to a whitelist, TrustRank's core): identical integer-mass ticks to
    pagerank_doc_links but the teleport term returns mass ONLY to the
    seeds, so rank decays geometrically with link distance from the
    seed set. 3 unrolled rounds, floor-division damping, BIGINT end to
    end; rows with rank 0 (unreachable within 3 hops) are dropped.
    Same SpMV shuffle shape as pagerank — one contrib exchange per
    round — with the seed join a broadcast (seed sets are tiny)."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    nodes = d.select(F.col("doc_id").alias("id"))
    seeds = nodes.filter(F.col("id") % 50 == 0).select(F.col("id").alias("sid"))
    edges = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    D.md5_long(F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))) % n
                    for j in range(3)
                ]
            )
        ).alias("dst"),
    )
    deg = edges.groupBy("src").agg(F.count("*").cast("long").alias("outdeg"))
    n_seeds = seeds.count()  # bounded driver scalar: seed-set size
    seed_mass = 1000000000000 // n_seeds
    r = nodes.join(F.broadcast(seeds), nodes.id == seeds.sid, "left").select(
        "id",
        F.when(F.col("sid").isNotNull(), F.lit(seed_mass)).otherwise(F.lit(0))
        .cast("long")
        .alias("rank"),
    )
    for _ in range(3):
        contrib = (
            edges.join(r.withColumnRenamed("id", "src"), "src")
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("rank div outdeg")).cast("long").alias("in_sum"))
        )
        r = (
            nodes.join(contrib.withColumnRenamed("dst", "id"), "id", "left")
            .join(F.broadcast(seeds), F.col("id") == F.col("sid"), "left")
            .select(
                "id",
                (
                    F.when(
                        F.col("sid").isNotNull(), F.lit((15 * seed_mass) // 100)
                    ).otherwise(F.lit(0))
                    + F.expr("(85 * coalesce(in_sum, cast(0 as bigint))) div 100")
                )
                .cast("long")
                .alias("rank"),
            )
        )
    return r.filter(F.col("rank") > 0)



@register(
    "four_clique_count",
    f"""
WITH edges_raw AS (
  SELECT doc_id AS src,
         (doc_id + 1 + {_TRI_DST} % 25) % (SELECT count(*) FROM documents) AS dst
  FROM documents, (VALUES (0),(1),(2),(4),(5)) AS t(j)
), und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges_raw WHERE src <> dst
), deg AS (
  SELECT id, cast(count(*) as bigint) AS deg
  FROM (SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und)
  GROUP BY id
), keyed AS (
  SELECT und.a, und.b,
         dd1.deg * 4294967296 + und.a AS ka,
         dd2.deg * 4294967296 + und.b AS kb
  FROM und JOIN deg dd1 ON dd1.id = und.a JOIN deg dd2 ON dd2.id = und.b
), o AS (
  SELECT CASE WHEN ka < kb THEN a ELSE b END AS u,
         CASE WHEN ka < kb THEN b ELSE a END AS v,
         CASE WHEN ka < kb THEN ka ELSE kb END AS ku,
         greatest(ka, kb) AS kv
  FROM keyed
), tri AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z, e1.ku AS kx, e1.kv AS ky, e2.kv AS kz
  FROM o e1
  JOIN o e2 ON e1.u = e2.u AND e1.kv < e2.kv
  JOIN o e3 ON e3.u = e1.v AND e3.v = e2.v
), k4 AS (
  SELECT t.x, t.y, t.z, e4.v AS w
  FROM tri t
  JOIN o e4 ON e4.u = t.z AND t.kz < e4.kv
  JOIN o e5 ON e5.u = t.x AND e5.v = e4.v
  JOIN o e6 ON e6.u = t.y AND e6.v = e4.v
)
SELECT cast((SELECT count(*) FROM und) as bigint) AS n_edges,
       cast((SELECT count(*) FROM tri) as bigint) AS n_triangles,
       cast((SELECT count(*) FROM k4) as bigint) AS n_k4
""",
)
def four_clique_count(spark, sf_dir):
    """K4 (4-clique) census over the shared 5-out undirected md5 graph
    — the next motif up from triangle_count_links (clique cores flag
    link farms and co-citation cliques): orient every edge by
    (degree, id) so each clique is enumerated exactly once in the
    low→high order, extend each oriented triangle by a fourth vertex
    adjacent to all three (three hash joins against the oriented edge
    list — the degree orientation bounds every join fan-out by the
    graph's degeneracy, the standard scalable motif-counting shape;
    never an all-pairs product). Exact counts; DuckDB replays the
    identical oriented joins."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    er = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    (
                        F.col("doc_id")
                        + 1
                        + D.md5_long(
                            F.concat(F.lit(f"t:{j}:"), F.col("doc_id").cast("string"))
                        )
                        % 25
                    )
                    % n
                    for j in (0, 1, 2, 4, 5)
                ]
            )
        ).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    und = er.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    deg = (
        und.select(F.col("a").alias("id"))
        .union(und.select("b"))
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    keyed = (
        und.join(deg.withColumnRenamed("id", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("id", "b").withColumnRenamed("deg", "db"), "b")
        .select(
            "a",
            "b",
            (F.col("da") * F.lit(4294967296) + F.col("a")).alias("ka"),
            (F.col("db") * F.lit(4294967296) + F.col("b")).alias("kb"),
        )
    )
    o = keyed.select(
        F.when(F.col("ka") < F.col("kb"), F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(F.col("ka") < F.col("kb"), F.col("b")).otherwise(F.col("a")).alias("v"),
        F.least("ka", "kb").alias("ku"),
        F.greatest("ka", "kb").alias("kv"),
    )
    e1 = o.alias("e1")
    e2 = o.alias("e2")
    e3 = o.alias("e3")
    tri = (
        e1.join(e2, (F.col("e1.u") == F.col("e2.u")) & (F.col("e1.kv") < F.col("e2.kv")))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.v")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("x"),
            F.col("e1.v").alias("y"),
            F.col("e2.v").alias("z"),
            F.col("e1.kv").alias("ky"),
            F.col("e2.kv").alias("kz"),
        )
    )
    e4 = o.alias("e4")
    e5 = o.alias("e5")
    e6 = o.alias("e6")
    k4 = (
        tri.join(e4, (F.col("e4.u") == F.col("z")) & (F.col("kz") < F.col("e4.kv")))
        .join(e5, (F.col("e5.u") == F.col("x")) & (F.col("e5.v") == F.col("e4.v")))
        .join(e6, (F.col("e6.u") == F.col("y")) & (F.col("e6.v") == F.col("e4.v")))
    )
    n_e = und.agg(F.count("*").cast("long").alias("n_edges"))
    n_t = tri.agg(F.count("*").cast("long").alias("n_triangles"))
    n_4 = k4.agg(F.count("*").cast("long").alias("n_k4"))
    return (
        n_e.crossJoin(F.broadcast(n_t))
        .crossJoin(F.broadcast(n_4))
        .select("n_edges", "n_triangles", "n_k4")
    )



@register(
    "edge_embeddedness_links",
    f"""
WITH edges_raw AS (
  SELECT doc_id AS src,
         (doc_id + 1 + {_TRI_DST} % 25) % (SELECT count(*) FROM documents) AS dst
  FROM documents, (VALUES (0),(1),(2),(4),(5)) AS t(j)
), und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges_raw WHERE src <> dst
), adj AS (
  SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und
), common AS (
  SELECT e.a, e.b, cast(count(*) as bigint) AS emb
  FROM und e JOIN adj x ON x.u = e.a JOIN adj y ON y.u = e.b AND y.v = x.v
  GROUP BY e.a, e.b
)
SELECT und.a, und.b, coalesce(c.emb, 0) AS embeddedness,
       CASE WHEN coalesce(c.emb, 0) = 0 THEN 1 ELSE 0 END AS is_local_bridge
FROM und LEFT JOIN common c ON c.a = und.a AND c.b = und.b
""",
)
def edge_embeddedness_links(spark, sf_dir):
    """Edge embeddedness (common-neighbor count per edge — Granovetter
    made computable: embeddedness 0 = a LOCAL BRIDGE, the weak tie
    that carries novel information across communities; high
    embeddedness = redundant strong tie): per undirected edge, wedges
    through both endpoints meet in one (edge, neighbor) equi-join
    pair — the triangle-count kernel re-aggregated per edge instead
    of globally. Exact counts; bridges flagged. Shuffle ∝ wedges,
    bounded by Σdeg² like every triangle-family op."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    er = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    (
                        F.col("doc_id")
                        + 1
                        + D.md5_long(
                            F.concat(F.lit(f"t:{j}:"), F.col("doc_id").cast("string"))
                        )
                        % 25
                    )
                    % n
                    for j in (0, 1, 2, 4, 5)
                ]
            )
        ).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    und = er.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    adj = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    x = adj.alias("x")
    y = adj.alias("y")
    common = (
        und.join(x, F.col("x.u") == F.col("a"))
        .join(y, (F.col("y.u") == F.col("b")) & (F.col("y.v") == F.col("x.v")))
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("emb"))
    )
    return und.join(common, ["a", "b"], "left").select(
        "a",
        "b",
        F.coalesce(F.col("emb"), F.lit(0)).cast("long").alias("embeddedness"),
        F.when(F.coalesce(F.col("emb"), F.lit(0)) == 0, 1).otherwise(0).alias("is_local_bridge"),
    )



@register(
    "rich_club_links",
    f"""
WITH edges_raw AS (
  SELECT doc_id AS src,
         (doc_id + 1 + {_TRI_DST} % 25) % (SELECT count(*) FROM documents) AS dst
  FROM documents, (VALUES (0),(1),(2),(4),(5)) AS t(j)
), und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges_raw WHERE src <> dst
), deg AS (
  SELECT id, cast(count(*) as bigint) AS deg
  FROM (SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und)
  GROUP BY id
), ks(k) AS (VALUES {', '.join(f'({k})' for k in _RC_KS)}),
rich AS (
  SELECT ks.k, deg.id FROM ks JOIN deg ON deg.deg > ks.k
), nk AS (
  SELECT k, cast(count(*) as bigint) AS n_rich FROM rich GROUP BY k
), ek AS (
  SELECT r1.k, cast(count(*) as bigint) AS e_rich
  FROM und JOIN rich r1 ON r1.id = und.a JOIN rich r2 ON r2.id = und.b AND r2.k = r1.k
  GROUP BY r1.k
)
SELECT nk.k, nk.n_rich, coalesce(ek.e_rich, 0) AS e_rich,
       cast(nk.n_rich * (nk.n_rich - 1) // 2 as bigint) AS possible,
       cast(CASE WHEN nk.n_rich >= 2
                 THEN (coalesce(ek.e_rich, 0) * 2000000) // (nk.n_rich * (nk.n_rich - 1))
                 ELSE 0 END as bigint) AS phi_q
FROM nk LEFT JOIN ek ON ek.k = nk.k
""",
)
def rich_club_links(spark, sf_dir):
    """Rich-club coefficient φ(k) = E_{{>k}} / C(N_{{>k}}, 2) at k ∈
    {{2,4,8}} — do high-degree hubs preferentially interlink (the
    link-farm / oligarchy signature that degree assortativity only
    hints at)? Membership is one degree filter; rich-edge counting is
    two id-keyed hash joins of the edge list against the (k, member)
    dim; φ in 1e6 fixed point with the exact pair denominator. No
    pair enumeration — possible pairs come from arithmetic, not a
    join."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    er = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    (
                        F.col("doc_id")
                        + 1
                        + D.md5_long(
                            F.concat(F.lit(f"t:{j}:"), F.col("doc_id").cast("string"))
                        )
                        % 25
                    )
                    % n
                    for j in (0, 1, 2, 4, 5)
                ]
            )
        ).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    und = er.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    deg = (
        und.select(F.col("a").alias("id"))
        .union(und.select("b"))
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    ks = spark.createDataFrame([(k,) for k in _RC_KS], "k int")
    rich = ks.crossJoin(deg).filter(F.col("deg") > F.col("k")).select("k", "id")
    nk = rich.groupBy("k").agg(F.count("*").cast("long").alias("n_rich"))
    r1 = rich.select(F.col("k"), F.col("id").alias("a"))
    r2 = rich.select(F.col("k").alias("k2"), F.col("id").alias("rb"))
    ek = (
        und.join(r1, "a")
        .join(r2, (F.col("k2") == F.col("k")) & (F.col("rb") == F.col("b")))
        .groupBy("k")
        .agg(F.count("*").cast("long").alias("e_rich"))
    )
    return (
        nk.join(ek, "k", "left")
        .select(
            "k",
            "n_rich",
            F.coalesce(F.col("e_rich"), F.lit(0)).cast("long").alias("e_rich"),
            F.expr("(n_rich * (n_rich - 1)) div 2").cast("long").alias("possible"),
            F.when(
                F.col("n_rich") >= 2,
                F.expr("(coalesce(e_rich, 0) * 2000000) div (n_rich * (n_rich - 1))"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("phi_q"),
        )
    )



@register("eigen_centrality_links", _eig_sql())
def eigen_centrality_links(spark, sf_dir):
    """Eigenvector centrality of the small-world link graph by three
    unrolled power-iteration rounds — the graph twin of
    power_iteration_embeddings (same fixed-point discipline, but the
    matvec is an EDGE JOIN instead of a 1-row scalar fold, which is
    how eigenvector problems actually distribute: v ← A·v is one
    symmetrized-edge join + one hash agg per round, renormalized to
    1024 ticks by the 1-row max broadcast): prestige flows to nodes
    adjacent to high-prestige nodes, the recursion degree centrality
    can't see. Exact integer throughout; top-10 by (v, id). Three
    join+agg rounds on the edge list — shuffle ∝ 3·|E|, the bounded
    alternative to convergence-loop centrality at 100 TB."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    er = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    (
                        F.col("doc_id")
                        + 1
                        + D.md5_long(
                            F.concat(F.lit(f"t:{j}:"), F.col("doc_id").cast("string"))
                        )
                        % 25
                    )
                    % n
                    for j in (0, 1, 2, 4, 5)
                ]
            )
        ).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    und = er.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    sym = und.select(F.col("a").alias("s"), F.col("b").alias("d_")).unionAll(
        und.select(F.col("b").alias("s"), F.col("a").alias("d_"))
    )
    v = sym.select(F.col("s").alias("id")).distinct().withColumn(
        "v", F.lit(1024).cast("long")
    )
    for _t in range(_EIG_ROUNDS):
        w = (
            sym.join(v.select(F.col("id").alias("s"), "v"), "s")
            .groupBy(F.col("d_").alias("id"))
            .agg(F.sum("v").cast("long").alias("w"))
        )
        m = w.agg(F.max("w").cast("long").alias("m"))
        v = w.crossJoin(F.broadcast(m)).select(
            "id", F.expr("(w * 1024) div m").cast("long").alias("v")
        )
    wr = Window.orderBy(F.col("v").desc(), F.col("id").asc())
    return (
        v.withColumn("rnk", F.row_number().over(wr).cast("int"))
        .filter(F.col("rnk") <= _EIG_TOPK)
        .select("id", F.col("v").alias("v_q"), "rnk")
    )



@register("densest_peel_links", _peel_sql())
def densest_peel_links(spark, sf_dir):
    """Densest-subgraph peeling (the parallel batch variant of
    Charikar's 2-approximation — each round removes every node whose
    degree is strictly below the CURRENT average, which is the
    provably O(log n)-round distributed formulation, here unrolled 3
    rounds): per round, the surviving (nodes, edges, density = E/N in
    1e6 ticks) — a rising density curve certifies the peel is closing
    in on the dense core (the link-farm / community-nucleus finder;
    the k-core keeps a degree FLOOR, the peel chases the density
    MAXIMUM). Each round is one degree agg + one semi-join pair; the
    avg-degree test is cross-multiplied (deg·N ≥ 2E), no division."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    er = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    (
                        F.col("doc_id")
                        + 1
                        + D.md5_long(
                            F.concat(F.lit(f"t:{j}:"), F.col("doc_id").cast("string"))
                        )
                        % 25
                    )
                    % n
                    for j in (0, 1, 2, 4, 5)
                ]
            )
        ).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    # each round's survivor set feeds four downstream consumers (degree agg,
    # density row, two semi-joins) — localCheckpoint cuts the nested lineage
    # so round t executes once, not once per consumer (multi_source_hops rule)
    cur = (
        er.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outs = []
    for t in range(_PEEL_ROUNDS + 1):
        deg = (
            cur.select(F.col("a").alias("id"))
            .unionAll(cur.select(F.col("b").alias("id")))
            .groupBy("id")
            .agg(F.count("*").cast("long").alias("deg"))
        )
        st = deg.agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.expr("sum(deg) div 2").cast("long").alias("n_edges"),
        )
        outs.append(
            st.select(
                F.lit(t).cast("int").alias("round"),
                "n_nodes",
                "n_edges",
                F.expr(
                    "CASE WHEN n_nodes > 0 THEN (n_edges * 1000000) div n_nodes ELSE 0 END"
                )
                .cast("long")
                .alias("density_q"),
            )
        )
        if t < _PEEL_ROUNDS:
            keep = (
                deg.crossJoin(F.broadcast(st))
                .filter(F.col("deg") * F.col("n_nodes") >= 2 * F.col("n_edges"))
                .select("id")
            )
            cur = (
                cur.join(keep.select(F.col("id").alias("a")), "a")
                .join(keep.select(F.col("id").alias("b")), "b")
                .localCheckpoint(eager=True)
            )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out



@register(
    "bowtie_structure_links",
    f"""
WITH RECURSIVE nodes AS (SELECT cast(doc_id as bigint) AS id FROM documents),
edges AS (
  SELECT id AS src, least(id + 1 + {_SCC_F} % 25, {_SCC_N} - 1) AS dst
  FROM nodes WHERE id < {_SCC_N} - 1
  UNION
  SELECT id AS src, least(id + 1 + {_SCC_H} % 7, {_SCC_N} - 1) AS dst
  FROM nodes WHERE id < {_SCC_N} - 1 AND {_SCC_G} % 100 < 60
  UNION
  SELECT id AS src, greatest(id - 1 - {_SCC_B} % 40, 0) AS dst
  FROM nodes WHERE id > 0 AND {_SCC_K} % 100 < 45
),
e2 AS MATERIALIZED (SELECT src, dst FROM edges WHERE src <> dst),
fwd(a, b) AS (
  SELECT src, dst FROM e2
  UNION
  SELECT f.a, e.dst FROM fwd f JOIN e2 e ON f.b = e.src
),
mut AS (SELECT f1.a, f1.b FROM fwd f1 JOIN fwd f2 ON f1.a = f2.b AND f1.b = f2.a),
sccs AS MATERIALIZED (
  SELECT n.id, least(n.id, coalesce(min(m.b), n.id)) AS scc_id
  FROM nodes n LEFT JOIN mut m ON n.id = m.a
  GROUP BY n.id
),
giant AS (
  SELECT scc_id FROM (SELECT scc_id, count(*) AS sz FROM sccs GROUP BY scc_id)
  ORDER BY sz DESC, scc_id LIMIT 1
),
core AS MATERIALIZED (SELECT sccs.id FROM sccs, giant WHERE sccs.scc_id = giant.scc_id),
outr(node, hops) AS (
  SELECT id, 0 FROM core
  UNION
  SELECT e.dst, r.hops + 1 FROM outr r JOIN e2 e ON e.src = r.node
  WHERE r.hops < {_BOW_HOPS}
),
inr(node, hops) AS (
  SELECT id, 0 FROM core
  UNION
  SELECT e.src, r.hops + 1 FROM inr r JOIN e2 e ON e.dst = r.node
  WHERE r.hops < {_BOW_HOPS}
),
cls AS (
  SELECT n.id,
         CASE WHEN c.id IS NOT NULL THEN 'CORE'
              WHEN i.node IS NOT NULL AND o.node IS NOT NULL THEN 'TUBE'
              WHEN i.node IS NOT NULL THEN 'IN'
              WHEN o.node IS NOT NULL THEN 'OUT'
              ELSE 'DISC' END AS cls
  FROM nodes n
  LEFT JOIN core c ON c.id = n.id
  LEFT JOIN (SELECT DISTINCT node FROM inr) i ON i.node = n.id
  LEFT JOIN (SELECT DISTINCT node FROM outr) o ON o.node = n.id
), tot AS (SELECT cast(count(*) as bigint) AS n FROM nodes)
SELECT cls, cast(count(*) as bigint) AS n_nodes,
       cast(count(*) * 1000000 // any_value(tot.n) as bigint) AS share_q
FROM cls, tot GROUP BY cls
""",
)
def bowtie_structure_links(spark, sf_dir):
    """Broder bowtie decomposition of the crawl digraph — THE web-graph
    macro-structure census (the 1999 result that the web is a giant
    SCC with an IN slope feeding it, an OUT slope it feeds, tendrils
    and islands): the giant SCC from the distributed trim/color/sweep
    operator (scc_doc_links machinery), IN/OUT from two {_BOW_HOPS}-hop
    multi-source BFS waves (the isochrone primitive — forward over the
    edges and forward over the REVERSED edges; the hop bound is the
    documented truncation, like truncated DA), nodes on both slopes
    but outside the core class as TUBE, the rest DISC. Output is the
    5-class census with exact shares. Oracle replays with
    hop-bounded recursive CTEs over the method-independent closure."""
    from gipspark.operators.scc import strongly_connected_components
    from gipspark.operators.shortestpath import multi_source_hops

    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents").select(F.col("doc_id").cast("long").alias("id"))

    def h(tag):
        return D.md5_long(F.concat(F.lit(tag + ":"), F.col("id").cast("string")))

    fe = d.filter(F.col("id") < n - 1).select(
        F.col("id").alias("src"),
        F.least(F.col("id") + 1 + h("f") % 25, F.lit(n - 1).cast("long")).alias("dst"),
    )
    ge = d.filter((F.col("id") < n - 1) & (h("g") % 100 < 60)).select(
        F.col("id").alias("src"),
        F.least(F.col("id") + 1 + h("h") % 7, F.lit(n - 1).cast("long")).alias("dst"),
    )
    be = d.filter((F.col("id") > 0) & (h("k") % 100 < 45)).select(
        F.col("id").alias("src"),
        F.greatest(F.col("id") - 1 - h("b") % 40, F.lit(0).cast("long")).alias("dst"),
    )
    edges = (
        fe.unionByName(ge)
        .unionByName(be)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    comp = strongly_connected_components(d, edges)
    sizes = comp.groupBy("scc").agg(F.count("*").alias("sz"))
    giant = sizes.orderBy(F.col("sz").desc(), F.col("scc").asc()).limit(1).select("scc")
    core = comp.join(giant, "scc").select(F.col("node").alias("id")).localCheckpoint(eager=True)
    outr = multi_source_hops(core, edges, _BOW_HOPS).select(F.col("node").alias("id"))
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    inr = multi_source_hops(core, rev, _BOW_HOPS).select(F.col("node").alias("id"))
    cls = (
        d.join(core.withColumn("is_core", F.lit(1)), "id", "left")
        .join(inr.withColumn("is_in", F.lit(1)).distinct(), "id", "left")
        .join(outr.withColumn("is_out", F.lit(1)).distinct(), "id", "left")
        .select(
            F.when(F.col("is_core") == 1, "CORE")
            .when((F.col("is_in") == 1) & (F.col("is_out") == 1), "TUBE")
            .when(F.col("is_in") == 1, "IN")
            .when(F.col("is_out") == 1, "OUT")
            .otherwise("DISC")
            .alias("cls")
        )
    )
    tot = d.agg(F.count("*").cast("long").alias("n"))
    return (
        cls.crossJoin(F.broadcast(tot))
        .groupBy("cls")
        .agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.expr("(count(*) * 1000000) div any_value(n)").cast("long").alias("share_q"),
        )
    )



@register("attack_tolerance_links", _attack_oracle_sql())
def attack_tolerance_links(spark, sf_dir):
    """Attack-tolerance curve of the doc link graph (Albert-Barabasi):
    remove the top-k highest-degree hubs (k = 0, 2, 8; ties by id) and
    measure how the component structure degrades — component count and
    giant-component share. The robustness summary that separates
    scale-free fragility (hub removal shatters it) from random-graph
    resilience, and operationally: how badly does the crawl frontier
    fragment if the biggest hub hosts are blocked. Spark reruns the
    min-label connected_components operator (pointer-doubling rounds,
    operators/components.py) on each surviving edge set; the oracle
    replays reachability per k with a recursive closure. Scale shape:
    one degree agg, then per-k label propagation on equi-joins —
    removal is a semi-join, never a rescan of documents."""
    from gipspark.operators.components import connected_components

    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    j = spark.createDataFrame([(x,) for x in (0, 1, 2, 4, 5)], "j long")
    raw = docs.crossJoin(F.broadcast(j)).select(
        F.col("doc_id").alias("src"),
        (
            (
                F.col("doc_id")
                + 1
                + D.md5_long(
                    F.concat(
                        F.lit("t:"),
                        F.col("j").cast("string"),
                        F.lit(":"),
                        F.col("doc_id").cast("string"),
                    )
                )
                % 25
            )
            % n_docs
        ).alias("dst"),
    )
    und = (
        raw.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    ranked = deg.select(
        "id", F.row_number().over(Window.orderBy(F.col("deg").desc(), "id")).alias("rk")
    ).localCheckpoint()
    out = None
    for k in _ATTACK_KS:
        kept = ranked.filter(F.col("rk") > k).select("id")
        ue = (
            und.join(kept.withColumnRenamed("id", "a"), "a")
            .join(kept.withColumnRenamed("id", "b"), "b")
            .select("a", "b")
        )
        iso = kept.join(
            ue.select(F.col("a").alias("id"))
            .unionAll(ue.select(F.col("b").alias("id")))
            .distinct(),
            "id",
            "left_anti",
        )
        comp = connected_components(ue, a_col="a", b_col="b").unionAll(
            iso.select(F.col("id").alias("node"), F.col("id").alias("comp"))
        )
        st = comp.agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.countDistinct("comp").cast("long").alias("n_components"),
        )
        giant = (
            comp.groupBy("comp")
            .agg(F.count("*").alias("csz"))
            .agg(F.max("csz").cast("long").alias("giant_size"))
        )
        row = (
            st.crossJoin(F.broadcast(giant))
            .select(
                F.lit(k).alias("k_removed"),
                "n_nodes",
                "n_components",
                "giant_size",
                F.expr("(giant_size * 1000000) div n_nodes")
                .cast("long")
                .alias("giant_share_q"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("k_removed")



@register(
    "adamic_adar_links",
    f"""
WITH und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM (SELECT doc_id AS src, {_PR_EDGE_DST} % {_PR_N} AS dst
        FROM documents, (VALUES (0),(1),(2)) AS t(j))
  WHERE src <> dst
), adj AS (
  SELECT a AS u, b AS v FROM und UNION ALL SELECT b AS u, a AS v FROM und
), deg AS (
  SELECT u, cast(count(*) as bigint) AS d FROM adj GROUP BY u
), wedge AS (
  SELECT x.u AS a, y.u AS b, x.v AS w
  FROM adj x JOIN adj y ON x.v = y.v AND x.u < y.u
), sc AS (
  SELECT wg.a, wg.b,
         cast(count(*) as bigint) AS n_common,
         cast(sum(1000000 // (length(bin(dg.d)) - 1)) as bigint) AS aa_q
  FROM wedge wg JOIN deg dg ON wg.w = dg.u
  GROUP BY wg.a, wg.b
)
SELECT sc.a, sc.b, n_common, aa_q
FROM sc LEFT JOIN und ON sc.a = und.a AND sc.b = und.b
WHERE und.a IS NULL
ORDER BY aa_q DESC, sc.a, sc.b
LIMIT 100
""",
)
def adamic_adar_links(spark, sf_dir):
    """Adamic-Adar link prediction on the md5 doc link graph: score
    non-adjacent pairs by Sigma_z 1/log2(deg(z)) over common neighbors
    z — rare shared neighbors count more than hubs (the missing classic
    between link_prediction_jaccard's set overlap and resource_
    allocation's 1/deg). Documented deviation for exactness: the log
    is the FLOOR log2 via length(bin(deg))-1 (identical integer in
    both engines; ln() ulps are the repo-wide ban), each term is the
    floor tick 1e6 div floor_log2(deg), and deg(z) >= 2 for any shared
    neighbor so the divisor is never 0. Wedge join costs Sigma deg^2
    shuffle rows (constant out-degree 3), anti join removes existing
    edges, top-100 under a total (score, a, b) order. Scale shape:
    same as the jaccard sibling — never |V|^2."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    raw = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    D.md5_long(F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))) % n
                    for j in range(3)
                ]
            )
        ).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    und = raw.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    adj = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = adj.groupBy("u").agg(F.count("*").cast("long").alias("d"))
    x = adj.select(F.col("u").alias("a"), F.col("v").alias("w"))
    y = adj.select(F.col("u").alias("b"), F.col("v").alias("w"))
    wedge = x.join(y, "w").filter(F.col("a") < F.col("b"))
    sc = (
        wedge.join(deg.select(F.col("u").alias("w"), "d"), "w")
        .groupBy("a", "b")
        .agg(
            F.count("*").cast("long").alias("n_common"),
            F.sum(F.expr("1000000 div (length(bin(d)) - 1)"))
            .cast("long")
            .alias("aa_q"),
        )
    )
    return (
        sc.join(und, ["a", "b"], "anti")
        .orderBy(F.col("aa_q").desc(), "a", "b")
        .limit(100)
    )



@register(
    "preferential_attachment_links",
    f"""
WITH und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM (SELECT doc_id AS src, {_PR_EDGE_DST} % {_PR_N} AS dst
        FROM documents, (VALUES (0),(1),(2)) AS t(j))
  WHERE src <> dst
), adj AS (
  SELECT a AS u, b AS v FROM und UNION ALL SELECT b AS u, a AS v FROM und
), deg AS (
  SELECT u, cast(count(*) as bigint) AS d FROM adj GROUP BY u
), cand AS (
  SELECT DISTINCT x.u AS a, y.u AS b
  FROM adj x JOIN adj y ON x.v = y.v AND x.u < y.u
), sc AS (
  SELECT c.a, c.b, da.d AS deg_a, db.d AS deg_b, da.d * db.d AS pa_score
  FROM cand c JOIN deg da ON c.a = da.u JOIN deg db ON c.b = db.u
)
SELECT sc.a, sc.b, deg_a, deg_b, pa_score
FROM sc LEFT JOIN und ON sc.a = und.a AND sc.b = und.b
WHERE und.a IS NULL
ORDER BY pa_score DESC, sc.a, sc.b
LIMIT 100
""",
)
def preferential_attachment_links(spark, sf_dir):
    """Preferential-attachment link prediction on the md5 doc link
    graph: score non-adjacent 2-hop pairs by deg(a)·deg(b) — the
    rich-get-richer baseline that completes the classic quartet
    (common-neighbor Jaccard, Adamic-Adar, resource allocation, PA).
    Pure integer product, no ticks needed. Candidates are restricted
    to wedge-sharing pairs (the standard evaluation set, and the only
    set producible without |V|² work); the anti join removes existing
    edges; top-100 under the total (score, a, b) order. Scale shape:
    Σdeg² wedge join on a constant-out-degree-3 graph."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    raw = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    D.md5_long(F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))) % n
                    for j in range(3)
                ]
            )
        ).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    und = raw.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    adj = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = adj.groupBy("u").agg(F.count("*").cast("long").alias("d"))
    x = adj.select(F.col("u").alias("a"), F.col("v").alias("w"))
    y = adj.select(F.col("u").alias("b"), F.col("v").alias("w"))
    cand = x.join(y, "w").filter(F.col("a") < F.col("b")).select("a", "b").distinct()
    sc = (
        cand.join(deg.select(F.col("u").alias("a"), F.col("d").alias("deg_a")), "a")
        .join(deg.select(F.col("u").alias("b"), F.col("d").alias("deg_b")), "b")
        .select(
            "a", "b", "deg_a", "deg_b", (F.col("deg_a") * F.col("deg_b")).alias("pa_score")
        )
    )
    return (
        sc.join(und, ["a", "b"], "anti")
        .orderBy(F.col("pa_score").desc(), "a", "b")
        .limit(100)
    )



@register(
    "salsa_scores_links",
    f"""
WITH nodes AS (SELECT doc_id AS id FROM documents),
edges AS (
  SELECT doc_id AS src, {_PR_EDGE_DST} % {_PR_N} AS dst
  FROM documents, (VALUES (0),(1),(2)) AS t(j)
),
outd AS (SELECT src, cast(count(*) as bigint) AS outdeg FROM edges GROUP BY src),
ind AS (SELECT dst, cast(count(*) as bigint) AS indeg FROM edges GROUP BY dst),
a0 AS (SELECT id, 1000000000000 // {_PR_N} AS a FROM nodes),
h1 AS (SELECT e.src, cast(sum(a0.a // ind.indeg) as bigint) AS h
       FROM edges e JOIN a0 ON e.dst = a0.id JOIN ind ON e.dst = ind.dst GROUP BY e.src),
a1 AS (SELECT e.dst AS id, cast(sum(h1.h // outd.outdeg) as bigint) AS a
       FROM edges e JOIN h1 ON e.src = h1.src JOIN outd ON e.src = outd.src GROUP BY e.dst),
h2 AS (SELECT e.src, cast(sum(a1.a // ind.indeg) as bigint) AS h
       FROM edges e JOIN a1 ON e.dst = a1.id JOIN ind ON e.dst = ind.dst GROUP BY e.src),
a2 AS (SELECT e.dst AS id, cast(sum(h2.h // outd.outdeg) as bigint) AS a
       FROM edges e JOIN h2 ON e.src = h2.src JOIN outd ON e.src = outd.src GROUP BY e.dst)
SELECT n.id, cast(coalesce(a2.a, 0) as bigint) AS authority_ticks,
       cast(coalesce(ind.indeg, 0) as bigint) AS indeg
FROM nodes n LEFT JOIN a2 ON n.id = a2.id LEFT JOIN ind ON n.id = ind.dst
ORDER BY n.id
""",
)
def salsa_scores_links(spark, sf_dir):
    """SALSA authority scores (Lempel-Moran): the HITS cousin whose
    mutual-reinforcement walk is DEGREE-NORMALIZED — one backward step
    spreading authority over in-links (÷indeg) and one forward step
    over out-links (÷outdeg) per round, two rounds unrolled, on the
    same md5-derived 3-out-degree doc graph as pagerank_doc_links.
    Mass lives in integer ticks with floor division (losses identical
    both engines), so the oracle replaying the rounds is bit-exact —
    contrast hits_hub_auth_links, whose un-normalized powers need a
    different fixed-point contract. Scale shape per round: two
    edge-keyed hash joins + two hash aggs — shuffle ∝ edges, the
    standard distributed topic-distillation shape."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    nodes = d.select(F.col("doc_id").alias("id"))
    edges = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    D.md5_long(
                        F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))
                    )
                    % n
                    for j in range(3)
                ]
            )
        ).alias("dst"),
    )
    outd = edges.groupBy("src").agg(F.count("*").cast("long").alias("outdeg"))
    ind = edges.groupBy("dst").agg(F.count("*").cast("long").alias("indeg"))
    a = nodes.select("id", F.lit(1000000000000 // n).cast("long").alias("a"))
    for _ in range(2):
        h = (
            edges.join(a.withColumnRenamed("id", "dst"), "dst")
            .join(ind, "dst")
            .select("src", F.expr("a div indeg").alias("contrib"))
            .groupBy("src")
            .agg(F.sum("contrib").cast("long").alias("h"))
        )
        a = (
            edges.join(h, "src")
            .join(outd, "src")
            .select(F.col("dst").alias("id"), F.expr("h div outdeg").alias("contrib"))
            .groupBy("id")
            .agg(F.sum("contrib").cast("long").alias("a"))
        )
    return (
        nodes.join(a, "id", "left")
        .join(ind.withColumnRenamed("dst", "id"), "id", "left")
        .select(
            "id",
            F.coalesce(F.col("a"), F.lit(0)).cast("long").alias("authority_ticks"),
            F.coalesce(F.col("indeg"), F.lit(0)).cast("long").alias("indeg"),
        )
        .orderBy("id")
    )



@register(
    "ball_growth_profile_links",
    f"""
WITH RECURSIVE edges AS (
  SELECT doc_id AS src, {_PR_EDGE_DST} % {_PR_N} AS dst
  FROM documents, (VALUES (0),(1),(2)) AS t(j)
), reach(seed, node, d) AS (
  SELECT doc_id, doc_id, 0 FROM documents WHERE doc_id < {_BALL_SEEDS}
  UNION
  SELECT r.seed, e.dst, r.d + 1
  FROM reach r JOIN edges e ON r.node = e.src
  WHERE r.d < {_BALL_HOPS}
), best AS (
  SELECT seed, node, min(d) AS d FROM reach GROUP BY seed, node
)
SELECT seed,
       cast(count(*) FILTER (WHERE d <= 1 AND d > 0) as bigint) AS n_h1,
       cast(count(*) FILTER (WHERE d <= 2 AND d > 0) as bigint) AS n_h2,
       cast(count(*) FILTER (WHERE d <= 3 AND d > 0) as bigint) AS n_h3,
       cast(count(*) FILTER (WHERE d <= 4 AND d > 0) as bigint) AS n_h4
FROM best GROUP BY seed ORDER BY seed
""",
)
def ball_growth_profile_links(spark, sf_dir):
    """Ball-growth profile (hop-h reachable-set sizes, h = 1..4) per
    seed on the md5-derived doc link graph — the expansion curve that
    diagnoses whether a crawl graph is an expander (near-3^h growth)
    or collapses into a tight community (flat curve), and the raw
    input to effective-diameter estimates. Spark runs {_BALL_HOPS}
    unrolled frontier expansions with a (seed, node) min-dist dedup
    each round — the exact-BFS shape of khop_cheapest but counting
    the VOLUME of each shell rather than a path cost; the seed column
    rides along so all balls grow in the same jobs. Counts exclude
    the seed itself. Scale shape per round: one edge equi-join + one
    dedup agg, frontier ∝ Σ ball sizes, never nodes×nodes."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    edges = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    D.md5_long(
                        F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))
                    )
                    % n
                    for j in range(3)
                ]
            )
        ).alias("dst"),
    )
    reach = d.filter(F.col("doc_id") < _BALL_SEEDS).select(
        F.col("doc_id").alias("seed"),
        F.col("doc_id").alias("node"),
        F.lit(0).alias("d"),
    )
    for _ in range(_BALL_HOPS):
        nxt = (
            reach.join(edges, reach["node"] == edges["src"])
            .select("seed", F.col("dst").alias("node"), (F.col("d") + 1).alias("d"))
        )
        reach = (
            reach.unionByName(nxt)
            .groupBy("seed", "node")
            .agg(F.min("d").alias("d"))
        )
    shell = lambda h: F.count(  # noqa: E731 — tiny local agg builder
        F.when((F.col("d") <= h) & (F.col("d") > 0), 1)
    ).cast("long")
    return (
        reach.groupBy("seed")
        .agg(
            shell(1).alias("n_h1"),
            shell(2).alias("n_h2"),
            shell(3).alias("n_h3"),
            shell(4).alias("n_h4"),
        )
        .orderBy("seed")
    )



@register(
    "participation_coeff_links",
    f"""
WITH edges AS (
  SELECT doc_id AS src, {_PR_EDGE_DST} % {_PR_N} AS dst
  FROM documents, (VALUES (0),(1),(2)) AS t(j)
), attributed AS (
  SELECT e.src, d.source AS comm FROM edges e JOIN documents d ON e.dst = d.doc_id
), per_comm AS (
  SELECT src, comm, cast(count(*) as bigint) AS k_is FROM attributed GROUP BY src, comm
), per_node AS (
  SELECT src, cast(sum(k_is) as bigint) AS k_i,
         cast(count(*) as bigint) AS n_comms,
         cast(sum(k_is * k_is) as bigint) AS sum_sq
  FROM per_comm GROUP BY src
)
SELECT src AS id, k_i AS outdeg, n_comms,
       cast((k_i * k_i - sum_sq) * 1000000 // (k_i * k_i) as bigint) AS p_micro
FROM per_node ORDER BY id
""",
)
def participation_coeff_links(spark, sf_dir):
    """Guimerà-Amaral participation coefficient per node: P_i = 1 −
    Σ_s (k_is/k_i)² where communities are the SOURCE attribute of the
    linked docs — does a page's outlink mass stay inside one community
    (P→0) or spread across many (P→1)? The complement of
    modularity_by_source (which scores the partition) — this scores
    each NODE's role in it, the classic hub-taxonomy axis. Exact:
    P_micro = (k_i² − Σk_is²)·10⁶ // k_i², pure integer. Scale shape:
    one edge-to-attribute hash join (docs dim on the dst key) + two
    hash aggs — shuffle ∝ edges."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    edges = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    D.md5_long(
                        F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))
                    )
                    % n
                    for j in range(3)
                ]
            )
        ).alias("dst"),
    )
    attributed = edges.join(
        d.select(F.col("doc_id").alias("dst"), F.col("source").alias("comm")), "dst"
    )
    per_comm = attributed.groupBy("src", "comm").agg(
        F.count("*").cast("long").alias("k_is")
    )
    per_node = per_comm.groupBy("src").agg(
        F.sum("k_is").cast("long").alias("k_i"),
        F.count("*").cast("long").alias("n_comms"),
        F.sum(F.col("k_is") * F.col("k_is")).cast("long").alias("sum_sq"),
    )
    return per_node.select(
        F.col("src").alias("id"),
        F.col("k_i").alias("outdeg"),
        "n_comms",
        F.expr(
            "cast((k_i * k_i - sum_sq) * 1000000 div (k_i * k_i) as bigint)"
        ).alias("p_micro"),
    ).orderBy("id")



@register(
    "katz_centrality_links",
    f"""
WITH edges AS (
  SELECT doc_id AS src, {_PR_EDGE_DST} % {_PR_N} AS dst
  FROM documents, (VALUES (0),(1),(2)) AS t(j)
), nodes AS (SELECT doc_id AS id FROM documents),
k1 AS (SELECT dst AS id, cast(sum(1000000000 // 2) as bigint) AS v
       FROM edges GROUP BY dst),
k2 AS (SELECT e.dst AS id, cast(sum(k1.v // 2) as bigint) AS v
       FROM edges e JOIN k1 ON e.src = k1.id GROUP BY e.dst),
k3 AS (SELECT e.dst AS id, cast(sum(k2.v // 2) as bigint) AS v
       FROM edges e JOIN k2 ON e.src = k2.id GROUP BY e.dst)
SELECT n.id,
       cast(coalesce(k1.v, 0) + coalesce(k2.v, 0) + coalesce(k3.v, 0) as bigint) AS katz_ticks,
       cast(coalesce(k1.v, 0) as bigint) AS walk1_ticks,
       cast(coalesce(k2.v, 0) as bigint) AS walk2_ticks,
       cast(coalesce(k3.v, 0) as bigint) AS walk3_ticks
FROM nodes n
LEFT JOIN k1 ON n.id = k1.id LEFT JOIN k2 ON n.id = k2.id LEFT JOIN k3 ON n.id = k3.id
ORDER BY n.id
""",
)
def katz_centrality_links(spark, sf_dir):
    """Katz centrality, truncated at walk length 3 with attenuation
    β = 1/2: katz(i) = Σ_k β^k · (#walks of length k ending at i) —
    the "credit distant endorsements, but geometrically less" axis
    between raw indegree (k=1 only) and eigen_centrality_links (the
    k→∞ limit). β = 1/2 makes every attenuation an integer halving of
    giga-ticks (floor losses identical both engines), so three
    unrolled sparse mat-vec rounds stay pure bigint; the per-length
    contributions are exposed so the attenuation choice is auditable.
    Scale shape per round: one edge equi-join + one hash agg —
    shuffle ∝ edges, the pagerank_int shape without the dangling-mass
    term."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    nodes = d.select(F.col("doc_id").alias("id"))
    edges = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    D.md5_long(
                        F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))
                    )
                    % n
                    for j in range(3)
                ]
            )
        ).alias("dst"),
    )
    k1 = edges.groupBy(F.col("dst").alias("id")).agg(
        F.sum(F.lit(1000000000 // 2)).cast("long").alias("v1")
    )
    k2 = (
        edges.join(k1.withColumnRenamed("id", "src"), "src")
        .groupBy(F.col("dst").alias("id"))
        .agg(F.sum(F.expr("v1 div 2")).cast("long").alias("v2"))
    )
    k3 = (
        edges.join(k2.withColumnRenamed("id", "src"), "src")
        .groupBy(F.col("dst").alias("id"))
        .agg(F.sum(F.expr("v2 div 2")).cast("long").alias("v3"))
    )
    return (
        nodes.join(k1, "id", "left")
        .join(k2, "id", "left")
        .join(k3, "id", "left")
        .select(
            "id",
            (
                F.coalesce("v1", F.lit(0))
                + F.coalesce("v2", F.lit(0))
                + F.coalesce("v3", F.lit(0))
            )
            .cast("long")
            .alias("katz_ticks"),
            F.coalesce("v1", F.lit(0)).cast("long").alias("walk1_ticks"),
            F.coalesce("v2", F.lit(0)).cast("long").alias("walk2_ticks"),
            F.coalesce("v3", F.lit(0)).cast("long").alias("walk3_ticks"),
        )
        .orderBy("id")
    )



@register(
    "widest_path_links",
    f"""
WITH RECURSIVE edges AS (
  SELECT doc_id AS src, {_PR_EDGE_DST} % {_PR_N} AS dst,
         cast(({D.MD5_LONG_SQL.format(x="concat('w:', cast(j as varchar), ':', cast(doc_id as varchar))")}) % 100 + 1 as bigint) AS w
  FROM documents, (VALUES (0),(1),(2)) AS t(j)
), reach(seed, node, cap, d) AS (
  SELECT doc_id, doc_id, cast(1000000000 as bigint), 0
  FROM documents WHERE doc_id < {_WIDEST_SEEDS}
  UNION
  SELECT r.seed, e.dst, least(r.cap, e.w), r.d + 1
  FROM reach r JOIN edges e ON r.node = e.src
  WHERE r.d < {_WIDEST_HOPS}
)
SELECT seed, node, cast(max(cap) as bigint) AS widest_cap
FROM reach WHERE node != seed GROUP BY seed, node
ORDER BY seed, node
""",
)
def widest_path_links(spark, sf_dir):
    """Widest-path (maximin bottleneck capacity) from {_WIDEST_SEEDS}
    seeds, {_WIDEST_HOPS} relaxation rounds, on the md5 link graph
    with md5-derived edge capacities 1..100 — the max-min SEMIRING
    twin of khop_cheapest_doc_links (min-plus): same unrolled
    relax-join-aggregate skeleton, different (⊕,⊗) = (max, min), which
    is the routing/bandwidth question "what's the fattest pipe to
    every node". Pure integer capacities, so max(min(...)) folds are
    exact and order-free. Scale shape per round: one edge equi-join +
    one (seed, node) hash agg — frontier ∝ Σ ball sizes."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    edges = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (
                            D.md5_long(
                                F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))
                            )
                            % n
                        ).alias("dst"),
                        (
                            D.md5_long(
                                F.concat(F.lit(f"w:{j}:"), F.col("doc_id").cast("string"))
                            )
                            % 100
                            + 1
                        )
                        .cast("long")
                        .alias("w"),
                    )
                    for j in range(3)
                ]
            )
        ).alias("e"),
    ).select("src", F.col("e.dst").alias("dst"), F.col("e.w").alias("w"))
    reach = d.filter(F.col("doc_id") < _WIDEST_SEEDS).select(
        F.col("doc_id").alias("seed"),
        F.col("doc_id").alias("node"),
        F.lit(1000000000).cast("long").alias("cap"),
    )
    for _ in range(_WIDEST_HOPS):
        nxt = reach.join(edges, reach["node"] == edges["src"]).select(
            "seed",
            F.col("dst").alias("node"),
            F.least(F.col("cap"), F.col("w")).alias("cap"),
        )
        reach = (
            reach.unionByName(nxt)
            .groupBy("seed", "node")
            .agg(F.max("cap").alias("cap"))
        )
    return (
        reach.filter(F.col("node") != F.col("seed"))
        .select("seed", "node", F.col("cap").cast("long").alias("widest_cap"))
        .orderBy("seed", "node")
    )



@register(
    "degree_centralization_links",
    f"""
WITH edges AS (
  SELECT doc_id AS src, {_PR_EDGE_DST} % {_PR_N} AS dst
  FROM documents, (VALUES (0),(1),(2)) AS t(j)
), deg AS (
  SELECT d.doc_id AS id, cast(coalesce(cnt, 0) as bigint) AS indeg
  FROM documents d LEFT JOIN (
    SELECT dst, count(*) AS cnt FROM edges GROUP BY dst
  ) e ON d.doc_id = e.dst
)
SELECT cast(count(*) as bigint) AS n_nodes,
       cast(max(indeg) as bigint) AS max_indeg,
       cast(sum(indeg) as bigint) AS sum_indeg,
       cast(count(*) * max(indeg) - sum(indeg) as bigint) AS central_num,
       cast((count(*) - 1) * (count(*) - 2) as bigint) AS central_den,
       cast(count(*) * max(indeg) - sum(indeg) as double)
         / cast((count(*) - 1) * (count(*) - 2) as double) AS centralization
FROM deg
""",
)
def degree_centralization_links(spark, sf_dir):
    """Freeman degree centralization of the link graph: Σ(d_max − d_i)
    normalized by the star graph's maximum (n−1)(n−2) — the ONE-NUMBER
    "is this a hub-and-spoke web or an egalitarian mesh" summary that
    the per-node centrality tables (katz, eigen, harmonic) don't
    collapse to. The numerator folds to n·d_max − Σd without a
    second pass; everything integer, the index one exact division.
    Scale shape: one indeg hash agg + one 1-row fold — shuffle ∝
    edges once."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    edges = d.select(
        F.explode(
            F.array(
                *[
                    D.md5_long(
                        F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))
                    )
                    % n
                    for j in range(3)
                ]
            )
        ).alias("dst"),
    )
    indeg = edges.groupBy("dst").agg(F.count("*").alias("cnt"))
    deg = (
        d.select(F.col("doc_id").alias("dst"))
        .join(indeg, "dst", "left")
        .select(F.coalesce("cnt", F.lit(0)).cast("long").alias("indeg"))
    )
    num = (F.count("*") * F.max("indeg") - F.sum("indeg")).cast("long")
    den = ((F.count("*") - 1) * (F.count("*") - 2)).cast("long")
    return deg.agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.max("indeg").cast("long").alias("max_indeg"),
        F.sum("indeg").cast("long").alias("sum_indeg"),
        num.alias("central_num"),
        den.alias("central_den"),
        (num.cast("double") / den.cast("double")).alias("centralization"),
    )



@register(
    "friendship_paradox_links",
    f"""
WITH edges AS (
  SELECT doc_id AS src, {_PR_EDGE_DST} % {_PR_N} AS dst
  FROM documents, (VALUES (0),(1),(2)) AS t(j)
), indeg AS (
  SELECT d.doc_id AS id, cast(coalesce(e.cnt, 0) as bigint) AS k
  FROM documents d LEFT JOIN (SELECT dst, count(*) AS cnt FROM edges GROUP BY dst) e
    ON d.doc_id = e.dst
), node_side AS (
  SELECT cast(count(*) as bigint) AS n, cast(sum(k) as bigint) AS sum_k,
         cast(sum(k * k) as bigint) AS sum_k_sq
  FROM indeg
), edge_side AS (
  SELECT cast(count(*) as bigint) AS m, cast(sum(i.k) as bigint) AS sum_end_k
  FROM edges e JOIN indeg i ON e.dst = i.id
)
SELECT n.n AS n_nodes, e.m AS n_edges, n.sum_k, n.sum_k_sq, e.sum_end_k,
       cast(e.sum_end_k * n.n * 1000000 // (e.m * n.sum_k) as bigint) AS paradox_ratio_micro
FROM node_side n, edge_side e
""",
)
def friendship_paradox_links(spark, sf_dir):
    """Friendship-paradox audit: the mean in-degree of link ENDPOINTS
    (a doc sampled by following a random link) vs the mean in-degree
    of a random doc — the ratio E_edge[k]/E_node[k] = (Σk²/Σk)/(Σk/n)
    in exact cross-multiplied micro. A ratio far above 10⁶ quantifies
    how much any link-following crawler oversamples hubs — the bias
    correction every crawl-frontier popularity estimate needs, and
    identically the variance-to-mean identity behind degree-based
    sampling designs. Integer moments only. Scale shape: one indeg
    hash agg + one edge-keyed join + two 1-row folds."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    edges = d.select(
        F.explode(
            F.array(
                *[
                    D.md5_long(
                        F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))
                    )
                    % n
                    for j in range(3)
                ]
            )
        ).alias("dst"),
    )
    cnt = edges.groupBy("dst").agg(F.count("*").alias("cnt"))
    indeg = (
        d.select(F.col("doc_id").alias("dst"))
        .join(cnt, "dst", "left")
        .select(F.col("dst").alias("id"), F.coalesce("cnt", F.lit(0)).cast("long").alias("k"))
    )
    node_side = indeg.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("k").cast("long").alias("sum_k"),
        F.sum(F.col("k") * F.col("k")).cast("long").alias("sum_k_sq"),
    )
    edge_side = (
        edges.join(indeg.withColumnRenamed("id", "dst"), "dst")
        .agg(
            F.count("*").cast("long").alias("m"),
            F.sum("k").cast("long").alias("sum_end_k"),
        )
    )
    return (
        node_side.crossJoin(F.broadcast(edge_side))
        .select(
            F.col("n").alias("n_nodes"),
            F.col("m").alias("n_edges"),
            "sum_k",
            "sum_k_sq",
            "sum_end_k",
            F.expr(
                "cast(sum_end_k * n * 1000000 div (m * sum_k) as bigint)"
            ).alias("paradox_ratio_micro"),
        )
    )



@register(
    "degree_ccdf_doubling_links",
    f"""
WITH edges AS (
  SELECT doc_id AS src, {_PR_EDGE_DST} % {_PR_N} AS dst
  FROM documents, (VALUES (0),(1),(2)) AS t(j)
), indeg AS (
  SELECT d.doc_id AS id, cast(coalesce(e.cnt, 0) as bigint) AS k
  FROM documents d LEFT JOIN (SELECT dst, count(*) AS cnt FROM edges GROUP BY dst) e
    ON d.doc_id = e.dst
), ks(kk) AS (VALUES (1),(2),(4),(8)),
ccdf AS (
  SELECT ks.kk, cast(count(*) FILTER (WHERE i.k >= ks.kk) as bigint) AS n_ge,
         cast(count(*) FILTER (WHERE i.k >= 2 * ks.kk) as bigint) AS n_ge2
  FROM indeg i CROSS JOIN ks GROUP BY ks.kk
)
SELECT cast(kk as bigint) AS k, n_ge, n_ge2,
       cast(n_ge2 * 1000000 // greatest(n_ge, 1) as bigint) AS doubling_micro
FROM ccdf ORDER BY k
""",
)
def degree_ccdf_doubling_links(spark, sf_dir):
    """Log-free tail-heaviness of the in-degree distribution: the
    CCDF doubling ratio P(K≥2k)/P(K≥k) at k = 1, 2, 4, 8 — constant
    across k for a power law (and equal to 2^−α, so α is recoverable
    from the ratio without ever calling ln on data), decaying for an
    exponential/Poisson tail. The zipf_doubling_slope trick applied to
    GRAPH degrees — the crawl-planning question "how hubby is this
    web" answered with four exact micro ratios. Scale shape: one
    indeg hash agg + a 4-value literal threshold dim + one fold."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    edges = d.select(
        F.explode(
            F.array(
                *[
                    D.md5_long(
                        F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))
                    )
                    % n
                    for j in range(3)
                ]
            )
        ).alias("dst"),
    )
    cnt = edges.groupBy("dst").agg(F.count("*").alias("cnt"))
    indeg = (
        d.select(F.col("doc_id").alias("dst"))
        .join(cnt, "dst", "left")
        .select(F.coalesce("cnt", F.lit(0)).cast("long").alias("k"))
    )
    ks = indeg.select(
        "k", F.explode(F.array(*[F.lit(x) for x in (1, 2, 4, 8)])).alias("kk")
    )
    ccdf = ks.groupBy("kk").agg(
        F.count(F.when(F.col("k") >= F.col("kk"), 1)).cast("long").alias("n_ge"),
        F.count(F.when(F.col("k") >= 2 * F.col("kk"), 1)).cast("long").alias("n_ge2"),
    )
    return ccdf.select(
        F.col("kk").cast("long").alias("k"),
        "n_ge",
        "n_ge2",
        F.expr("cast(n_ge2 * 1000000 div greatest(n_ge, 1) as bigint)").alias(
            "doubling_micro"
        ),
    ).orderBy("k")



@register(
    "region_adjacency_pairs",
    f"""
WITH RECURSIVE pts AS (
  SELECT {_LAT.format(k='c_custkey')} AS lat, {_LON.format(k='c_custkey')} AS lon
  FROM customer
), cells AS (
  SELECT cast(floor((lon + 180.0) / {{_SHAPE_GRID}}) as int) AS gx,
         cast(floor((90.0 - lat) / {{_SHAPE_GRID}}) as int) AS gy
  FROM pts GROUP BY gx, gy
), ids AS (
  SELECT gx, gy, cast(gx as bigint) * 1000 + gy AS id FROM cells
), pairs AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM ids a JOIN ids b ON (abs(a.gx - b.gx) + abs(a.gy - b.gy)) = 1 AND a.id < b.id
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b AS src, id_a AS dst FROM pairs
), reach(node, r) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT re.node, e.dst FROM reach re JOIN edges e ON re.r = e.src
  WHERE e.dst <> re.node
), lbl AS (
  SELECT node AS id, least(node, min(r)) AS region_id FROM reach GROUP BY node
), full_lbl AS (
  SELECT i.gx, i.gy, coalesce(l.region_id, i.id) AS region_id
  FROM ids i LEFT JOIN lbl l ON l.id = i.id
), contacts AS (
  SELECT a.region_id AS region_a, b.region_id AS region_b,
         cast(count(*) as bigint) AS n_contacts
  FROM full_lbl a JOIN full_lbl b
    ON abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1
   AND NOT (a.gx = b.gx AND a.gy = b.gy)
   AND a.region_id < b.region_id
  GROUP BY a.region_id, b.region_id
)
SELECT region_a, region_b, n_contacts FROM contacts ORDER BY region_a, region_b
""".replace("{_SHAPE_GRID}", str(_SHAPE_GRID)),
)
def region_adjacency_pairs(spark, sf_dir):
    """Region adjacency graph: pairs of DISTINCT rook-components whose
    cells touch under queen adjacency, with the contact count (shared
    frontier length proxy) — the dual graph that turns the patch
    mosaic into a network: which clusters would merge first under
    dilation, where the corridors are, the input to any
    merge-threshold sweep over the region family (shape, orientation,
    and now topology). Rook components never touch under ROOK moves
    by definition — the queen probe is exactly the diagonal seam
    detector. Scale shape: the same bounded component labeling, then
    one 8-offset-style lattice self-equi-join re-keyed by label."""
    from gipspark.operators.components import connected_components
    from gipspark.operators.morans import ROOK_OFFSETS, cell_counts

    pts = load(spark, sf_dir, "customer").select(
        C.derived_lat(F.col("c_custkey")).alias("lat"),
        C.derived_lon(F.col("c_custkey")).alias("lon"),
    )
    ids = cell_counts(pts, _SHAPE_GRID).select(
        "gx", "gy", (F.col("gx").cast("long") * 1000 + F.col("gy")).alias("id")
    )
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in ROOK_OFFSETS
        ]
    )
    nb = ids.select("id", "gx", "gy", F.explode(offs).alias("o")).select(
        "id",
        (F.col("gx") + F.col("o.dx")).alias("ngx"),
        (F.col("gy") + F.col("o.dy")).alias("ngy"),
    )
    occ = ids.select(
        F.col("gx").alias("ngx"), F.col("gy").alias("ngy"), F.col("id").alias("nid")
    )
    rook_pairs = nb.join(occ, ["ngx", "ngy"]).filter(
        F.col("id") < F.col("nid")
    ).select(F.col("id").alias("id_a"), F.col("nid").alias("id_b"))
    lbl = connected_components(rook_pairs).select(
        F.col("node").alias("id"), F.col("comp").alias("comp")
    )
    labeled = ids.join(lbl, "id", "left").select(
        "gx", "gy", F.coalesce("comp", "id").alias("region_id")
    )
    qoffs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if not (dx == 0 and dy == 0)
        ]
    )
    probes = labeled.select(
        "region_id", F.explode(qoffs).alias("o"), "gx", "gy"
    ).select(
        F.col("region_id").alias("region_a"),
        (F.col("gx") + F.col("o.dx")).alias("ngx"),
        (F.col("gy") + F.col("o.dy")).alias("ngy"),
    )
    tgt = labeled.select(
        F.col("gx").alias("ngx"),
        F.col("gy").alias("ngy"),
        F.col("region_id").alias("region_b"),
    )
    return (
        probes.join(tgt, ["ngx", "ngy"])
        .filter(F.col("region_a") < F.col("region_b"))
        .groupBy("region_a", "region_b")
        .agg(F.count("*").cast("long").alias("n_contacts"))
        .orderBy("region_a", "region_b")
    )



@register("ktruss_links", _ktruss_oracle_sql())
def ktruss_links(spark, sf_dir):
    """Bounded k-truss peeling (k={_KT_K}, the cohesion tier above
    k-core: every surviving edge sits in >= k-2 triangles among
    survivors) over a deterministic local-band doc link graph — the
    community-backbone extractor that k-core can't give (a star hub
    survives the core but owns zero triangles, so the truss drops it).
    Peeling reuses the degree-ordered triangle enumeration
    (operators/graph.ktruss): each round is one O(sqrt(m))-bounded
    wedge self-join + closing join + edge hash-agg, lineage cut
    between rounds; the oracle unrolls the same peels. Scale shape:
    shuffle ∝ wedges per round, never quadratic in a hub degree."""
    from gipspark.operators.graph import ktruss, undirect

    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    raw = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    (
                        F.col("doc_id")
                        + 1
                        + D.md5_long(
                            F.concat(F.lit(f"kt:{j}:"), F.col("doc_id").cast("string"))
                        )
                        % 18
                    )
                    % n
                    for j in range(6)
                ]
            )
        ).alias("dst"),
    )
    return ktruss(undirect(raw), k=_KT_K, rounds=_KT_ROUNDS).orderBy("a", "b")



@register("trustrank_spam_mass_links", _trustrank_oracle_sql())
def trustrank_spam_mass_links(spark, sf_dir):
    """TrustRank + spam mass (Gyongyi et al.) over the pagerank doc
    link graph: a second PageRank whose teleport vector is pinned to a
    deterministic trusted seed set (doc_id % 16 == 0), so trust decays
    with link distance from the seeds; spam_mass_micro = the clamped
    share of a page's PageRank NOT backed by trust — the canonical
    web-spam demotion signal (link farms rank high on raw mass but
    collect no seeded trust). Both walks are integer mass ticks with
    floor-division damping (operators/pagerank.trustrank_int), so the
    unrolled oracle hashes bit-identically. Scale shape: 3 rounds x
    (one contrib shuffle + one node join) per walk — exactly two
    pageranks, nothing more."""
    from gipspark.operators.pagerank import pagerank_int, trustrank_int

    n = table_rows(sf_dir, "documents")
    n_seeds = (n + 15) // 16
    d = load(spark, sf_dir, "documents")
    nodes = d.select(
        F.col("doc_id").alias("id"),
        (F.col("doc_id") % 16 == 0).cast("int").alias("is_seed"),
    )
    edges = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    D.md5_long(
                        F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))
                    )
                    % n
                    for j in range(3)
                ]
            )
        ).alias("dst"),
    )
    pr = pagerank_int(nodes.select("id"), edges, n_nodes=n, iters=3)
    tr = trustrank_int(nodes, edges, n_seeds=n_seeds, iters=3)
    return (
        pr.join(tr, "id")
        .select(
            "id",
            "rank",
            "trust",
            F.expr(
                "cast((greatest(rank - trust, 0L) * 1000000L) div rank as bigint)"
            ).alias("spam_mass_micro"),
        )
        .orderBy("id")
    )



@register("edge_percolation_links", _percolation_oracle_sql())
def edge_percolation_links(spark, sf_dir):
    """Random-failure percolation curve — the robustness twin of
    attack_tolerance_links (which removes TOP-degree hubs; this
    removes edges by an md5 coin at 20%/50%/80% retention): per
    retention level, surviving edges, component count, and the giant
    component's share of all nodes — the curve whose sudden collapse
    locates the percolation threshold, i.e. how much RANDOM link rot
    the crawl graph absorbs before discovery fragments (scale-free
    graphs famously shrug off random failure yet crumble under
    attack — these two registry ops measure exactly that contrast on
    the same corpus). Components via the min-label fixpoint
    (operators/components.py, pointer-doubled) against the oracle's
    recursive closure; isolated nodes count as singletons. Three
    bounded component runs on the band-graph dim."""
    from gipspark.operators.components import connected_components

    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    base = (
        d.select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.array(
                    *[
                        (
                            F.col("doc_id")
                            + 1
                            + D.md5_long(
                                F.concat(
                                    F.lit(f"pc:{j}:"), F.col("doc_id").cast("string")
                                )
                            )
                            % 20
                        )
                        % n
                        for j in range(3)
                    ]
                )
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
        .withColumn(
            "coin",
            D.md5_long(
                F.concat(
                    F.lit("pk:"),
                    F.col("a").cast("string"),
                    F.lit(":"),
                    F.col("b").cast("string"),
                )
            )
            % 10,
        )
        .localCheckpoint()
    )
    nodes = d.select(F.col("doc_id").alias("node"))
    outs = []
    for k in (2, 5, 8):
        kept = base.filter(F.col("coin") < k).select(
            F.col("a").alias("id_a"), F.col("b").alias("id_b")
        )
        ne = kept.count()
        lab = connected_components(kept)
        fl = nodes.join(lab, "node", "left").select(
            "node", F.coalesce("comp", F.col("node")).alias("comp")
        )
        cs = fl.groupBy("comp").agg(F.count("*").alias("cs"))
        outs.append(
            cs.agg(
                F.lit(k).cast("long").alias("keep_tenths"),
                F.lit(ne).cast("long").alias("n_edges"),
                F.count("*").cast("long").alias("n_components"),
                F.max("cs").cast("long").alias("largest_comp"),
                F.expr(
                    "cast((max(cs) * 1000000) div sum(cs) as bigint)"
                ).alias("largest_q"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("keep_tenths")



@register(
    "hyperanf_links",
    f"""
WITH RECURSIVE edges AS (
  SELECT doc_id AS src, {_PR_EDGE_DST} % {_PR_N} AS dst
  FROM documents, (VALUES (0),(1),(2)) AS t(j)
), r0 AS (
  SELECT doc_id AS node,
         {D.MD5_LONG_SQL.format(x="concat('hb:', cast(doc_id as varchar))")} % {_HA_M} AS b,
         {_ha_rho_sql(D.MD5_LONG_SQL.format(x="concat('hr:', cast(doc_id as varchar))") + " % 4294967296")} AS rho
  FROM documents
), r1 AS (
  SELECT node, b, max(rho) AS rho FROM (
    SELECT node, b, rho FROM r0
    UNION ALL
    SELECT e.src AS node, r.b, r.rho FROM edges e JOIN r0 r ON r.node = e.dst
  ) GROUP BY node, b
), r2 AS (
  SELECT node, b, max(rho) AS rho FROM (
    SELECT node, b, rho FROM r1
    UNION ALL
    SELECT e.src AS node, r.b, r.rho FROM edges e JOIN r1 r ON r.node = e.dst
  ) GROUP BY node, b
), r3 AS (
  SELECT node, b, max(rho) AS rho FROM (
    SELECT node, b, rho FROM r2
    UNION ALL
    SELECT e.src AS node, r.b, r.rho FROM edges e JOIN r2 r ON r.node = e.dst
  ) GROUP BY node, b
), est AS (
  SELECT h, node,
         CASE WHEN v > 0 THEN ({_HA_M} * ([{", ".join(str(q) for q in _HA_LNQ)}])[v]) // 1000000
              ELSE cast(floor(2904.064 / s * 1000.0) as bigint) END AS est_milli
  FROM (
    SELECT h, node, {_HA_M} - count(*) AS v,
           cast({_HA_M} - count(*) as double)
             + sum(1.0 / cast((cast(1 as bigint) << rho) as double)) AS s
    FROM (
      SELECT 1 AS h, node, rho FROM r1
      UNION ALL SELECT 2 AS h, node, rho FROM r2
      UNION ALL SELECT 3 AS h, node, rho FROM r3
    ) GROUP BY h, node
  )
), reach(seed, node, d) AS (
  SELECT doc_id, doc_id, 0 FROM documents
  UNION
  SELECT r.seed, e.dst, r.d + 1
  FROM reach r JOIN edges e ON r.node = e.src
  WHERE r.d < {_HA_HOPS}
), best AS (
  SELECT seed, node, min(d) AS d FROM reach GROUP BY seed, node
), exact AS (
  SELECT h.h, cast(count(*) as bigint) AS sum_exact
  FROM best b JOIN (VALUES (1),(2),(3)) AS h(h) ON b.d <= h.h
  GROUP BY h.h
), esum AS (
  SELECT h, cast(count(*) as bigint) AS n_nodes,
         cast(sum(est_milli) as bigint) AS sum_est_milli
  FROM est GROUP BY h
)
SELECT e.h AS h, e.n_nodes, x.sum_exact, e.sum_est_milli,
       (abs(e.sum_est_milli - 1000 * x.sum_exact) * 100
          <= 15 * 1000 * x.sum_exact) AS ok
FROM esum e JOIN exact x ON x.h = e.h
ORDER BY h
""",
)
def hyperanf_links(spark, sf_dir):
    """HyperANF neighborhood function N(h) for h = 1..{_HA_HOPS} on the
    md5-derived doc link graph — Boldi–Rosa–Vigna's web-graph distance
    sketch, THE algorithm behind 'four degrees of separation' at
    Facebook scale: every node carries an m={_HA_M}-register HLL of
    its reach set, and one round of register-max propagation along
    edges advances every ball by one hop simultaneously — per round
    one edge join + one (node, bucket) max-agg, state m registers per
    node, vs the exact BFS whose frontier is Σ|B(v,h)| rows (the
    difference between feasible and not at 10¹² docs; ball_growth
    profiles 10 seeds exactly, this sketches ALL nodes at once).
    Registers are md5-derived and the small-range estimate uses a
    64-entry integer ln-lookup (linear counting), so Spark and the
    oracle agree BIT-EXACTLY on every register and estimate — the
    sketch is deterministic, only its accuracy is probabilistic; the
    contract row asserts the summed estimate lands within 15% of the
    exact-BFS neighborhood function, mirroring hll_pyramid_contract.
    The exact side doubles as the parity witness and is the part that
    would be dropped at scale."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    edges = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    D.md5_long(F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))) % n
                    for j in range(3)
                ]
            )
        ).alias("dst"),
    )
    regs = d.select(
        F.col("doc_id").alias("node"),
        (D.md5_long(F.concat(F.lit("hb:"), F.col("doc_id").cast("string"))) % _HA_M).alias("b"),
        _ha_rho_col(
            D.md5_long(F.concat(F.lit("hr:"), F.col("doc_id").cast("string"))) % 4294967296
        ).alias("rho"),
    )
    lnq = F.array(*[F.lit(int(q)) for q in _HA_LNQ])
    per_h = []
    for h in range(1, _HA_HOPS + 1):
        nxt = edges.join(regs, regs["node"] == edges["dst"]).select(
            F.col("src").alias("node"), "b", "rho"
        )
        regs = (
            regs.unionByName(nxt).groupBy("node", "b").agg(F.max("rho").alias("rho"))
        ).localCheckpoint()
        stats = regs.groupBy("node").agg(
            (F.lit(_HA_M) - F.count("*")).alias("v"),
            (
                (F.lit(_HA_M) - F.count("*")).cast("double")
                + F.sum(
                    F.expr(
                        "1.0 / cast(shiftleft(cast(1 as bigint), cast(rho as int)) as double)"
                    )
                )
            ).alias("s"),
        )
        est = stats.select(
            F.lit(h).alias("h"),
            "node",
            F.when(
                F.col("v") > 0,
                (F.lit(_HA_M) * F.element_at(lnq, F.col("v").cast("int"))) / F.lit(1000000),
            )
            .otherwise(F.floor(F.lit(2904.064) / F.col("s") * F.lit(1000.0)))
            .cast("long")
            .alias("est_milli"),
        )
        per_h.append(est)
    est_all = per_h[0]
    for e in per_h[1:]:
        est_all = est_all.unionByName(e)
    esum = est_all.groupBy("h").agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.sum("est_milli").cast("long").alias("sum_est_milli"),
    )
    reach = d.select(
        F.col("doc_id").alias("seed"), F.col("doc_id").alias("node"), F.lit(0).alias("d")
    )
    for _ in range(_HA_HOPS):
        nxt = reach.join(edges, reach["node"] == edges["src"]).select(
            "seed", F.col("dst").alias("node"), (F.col("d") + 1).alias("d")
        )
        reach = (
            reach.unionByName(nxt).groupBy("seed", "node").agg(F.min("d").alias("d"))
        ).localCheckpoint()
    hs = spark.range(1, _HA_HOPS + 1).select(F.col("id").cast("int").alias("h"))
    exact = (
        reach.join(F.broadcast(hs), F.col("d") <= F.col("h"))
        .groupBy("h")
        .agg(F.count("*").cast("long").alias("sum_exact"))
    )
    return (
        esum.join(exact, "h")
        .select(
            "h",
            "n_nodes",
            "sum_exact",
            "sum_est_milli",
            (
                F.abs(F.col("sum_est_milli") - 1000 * F.col("sum_exact")) * 100
                <= 15 * 1000 * F.col("sum_exact")
            ).alias("ok"),
        )
        .orderBy("h")
    )



@register(
    "graph_gap_encoding_links",
    f"""
WITH adj AS (
  SELECT DISTINCT doc_id AS src, {_PR_EDGE_DST} % {_PR_N} AS dst
  FROM documents, (VALUES (0),(1),(2)) AS t(j)
), gaps AS (
  SELECT src,
         CASE WHEN prev IS NULL THEN dst + 1 ELSE dst - prev END AS g
  FROM (
    SELECT src, dst, lag(dst) OVER (PARTITION BY src ORDER BY dst) AS prev
    FROM adj
  )
), bits AS (
  SELECT src, g,
         2 * ({_blen_sql('g')} - 1) + 1 AS gamma_bits,
         ({_blen_sql('g')} - 1) + 2 * {_blen_sql(_blen_sql('g'))} - 1 AS delta_bits
  FROM gaps
), fx AS (
  SELECT {_blen_sql(f"({_PR_N} - 1)")} AS id_bits
)
SELECT cast(count(DISTINCT b.src) as bigint) AS n_lists,
       cast(count(*) as bigint) AS n_links,
       cast(count(*) * f.id_bits as bigint) AS fixed_bits,
       cast(sum(b.gamma_bits) as bigint) AS gamma_bits,
       cast(sum(b.delta_bits) as bigint) AS delta_bits,
       CASE WHEN sum(b.gamma_bits) <= count(*) * f.id_bits
             AND sum(b.gamma_bits) <= sum(b.delta_bits) THEN 'gamma'
            WHEN sum(b.delta_bits) <= count(*) * f.id_bits THEN 'delta'
            ELSE 'fixed' END AS best_code,
       cast((sum(b.gamma_bits) * 1000000) // (count(*) * f.id_bits) as bigint)
         AS gamma_vs_fixed_q
FROM bits b CROSS JOIN fx f GROUP BY f.id_bits
""",
)
def graph_gap_encoding_links(spark, sf_dir):
    """WebGraph/BV-style adjacency compression audit: sort each node's
    outlink list, take successor GAPS, and price the graph under
    fixed-width ids vs Elias γ vs Elias δ gap codes (γ(g) =
    2⌊log₂g⌋+1 bits, δ adds a γ-coded length) — the storage-design
    decision behind every compressed web-graph store, made measurable:
    gap codes only win when the numbering gives lists LOCALITY (real
    crawl graphs, url-sorted, compress to ~3 bits/link), and on this
    md5-random graph the audit correctly reports fixed-width as best —
    the instrument proves the graph has no exploitable locality rather
    than assuming folklore. log₂ is an exact integer bit-length branch
    ladder (no libm), so every bit count is integer-exact. Scale
    shape: one distinct + one lag window per src + one agg; at 10¹²
    edges this is the metadata pass a graph-store writer runs before
    choosing its layout."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    adj = (
        d.select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.array(
                    *[
                        D.md5_long(
                            F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))
                        )
                        % n
                        for j in range(3)
                    ]
                )
            ).alias("dst"),
        )
    ).distinct()
    w = Window.partitionBy("src").orderBy("dst")
    gaps = adj.select(
        "src",
        F.when(
            F.lag("dst").over(w).isNull(), F.col("dst") + 1
        )
        .otherwise(F.col("dst") - F.lag("dst").over(w))
        .alias("g"),
    )
    blen_g = _blen_col(F.col("g"))
    bits = gaps.select(
        "src",
        (F.lit(2) * (blen_g - 1) + 1).alias("gamma_bits"),
        ((blen_g - 1) + F.lit(2) * _blen_col(blen_g) - 1).alias("delta_bits"),
    )
    id_bits = _blen_col(F.lit(n - 1))
    agg = bits.agg(
        F.countDistinct("src").cast("long").alias("n_lists"),
        F.count("*").cast("long").alias("n_links"),
        (F.count("*") * id_bits).cast("long").alias("fixed_bits"),
        F.sum("gamma_bits").cast("long").alias("gamma_bits"),
        F.sum("delta_bits").cast("long").alias("delta_bits"),
    )
    return agg.select(
        "n_lists",
        "n_links",
        "fixed_bits",
        "gamma_bits",
        "delta_bits",
        F.when(
            (F.col("gamma_bits") <= F.col("fixed_bits"))
            & (F.col("gamma_bits") <= F.col("delta_bits")),
            "gamma",
        )
        .when(F.col("delta_bits") <= F.col("fixed_bits"), "delta")
        .otherwise("fixed")
        .alias("best_code"),
        F.expr("(gamma_bits * 1000000) div fixed_bits").alias("gamma_vs_fixed_q"),
    )



@register(
    "temporal_reachability_users",
    f"""
WITH RECURSIVE occ AS (
  SELECT DISTINCT user_id,
         cast(floor((90.0 - {_LAT.format(k='event_id')}) / {_TR_GRID}) as int) AS gy,
         cast(floor(({_LON.format(k='event_id')} + 180.0) / {_TR_GRID}) as int) AS gx,
         epoch_us(ts) // 1000000 // {_TR_BUCKET} AS b
  FROM events
), contacts AS (
  SELECT a.user_id AS u, b.user_id AS v, a.b AS b
  FROM occ a JOIN occ b
    ON a.gx = b.gx AND a.gy = b.gy AND a.b = b.b AND a.user_id != b.user_id
), spread(u, t, r) AS (
  SELECT user_id, cast(0 as bigint), 0 FROM (SELECT DISTINCT user_id FROM occ)
  WHERE user_id < {_TR_SEEDS}
  UNION
  SELECT c.v, c.b, s.r + 1
  FROM spread s JOIN contacts c ON c.u = s.u AND c.b >= s.t
  WHERE s.r < {_TR_ROUNDS}
), best AS (
  SELECT u, min(t) AS t_inf, min(r) AS rnd FROM spread GROUP BY u
)
SELECT cast(u as bigint) AS user_id, cast(t_inf as bigint) AS t_inf,
       cast(rnd as int) AS round
FROM best ORDER BY user_id
""",
)
def temporal_reachability_users(spark, sf_dir):
    """Time-respecting reachability over the contact graph — the
    contact-tracing / influence-spread kernel: seeds (user_id <
    {_TR_SEEDS}) are 'infected' at t=0, and infection crosses a
    contact edge (two users sharing a {_TR_GRID:.0f}° cell in the same
    {_TR_BUCKET // 3600} h slot) only if the contact happens AT OR
    AFTER the infector's own infection time — the temporal-path
    constraint that makes this different from every static BFS in the
    registry (khop/ball_growth/wcc reach everything a static path
    touches; an epidemic cannot travel backwards in time). {_TR_ROUNDS}
    unrolled rounds of (contact join + min-time dedup), exactly the
    frontier shape of ball_growth but carrying the infection TIME as
    the relaxed quantity. Earliest infection time + first round
    reached per user. Contact candidates bounded by per-slot
    occupancy², never |users|²."""
    ev = load(spark, sf_dir, "events")
    occ = ev.select(
        "user_id",
        F.floor((F.lit(90.0) - C.derived_lat(F.col("event_id"))) / F.lit(_TR_GRID))
        .cast("int")
        .alias("gy"),
        F.floor((C.derived_lon(F.col("event_id")) + F.lit(180.0)) / F.lit(_TR_GRID))
        .cast("int")
        .alias("gx"),
        F.expr(f"unix_timestamp(ts) div {_TR_BUCKET}").alias("b"),
    ).distinct()
    a = occ.alias("a")
    bb = occ.alias("b")
    contacts = a.join(
        bb,
        (F.col("a.gx") == F.col("b.gx"))
        & (F.col("a.gy") == F.col("b.gy"))
        & (F.col("a.b") == F.col("b.b"))
        & (F.col("a.user_id") != F.col("b.user_id")),
    ).select(
        F.col("a.user_id").alias("u"),
        F.col("b.user_id").alias("v"),
        F.col("a.b").alias("cb"),
    ).localCheckpoint()
    spread = (
        occ.select("user_id")
        .distinct()
        .filter(F.col("user_id") < _TR_SEEDS)
        .select(
            F.col("user_id").alias("u"),
            F.lit(0).cast("long").alias("t"),
            F.lit(0).alias("r"),
        )
    )
    # DP state is per (user, hop): t[v, r+1] = min contact time b over
    # edges (u→v, b ≥ t[u, r]). Collapsing to one row per user would
    # pair the min time of one path with the hop count of another; the
    # (u, r) grain keeps every (time, hops) pair realizable, matching
    # the oracle's full path enumeration exactly.
    for _ in range(_TR_ROUNDS):
        nxt = spread.join(
            contacts, (contacts["u"] == spread["u"]) & (contacts["cb"] >= spread["t"])
        ).select(
            contacts["v"].alias("u"),
            contacts["cb"].alias("t"),
            (spread["r"] + 1).alias("r"),
        )
        spread = (
            spread.unionByName(nxt)
            .groupBy("u", "r")
            .agg(F.min("t").alias("t"))
            .select("u", "t", "r")
        ).localCheckpoint()
    spread = spread.groupBy("u").agg(F.min("t").alias("t"), F.min("r").alias("r"))
    return spread.select(
        F.col("u").cast("long").alias("user_id"),
        F.col("t").cast("long").alias("t_inf"),
        F.col("r").cast("int").alias("round"),
    ).orderBy("user_id")



@register(
    "bipartite_check_links",
    f"""
WITH RECURSIVE edges AS (
  SELECT doc_id AS src, {_PR_EDGE_DST} % {_PR_N} AS dst
  FROM documents, (VALUES (0),(1),(2)) AS t(j)
), und AS (
  SELECT src AS a, dst AS b FROM edges WHERE src != dst
  UNION SELECT dst, src FROM edges WHERE src != dst
), reach(node, par) AS (
  SELECT cast(0 as bigint), 0
  UNION
  SELECT u.b, 1 - r.par
  FROM reach r JOIN und u ON u.a = r.node
), lim AS (
  SELECT node, par FROM reach
)
SELECT cast(count(DISTINCT node) as bigint) AS n_reached,
       cast(count(*) as bigint) AS n_labelings,
       cast(count(DISTINCT node) FILTER (WHERE node IN (
         SELECT node FROM lim GROUP BY node HAVING count(DISTINCT par) > 1))
         as bigint) AS n_conflicted,
       (count(DISTINCT node) = count(*)) AS bipartite_evidence
FROM lim
""",
)
def bipartite_check_links(spark, sf_dir):
    """Bipartite (odd-cycle) check by BFS 2-coloring from node 0 over
    the undirected md5 link graph: propagate alternating parity along
    edges; any node reachable with BOTH parities sits on an odd cycle
    — n_conflicted > 0 certifies NOT bipartite (and a random sparse
    digraph's undirected shadow essentially always has odd cycles,
    which is what the census shows). Bipartiteness is the gate for
    two-mode analyses (covisitation projection, Barber modularity)
    that silently produce nonsense on one-mode graphs. Spark runs
    {_BIP_ROUNDS} unrolled frontier rounds over (node, parity) state
    — ball_growth's shape with a parity payload; the oracle's
    recursive CTE explores the same closure (UNION-deduped on the
    pair, so it terminates at the parity fixpoint)."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    edges = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    D.md5_long(F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))) % n
                    for j in range(3)
                ]
            )
        ).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    und = edges.select(F.col("src").alias("a"), F.col("dst").alias("b")).unionByName(
        edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    ).distinct()
    reach = d.sparkSession.createDataFrame([(0, 0)], "node long, par int")
    for _ in range(_BIP_ROUNDS):
        nxt = reach.join(und, und["a"] == reach["node"]).select(
            F.col("b").alias("node"), (1 - F.col("par")).alias("par")
        )
        reach = reach.unionByName(nxt).distinct().localCheckpoint()
    # mirror the oracle's fixpoint closure: keep expanding until no new
    # (node, parity) pairs appear (bounded by 2·n states)
    while True:
        nxt = reach.join(und, und["a"] == reach["node"]).select(
            F.col("b").alias("node"), (1 - F.col("par")).alias("par")
        )
        grown = reach.unionByName(nxt).distinct().localCheckpoint()
        if grown.count() == reach.count():
            reach = grown
            break
        reach = grown
    conflicted = (
        reach.groupBy("node")
        .agg(F.countDistinct("par").alias("np"))
        .filter(F.col("np") > 1)
    )
    stats = reach.agg(
        F.countDistinct("node").cast("long").alias("n_reached"),
        F.count("*").cast("long").alias("n_labelings"),
    )
    cc = conflicted.agg(F.count("*").cast("long").alias("n_conflicted"))
    return stats.crossJoin(F.broadcast(cc)).select(
        "n_reached",
        "n_labelings",
        "n_conflicted",
        (F.col("n_reached") == F.col("n_labelings")).alias("bipartite_evidence"),
    )



@register("pagerank_damping_sweep", _pds_oracle_sql())
def pagerank_damping_sweep(spark, sf_dir):
    """PageRank damping-factor sensitivity: the same integer-tick
    power iteration (pagerank_doc_links' fixed-point discipline —
    mass in 10⁻⁹ ticks, floor divisions, {_PDS_ROUNDS} rounds) run at
    d = 0.75 and d = 0.90, compared by RANK: top-20 overlap and total/
    max rank displacement. Damping is PageRank's one free parameter
    and 'the ranking is robust to it' is an assumption this op
    replaces with a measured number — the parameter-sensitivity
    family (session_gap_sweep, attribution windows, reserve prices)
    reaching the registry's flagship graph op. Two unrolled runs
    share the edge table; comparison is two rank windows + one
    census."""
    n = table_rows(sf_dir, "documents")
    d = load(spark, sf_dir, "documents")
    edges = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    D.md5_long(F.concat(F.lit(f"e:{j}:"), F.col("doc_id").cast("string"))) % n
                    for j in range(3)
                ]
            )
        ).alias("dst"),
    ).localCheckpoint()
    nodes = d.select(F.col("doc_id").alias("id"))
    finals = []
    for sid, d_milli in _PDS_DAMPINGS:
        m = nodes.select("id", F.lit(_PDS_SCALE // n).cast("long").alias("m"))
        base = (_PDS_SCALE * (1000 - d_milli) // 1000) // n
        for _ in range(_PDS_ROUNDS):
            inm = (
                edges.join(m, m["id"] == edges["src"])
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum(F.expr("m div 3")).cast("long").alias("s"))
            )
            m = (
                nodes.join(inm, nodes["id"] == inm["node"], "left")
                .select(
                    "id",
                    F.expr(
                        f"cast({base} as bigint)"
                        f" + ({d_milli} * coalesce(s, 0L)) div 1000"
                    )
                    .cast("long")
                    .alias("m"),
                )
            ).localCheckpoint()
        finals.append(m)
    a = finals[0].select(F.col("id").alias("node"), F.col("m").alias("ma"))
    b = finals[1].select(F.col("id").alias("node2"), F.col("m").alias("mb"))
    j = a.join(b, a["node"] == b["node2"])
    rk = j.select(
        "node",
        F.row_number().over(Window.orderBy(F.desc("ma"), F.asc("node"))).alias("rk_a"),
        F.row_number().over(Window.orderBy(F.desc("mb"), F.asc("node"))).alias("rk_b"),
    )
    return rk.agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.count(F.when((F.col("rk_a") <= 20) & (F.col("rk_b") <= 20), 1))
        .cast("long")
        .alias("top20_overlap"),
        F.sum(F.abs(F.col("rk_a") - F.col("rk_b"))).cast("long").alias("total_rank_shift"),
        F.max(F.abs(F.col("rk_a") - F.col("rk_b"))).cast("long").alias("max_rank_shift"),
    )

