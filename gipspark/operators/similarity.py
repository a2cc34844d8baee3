"""Embedding similarity search: brute-force cosine top-k + LSH buckets.

Task-brief training-data op. Two tiers:

- :func:`cosine_topk` — exact brute force: broadcast the (small) query
  set, JVM-side sequential-fold cosine (gipspark.functions.vectors),
  window top-k. The correctness baseline and the oracle-checked path.
- :func:`lsh_cosine_topk` — the scale path: random-hyperplane sign
  sketches (seeded, driver-side NumPy constants baked into the plan as
  literals) bucket both sides; candidates = bucket collisions across
  ``n_tables`` independent tables; exact cosine reranks. Recall < 1 by
  construction → verified against brute force by recall floor, not
  equality (tests/test_similarity.py).

At 10^12 scale the brute-force tier is per-query O(N) — usable for ad
hoc queries via broadcast; the LSH tier's bucket join shuffles only
collision candidates and its hyperplane count tunes the recall/cost
point.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gipspark.functions.vectors import cosine_sim


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "q_id",
    c_id: str = "vec_id",
    q_vec: str = "q_vec",
    c_vec: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine; deterministic tie-break (sim desc, id asc)."""
    w = Window.partitionBy(q_id).orderBy(F.col("sim").desc(), F.col(c_id).asc())
    return (
        F.broadcast(queries.select(q_id, q_vec))
        .crossJoin(corpus.select(c_id, c_vec))
        .filter(F.col(q_id) != F.col(c_id))
        .withColumn("sim", cosine_sim(F.col(q_vec), F.col(c_vec)))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "sim", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, table: int, seed: int = 13) -> np.ndarray:
    rng = np.random.default_rng(seed * 1000 + table)
    return rng.standard_normal((n_planes, dim))


def _bucket_col(vec_col: str, planes: np.ndarray):
    """Sign-sketch bucket id: bit p = [vec · plane_p > 0]. The dot
    products run as JVM sequential folds over literal plane arrays —
    no Python, no shuffle."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(x)) for x in plane]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(2 ** p).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def _kmeans_centroids(
    corpus: DataFrame,
    c_vec: str,
    n_centroids: int,
    c_id: str | None = None,
    sample: int = 4096,
    iters: int = 8,
    seed: int = 17,
) -> np.ndarray:
    """Tiny driver-side k-means on a sample — the IVF coarse quantizer.

    The sample is bounded (collect of ≤``sample`` rows), so this stays
    O(sample·dim·iters) on the driver no matter the corpus size; the
    expensive assignment step below is distributed. When ``c_id`` is
    given the sample is the ``sample`` rows with the smallest
    xxhash64(id) — a deterministic reservoir that is invariant to
    partitioning/parallelism (bare ``limit`` is partition-order-
    dependent) and runs as TakeOrderedAndProject (per-partition top-k,
    no full sort)."""
    sel = corpus.select(c_vec) if c_id is None else (
        corpus.select(c_vec, F.xxhash64(F.col(c_id)).alias("__h"))
        .orderBy("__h")
        .select(c_vec)
    )
    rows = sel.limit(sample).collect()
    X = np.asarray([r[0] for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(len(C)):
            m = assign == j
            if m.any():
                v = X[m].mean(axis=0)
                C[j] = v / max(np.linalg.norm(v), 1e-12)
    return C


def ivf_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    q_id: str = "q_id",
    c_id: str = "vec_id",
    q_vec: str = "q_vec",
    c_vec: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: coarse k-means quantizer (driver-side on a
    sample), corpus rows assigned to their nearest centroid via JVM
    fold dot products (one narrow pass, centroids baked as literals),
    queries probe their ``n_probe`` nearest lists, exact cosine reranks
    the union. Recall tunes with n_probe; shuffle volume is bounded by
    list occupancy — the scale path for 10^12-row corpora where bucket
    lists live partitioned on centroid id."""
    C = _kmeans_centroids(corpus, c_vec, n_centroids, c_id=c_id)

    def dots(vec_col: str):
        return [
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(float(x)) for x in c]),
                    lambda a, b: a.cast("double") * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for c in C
        ]

    def top_idx(vec_col: str, n: int):
        scored = F.array(
            *[F.struct(d.alias("d"), F.lit(i).alias("i")) for i, d in enumerate(dots(vec_col))]
        )
        ordered = F.reverse(F.array_sort(scored))
        return F.slice(F.transform(ordered, lambda s: s["i"]), 1, n)

    c_assigned = corpus.select(
        c_id, c_vec, F.element_at(top_idx(c_vec, 1), 1).alias("__list")
    )
    q_assigned = queries.select(
        q_id, q_vec, F.explode(top_idx(q_vec, n_probe)).alias("__list")
    )
    w = Window.partitionBy(q_id).orderBy(F.col("sim").desc(), F.col(c_id).asc())
    return (
        q_assigned.join(c_assigned, on="__list")
        .filter(F.col(q_id) != F.col(c_id))
        .withColumn("sim", cosine_sim(F.col(q_vec), F.col(c_vec)))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "sim", "rank")
    )


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 8,
    q_id: str = "q_id",
    c_id: str = "vec_id",
    q_vec: str = "q_vec",
    c_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: union of per-table bucket collisions, exact
    cosine rerank. Returns the same schema as cosine_topk."""
    q_b = queries.select(q_id, q_vec)
    c_b = corpus.select(c_id, c_vec)
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, t)
        q_b = q_b.withColumn(f"__b{t}", _bucket_col(q_vec, planes))
        c_b = c_b.withColumn(f"__b{t}", _bucket_col(c_vec, planes))
    q_long = q_b.select(
        q_id, q_vec, F.explode(F.array(*[F.struct(F.lit(t).alias("t"), F.col(f"__b{t}").alias("b")) for t in range(n_tables)])).alias("tb")
    ).select(q_id, q_vec, "tb.t", "tb.b")
    c_long = c_b.select(
        c_id, c_vec, F.explode(F.array(*[F.struct(F.lit(t).alias("t"), F.col(f"__b{t}").alias("b")) for t in range(n_tables)])).alias("tb")
    ).select(c_id, c_vec, "tb.t", "tb.b")
    cand = (
        q_long.join(c_long, on=["t", "b"])
        .filter(F.col(q_id) != F.col(c_id))
        .select(q_id, q_vec, c_id, c_vec)
        .distinct()
    )
    w = Window.partitionBy(q_id).orderBy(F.col("sim").desc(), F.col(c_id).asc())
    return (
        cand.withColumn("sim", cosine_sim(F.col(q_vec), F.col(c_vec)))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "sim", "rank")
    )
