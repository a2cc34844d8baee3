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
