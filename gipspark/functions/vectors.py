"""Embedding-vector expressions — JVM-side higher-order functions.

Cosine/dot over ``array<float>`` embedding columns stay inside Tungsten
(`aggregate`/`zip_with`), no Python crossing: the sequential left fold
makes the result deterministic per row, so the DuckDB oracle
(list_cosine_similarity over the same lists) agrees to float precision;
oracle-facing queries round to 3 decimals to absorb float32-vs-float64
accumulation differences (see __spark_entry__.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a sequential fold — deterministic, codegen'd."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
