"""Blocked fuzzy record linkage (Levenshtein self-join).

Pairs of rows whose string column is within ``max_dist`` edits, found
without an all-pairs comparison. Two-path hybrid (the skew.py shape —
route by observed occupancy, not by hope):

- **cold path** (blocks ≤ ``hot_threshold`` rows): self equi-join on
  (caller-supplied stem, floor(len/max_dist) length bucket). Sound:
  lev(a, b) ≤ d bounds ``abs(len(a) − len(b)) ≤ d``, hence the bucket
  difference by 1 when the bucket width is ≥ d. One side emits buckets
  {b−1, b, b+1}, so every qualifying pair of cold rows meets on EXACTLY
  one key — no post-join distinct.
- **hot path** (blocks > ``hot_threshold``): PassJoin segment
  signatures (Li, Deng & Feng, VLDB'11 — public algorithm) break the
  residual quadratic block the cold key can't (a Zipf-hot stem whose
  members share one length band, VERDICT r3 next-round #2). Pigeonhole:
  partition a string of length l into d+1 contiguous segments; any
  string within d edits of it must contain at least one segment EXACTLY,
  at a start position shifted by at most d. Every row is *indexed*
  under its d+1 (stem, len, seg_idx, segment) keys; only HOT rows
  *probe*, emitting the substrings a partner of source length
  l ∈ [len−d, len+d] could have left untouched ((2d+1)·(d+1)·(2d+1)
  keys, a constant). Candidates are exact-substring collisions — a hot
  block of mutually-far strings now produces ~0 candidates instead of
  occupancy². Multi-key collisions are deduped before ONE Levenshtein
  refine per unordered pair.

Pair coverage is a disjoint union: cold∧cold pairs meet on the cold
path only (both sides filtered to cold rows); any pair with a hot
endpoint meets on the hot path (the hot row probes, the partner —
hot or cold — is indexed). Strings shorter than d+1 chars cannot be
segment-partitioned; they index/probe under a dedicated (stem, len)
tiny key, bounded by tiny-row occupancy per stem.

100 TB shape: one window count + one shuffle on the block key for the
cold path; the hot path's constant probe fan-out is paid ONLY by rows
of hot blocks; no driver-side data anywhere. The Levenshtein refine
runs JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _seg_start(l: Column, i: int, k: int) -> Column:
    """1-based start of segment i when a length-l string splits into k
    contiguous segments (first l % k segments get the extra char)."""
    q = F.floor(l / F.lit(k)).cast("int")
    r = (l % F.lit(k)).cast("int")
    return F.lit(i) * q + F.least(F.lit(i), r) + F.lit(1)


def _seg_len(l: Column, i: int, k: int) -> Column:
    q = F.floor(l / F.lit(k)).cast("int")
    r = (l % F.lit(k)).cast("int")
    return q + F.when(F.lit(i) < r, F.lit(1)).otherwise(F.lit(0))


def _index_side(b: DataFrame, max_dist: int) -> DataFrame:
    """Every row under its d+1 (stem, len, i, segment) keys — or ONE
    (stem, len, −1, '') tiny key when len < d+1."""
    k = max_dist + 1
    l = F.length("__txt").cast("int")
    segs = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                _seg_start(l, i, k).alias("p"),
                _seg_len(l, i, k).alias("sl"),
            )
            for i in range(k)
        ]
    )
    tiny = F.array(
        F.struct(F.lit(-1).alias("i"), F.lit(1).alias("p"), F.lit(0).alias("sl"))
    )
    e = b.withColumn("__s", F.explode(F.when(l >= k, segs).otherwise(tiny)))
    return e.select(
        F.col("__id").alias("__xid"),
        F.col("__txt").alias("__xtxt"),
        "__stem",
        l.alias("__l"),
        F.col("__s.i").alias("__i"),
        F.when(
            F.col("__s.i") >= 0, F.substring("__txt", F.col("__s.p"), F.col("__s.sl"))
        )
        .otherwise(F.lit(""))
        .alias("__seg"),
    )


def _probe_side(hot: DataFrame, max_dist: int) -> DataFrame:
    """Hot rows emitting, for every source length l within ±d and every
    segment index, the substrings that segment could occupy here after
    ≤ d edits (position shift ≤ d) — plus the tiny key per l < d+1."""
    k = max_dist + 1
    d = max_dist
    ln = F.length("__txt").cast("int")
    combos = []
    for dl in range(-d, d + 1):
        l = ln + F.lit(dl)
        combos.append(
            F.struct(
                l.alias("l"), F.lit(-1).alias("i"), F.lit(1).alias("p"), F.lit(0).alias("sl")
            )
        )
        for i in range(k):
            for s in range(-d, d + 1):
                combos.append(
                    F.struct(
                        l.alias("l"),
                        F.lit(i).alias("i"),
                        (_seg_start(l, i, k) + F.lit(s)).alias("p"),
                        _seg_len(l, i, k).alias("sl"),
                    )
                )
    e = hot.withColumn("__c", F.explode(F.array(*combos)))
    l, i, p, sl = (F.col(f"__c.{c}") for c in ("l", "i", "p", "sl"))
    valid_tiny = (i == -1) & (l >= 1) & (l < k)
    valid_seg = (
        (i >= 0) & (l >= k) & (sl >= 1) & (p >= 1) & (p + sl - 1 <= F.length("__txt"))
    )
    return (
        e.filter(valid_tiny | valid_seg)
        .select(
            F.col("__id").alias("__hid"),
            F.col("__txt").alias("__htxt"),
            "__stem",
            l.alias("__l"),
            i.alias("__i"),
            F.when(i >= 0, F.substring("__txt", p, sl)).otherwise(F.lit("")).alias("__seg"),
        )
        .dropDuplicates(["__hid", "__stem", "__l", "__i", "__seg"])
    )


def fuzzy_self_join(
    df: DataFrame,
    stem: Column,
    id_col: str = "doc_id",
    text_col: str = "title",
    max_dist: int = 2,
    hot_threshold: int = 64,
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
    w = Window.partitionBy("__stem", "__bkt")
    b = b.withColumn("__hot", F.count("*").over(w) > hot_threshold)
    cold = b.filter(~F.col("__hot")).drop("__hot")
    hot = b.filter(F.col("__hot")).drop("__hot")

    def key(bkt: Column) -> Column:
        return F.concat(F.col("__stem"), F.lit("#"), bkt.cast("string"))

    a = cold.withColumn("__d", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))).select(
        F.col("__id").alias("id_a"),
        F.col("__txt").alias("__ta"),
        key(F.col("__bkt") + F.col("__d")).alias("__key"),
    )
    c = cold.select(
        F.col("__id").alias("id_b"),
        F.col("__txt").alias("__tb"),
        key(F.col("__bkt")).alias("__key"),
    )
    dist = F.levenshtein("__ta", "__tb")
    cold_pairs = (
        a.join(c, "__key")
        .filter((F.col("id_a") < F.col("id_b")) & (dist <= max_dist))
        .select("id_a", "id_b", dist.cast("long").alias("dist"))
    )

    cand = _passjoin_candidates(hot, b.drop("__hot"), max_dist)
    hdist = F.levenshtein("__ta", "__tb")
    hot_pairs = cand.filter(hdist <= max_dist).select(
        "id_a", "id_b", hdist.cast("long").alias("dist")
    )
    return cold_pairs.unionByName(hot_pairs)


def _passjoin_candidates(hot: DataFrame, all_rows: DataFrame, max_dist: int) -> DataFrame:
    """Deduped unordered candidate pairs (id_a < id_b, __ta, __tb) with
    at least one hot endpoint — the pre-refine PassJoin output, exposed
    for the candidate-bound property test."""
    idx = _index_side(all_rows, max_dist)
    prb = _probe_side(hot, max_dist)
    j = prb.join(idx, ["__stem", "__l", "__i", "__seg"]).filter(
        F.col("__hid") != F.col("__xid")
    )
    lo = F.least("__hid", "__xid")
    return (
        j.select(
            lo.alias("id_a"),
            F.greatest("__hid", "__xid").alias("id_b"),
            F.when(F.col("__hid") == lo, F.col("__htxt")).otherwise(F.col("__xtxt")).alias("__ta"),
            F.when(F.col("__hid") == lo, F.col("__xtxt")).otherwise(F.col("__htxt")).alias("__tb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
