"""The curation pipeline: fingerprint → near-dedup → filter → pack,
checkpointed per stage.

The webtext-payload counterpart of plans/pipeline.py (which is the
geospatial tiling flagship): the end-to-end training-data flow a
Common-Crawl-scale corpus runs before pretraining, with the same
CheckpointedRun machinery — every stage is an idempotent parquet
publish with per-partition lineage + row-count metrics, and a
re-submitted run skips completed stages (BASELINE.json's "resumable
from checkpoint" contract, exercised here on the text side).

Stage list (manifest keys, stable across runs):
  c1_fingerprint  md5 content digest, token estimate, quality score,
                  lang id; exact-dup decision (keep min doc_id per
                  digest) — one narrow pass + one digest aggregate
  c2_neardup      MinHash-LSH bands → exact-Jaccard verify →
                  connected components → keep each cluster's min id
  c3_filter       quality floor + token floor on survivors
  c4_pack         greedy 512-token sequence packing (md5 buckets)

Scale shapes: c1 is one hash agg on the digest; c2 is the banded LSH
join (shuffle ∝ bucket collisions, never |D|²) plus the O(log
diameter) component loop; c3 is a narrow filter; c4 is one bucket
shuffle + per-bucket Arrow scan. Nothing rescans html/text after c1
except c2's shingle pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gipspark.functions.text import lang_id, quality_score, token_count
from gipspark.operators import dedup as D
from gipspark.operators.components import connected_components
from gipspark.operators.packing import pack_sequences
from gipspark.sources.checkpoint import CheckpointedRun

PACK_BUDGET = 512
PACK_BUCKETS = 8
QUALITY_FLOOR = 0.2
TOKEN_FLOOR = 8


def run_curation(
    spark: SparkSession,
    docs: DataFrame,
    ckpt_root: str,
    run_id: str,
) -> tuple[DataFrame, CheckpointedRun]:
    """Run (or resume) the curation pipeline; returns (packed, run)."""
    run = CheckpointedRun(spark, ckpt_root, run_id)

    def c1() -> DataFrame:
        d = docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "text",
            "source",
            F.md5(F.col("text")).alias("digest"),
            token_count(F.col("text")).alias("n_tok"),
            quality_score(F.col("text")).alias("quality"),
            lang_id(F.col("text")).alias("lang_pred"),
        )
        keep = d.groupBy("digest").agg(F.min("doc_id").alias("doc_id"))
        return d.join(keep, ["digest", "doc_id"], "semi")

    f1 = run.stage("c1_fingerprint", c1, key_col="doc_id")

    def c2() -> DataFrame:
        cand = D.minhash_lsh_pairs(f1, n_hashes=8, bands=4, shingle_n=2).select("id_a", "id_b")
        sh = f1.select(
            F.col("doc_id").alias("sid"), D.shingles(F.col("text"), 2).alias("sh")
        ).withColumn("sz", F.size("sh"))
        ver = (
            cand.join(
                sh.select(F.col("sid").alias("id_a"), F.col("sh").alias("sh_a"), F.col("sz").alias("sz_a")),
                "id_a",
            )
            .join(
                sh.select(F.col("sid").alias("id_b"), F.col("sh").alias("sh_b"), F.col("sz").alias("sz_b")),
                "id_b",
            )
            .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
            .filter(2 * F.col("common") >= F.col("sz_a") + F.col("sz_b") - F.col("common"))
            .select("id_a", "id_b")
        )
        if ver.isEmpty():
            return f1.drop("text")
        comp = connected_components(ver)
        dupes = comp.filter(F.col("node") != F.col("comp")).select(
            F.col("node").alias("doc_id")
        )
        return f1.join(dupes, "doc_id", "anti").drop("text")

    f2 = run.stage("c2_neardup", c2, key_col="doc_id")

    def c3() -> DataFrame:
        return f2.filter(
            (F.col("quality") >= QUALITY_FLOOR) & (F.col("n_tok") >= TOKEN_FLOOR)
        )

    f3 = run.stage("c3_filter", c3, key_col="doc_id")

    def c4() -> DataFrame:
        d = f3.select(
            "doc_id",
            F.greatest(F.lit(1).cast("long"), F.col("n_tok").cast("long")).alias("tok"),
            (
                D.md5_long(F.concat(F.lit("p:"), F.col("doc_id").cast("string"))) % PACK_BUCKETS
            ).alias("bucket"),
        )
        return pack_sequences(d, budget=PACK_BUDGET)

    packed = run.stage("c4_pack", c4, key_col="doc_id")
    return packed, run
