"""Greedy sequence packing: docs → fixed-token-budget training rows.

The last mile of every LLM pretraining pipeline: concatenate documents
into fixed-length training sequences with minimal padding. Exact
optimal packing is bin-packing (NP-hard); production pipelines use
greedy first-fit in a deterministic order, which is what this
implements — with the one twist that makes it distributed:

  packing is inherently SEQUENTIAL (each doc's bin depends on the
  running total), so the corpus is first salted into B independent
  buckets by md5(doc_id); each bucket packs independently in doc_id
  order. Determinism comes from the (bucket, doc_id) order, not from
  partition layout; parallelism = B, and padding waste stays the
  greedy bound per bucket. At 10^12 docs B scales with the cluster
  (buckets are the shuffle key of the single exchange here).

The per-bucket scan is a data-dependent running total WITH RESET —
not window-expressible (no closed form for reset points), so it runs
as one applyInPandas pass per bucket: Arrow-batched, one Python loop
over the bucket's numpy token array (the viterbi/frechet DP pattern —
never row-at-a-time BatchEvalPython). The DuckDB oracle replays the
identical recurrence one row at a time with WITH RECURSIVE.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    tok_col: str = "tok",
    id_col: str = "doc_id",
    bucket_col: str = "bucket",
    budget: int = 512,
) -> DataFrame:
    """(id, bucket, tok, seq_id, offset): greedy first-fit packing of
    each bucket's docs (in id order) into sequences of ``budget``
    tokens. A doc larger than the budget gets its own sequence. The
    first doc of a bucket is always (seq 0, offset 0)."""
    out_schema = f"{id_col} long, {bucket_col} long, {tok_col} long, seq_id long, offset long"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        toks = pdf[tok_col].to_numpy()
        seq = [0] * len(toks)
        off = [0] * len(toks)
        s, cum = 0, 0
        for i, t in enumerate(toks):
            t = int(t)
            if i == 0:
                cum = t
            elif cum + t > budget:
                s += 1
                off[i] = 0
                cum = t
            else:
                off[i] = cum
                cum += t
            seq[i] = s
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                bucket_col: pdf[bucket_col],
                tok_col: pdf[tok_col],
                "seq_id": seq,
                "offset": off,
            }
        )

    return (
        docs.select(id_col, bucket_col, tok_col)
        .groupBy(bucket_col)
        .applyInPandas(pack, schema=out_schema)
    )
