"""incremental_neardup: correctness vs a driver-side reference AND the
plan contract VERDICT r2 #5 demands — given a persisted band index, the
plan scans ONLY the index parquet; the old corpus's text is neither
recomputed nor read.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gipspark.operators.dedup import incremental_neardup, minhash_index

N_HASHES, BANDS, SHINGLE_N = 8, 4, 2


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


OLD = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "completely unrelated text about spark shuffle partitions and joins"),
    (2, "another very different document mentioning tiles cells and joins today"),
]
NEW = [
    # near-identical to old doc 0 (one word changed) -> drop
    (100, "the quick brown fox jumps over the lazy cat near the river bank"),
    # exact copy of old doc 1 -> drop
    (101, "completely unrelated text about spark shuffle partitions and joins"),
    # fresh content -> keep
    (102, "entirely novel prose with no counterpart in the existing corpus at all"),
]


def test_decisions_match_reference(spark, tmp_path):
    idx_path = str(tmp_path / "old_index.parquet")
    minhash_index(
        _docs(spark, OLD), n_hashes=N_HASHES, bands=BANDS, shingle_n=SHINGLE_N
    ).write.parquet(idx_path)
    old_index = spark.read.parquet(idx_path)
    out = {
        r.doc_id: (r.keep, r.dup_of, r.n_partners)
        for r in incremental_neardup(
            _docs(spark, NEW), old_index, n_hashes=N_HASHES, bands=BANDS, shingle_n=SHINGLE_N
        ).collect()
    }
    assert set(out) == {100, 101, 102}
    assert out[100][0] is False and out[100][1] == 0
    assert out[101][0] is False and out[101][1] == 1
    assert out[102] == (True, None, 0)


def test_plan_reads_only_the_index_not_old_text(spark, tmp_path):
    # persist BOTH the old docs (with text) and the index; the
    # incremental plan must reference the index file only — proof that
    # old signatures are reused, not recomputed from text
    old_docs_path = str(tmp_path / "old_docs.parquet")
    idx_path = str(tmp_path / "old_index.parquet")
    _docs(spark, OLD).write.parquet(old_docs_path)
    minhash_index(
        spark.read.parquet(old_docs_path),
        n_hashes=N_HASHES,
        bands=BANDS,
        shingle_n=SHINGLE_N,
    ).write.parquet(idx_path)

    out = incremental_neardup(
        _docs(spark, NEW),
        spark.read.parquet(idx_path),
        n_hashes=N_HASHES,
        bands=BANDS,
        shingle_n=SHINGLE_N,
    )
    # inputFiles() is truncation-proof (plan strings elide long paths)
    files = out.inputFiles()
    assert any("old_index.parquet" in f for f in files)
    assert not any("old_docs.parquet" in f for f in files)
    # and no file scan reads a text column at all (the new docs are a
    # local relation here; the only file source is the index)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "text" not in line, line


def test_incremental_equals_batch_on_random_corpus(spark):
    # the decision must equal running the SAME band+verify logic with
    # everything recomputed from text (the non-incremental definition)
    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    old_rows = [
        (i, " ".join(rng.choice(words, 12).tolist())) for i in range(40)
    ]
    # half the new docs are light edits of old docs, half fresh
    new_rows = []
    for i in range(20):
        if i % 2 == 0:
            base = old_rows[i][1].split()
            base[rng.integers(len(base))] = "omega"
            new_rows.append((1000 + i, " ".join(base)))
        else:
            new_rows.append((1000 + i, " ".join(rng.choice(words, 12).tolist()) + " nu xi"))
    old_df, new_df = _docs(spark, old_rows), _docs(spark, new_rows)

    got = {
        r.doc_id: (r.keep, r.dup_of, r.n_partners)
        for r in incremental_neardup(
            new_df,
            minhash_index(old_df, n_hashes=N_HASHES, bands=BANDS, shingle_n=SHINGLE_N),
            n_hashes=N_HASHES,
            bands=BANDS,
            shingle_n=SHINGLE_N,
        ).collect()
    }

    # reference: recompute both sides' indexes, join, lane-agree
    oi = minhash_index(old_df, n_hashes=N_HASHES, bands=BANDS, shingle_n=SHINGLE_N)
    ni = minhash_index(new_df, n_hashes=N_HASHES, bands=BANDS, shingle_n=SHINGLE_N)
    o = {(r.id, r.band, r.bucket): tuple(r.sig) for r in oi.collect()}
    n = {(r.id, r.band, r.bucket): tuple(r.sig) for r in ni.collect()}
    cands = set()
    for (nid, nb, nbk), nsig in n.items():
        for (oid, ob, obk), osig in o.items():
            if nb == ob and nbk == obk:
                cands.add((nid, oid))
    expected = {nid: (True, None, 0) for nid, _ in new_rows}
    verified: dict[int, list[int]] = {}
    nsigs = {r.id: tuple(r.sig) for r in ni.select("id", "sig").distinct().collect()}
    osigs = {r.id: tuple(r.sig) for r in oi.select("id", "sig").distinct().collect()}
    for nid, oid in cands:
        agree = sum(a == b for a, b in zip(nsigs[nid], osigs[oid]))
        if 2 * agree >= N_HASHES:
            verified.setdefault(nid, []).append(oid)
    for nid, olds in verified.items():
        expected[nid] = (False, min(olds), len(olds))
    assert got == expected
