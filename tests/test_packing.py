"""pack_sequences vs a plain-Python greedy replay + packing invariants."""

from gipspark.operators.packing import pack_sequences


def greedy(toks, budget):
    seq, off, out = 0, 0, []
    cum = 0
    for i, t in enumerate(toks):
        if i == 0:
            cum = t
            out.append((0, 0))
        elif cum + t > budget:
            seq += 1
            cum = t
            out.append((seq, 0))
        else:
            out.append((seq, cum))
            cum += t
    return out


def test_pack_matches_python_greedy(spark):
    # oversized docs (> budget), exact fits, tiny docs, one-doc bucket
    data = []
    s = 7
    for i in range(300):
        s = (s * 48271) % 2147483647
        data.append((i, s % 4, 1 + s % 700))  # budget 512 → some oversized
    data.append((300, 9, 9999))  # lone oversized doc in its own bucket
    df = spark.createDataFrame(data, "doc_id long, bucket long, tok long")
    got = pack_sequences(df, budget=512).collect()
    by_bucket = {}
    for r in sorted(got, key=lambda r: (r.bucket, r.doc_id)):
        by_bucket.setdefault(r.bucket, []).append(r)
    for b, rows in by_bucket.items():
        toks = [r.tok for r in rows]
        want = greedy(toks, 512)
        have = [(r.seq_id, r.offset) for r in rows]
        assert have == want, f"bucket {b}"
        # invariant: a sequence never exceeds the budget unless it is
        # a single oversized doc
        totals = {}
        for r in rows:
            totals.setdefault(r.seq_id, []).append(r.tok)
        for sid, ts in totals.items():
            assert sum(ts) <= 512 or len(ts) == 1, f"bucket {b} seq {sid}"
