"""Deduplication operators for training-data pipelines.

The task brief's first-class training-data ops: exact dedup, MinHash+LSH,
SimHash, n-gram Jaccard. All JVM-side (split/transform/explode/groupBy)
— hashing via md5 hex arithmetic so the DuckDB oracle can replay the
exact computation (conv(hex)→bigint ≡ cast('0x'||hex as bigint)).

Scale shape: every variant is shingle-explode → shuffle on
shingle/band/bucket → pair aggregation. At 10^12 docs the band-bucket
join (LSH) bounds candidate pairs to near-duplicates instead of |D|²;
exact dedup is a single hash aggregate on the content digest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gipspark.functions.text import tokens

# ---------------------------------------------------------------------------
# shared hashing — md5-hex → int64, mirrored by the oracle as
#   cast(concat('0x', substr(md5(x), 1, 15)) as bigint)
# ---------------------------------------------------------------------------


def md5_long(col: Column) -> Column:
    """Deterministic 60-bit integer hash of a string, oracle-replayable."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


MD5_LONG_SQL = "cast(concat('0x', substr(md5({x}), 1, 15)) as bigint)"


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest id per exact content digest. One hash aggregate
    (partial+final via Catalyst); digest = md5 of raw text bytes."""
    return (
        df.withColumn("digest", F.md5(F.col(text_col)))
        .groupBy("digest")
        .agg(F.min(F.col(id_col)).alias("keep_id"), F.count("*").alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# shingles
# ---------------------------------------------------------------------------


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (JVM higher-order fns, no Python).

    The token array is bound ONCE as a lambda variable via
    ``transform(array(toks), t -> …)[0]``: referencing the ``tokens()``
    expression directly inside the per-gram lambda inlines the regex
    split into every ``element_at`` call — measured 11× slower on the
    sf0.1 documents table (BENCH.md "expression inlining").
    """
    toks = tokens(text)
    if n == 1:
        return F.array_distinct(toks)

    def build(t: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(t) - (n - 1))
        gram = F.transform(
            idx, lambda i: F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(n)])
        )
        return F.when(F.size(t) >= n, F.array_distinct(gram)).otherwise(
            F.array().cast("array<string>")
        )

    return F.transform(F.array(toks), build)[0]


def shingles_sql(t: str, n: int = 3) -> str:
    """DuckDB mirror of :func:`shingles` — 1-based list indexing both."""
    toks = f"regexp_split_to_array(lower(trim({t})), '\\s+')"
    if n == 1:
        return f"list_distinct({toks})"
    parts = " || ' ' || ".join(f"({toks})[i + {j}]" for j in range(n))
    gram = f"list_transform(generate_series(1, len({toks}) - {n - 1}), i -> {parts})"
    return f"CASE WHEN len({toks}) >= {n} THEN list_distinct({gram}) ELSE [] END"


def shingles_all(text: Column, n: int = 3) -> Column:
    """Positional (NON-distinct) word n-grams — the total-occurrence
    view :func:`shingles` deliberately collapses. Needed by repetition
    scoring, where (total − distinct) IS the signal. Same one-bind
    lambda trick; same tokenizer."""
    toks = tokens(text)
    if n == 1:
        return toks

    def build(t: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(t) - (n - 1))
        gram = F.transform(
            idx, lambda i: F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(n)])
        )
        return F.when(F.size(t) >= n, gram).otherwise(F.array().cast("array<string>"))

    return F.transform(F.array(toks), build)[0]


def shingles_all_sql(t: str, n: int = 3) -> str:
    """DuckDB mirror of :func:`shingles_all`."""
    toks = f"regexp_split_to_array(lower(trim({t})), '\\s+')"
    if n == 1:
        return toks
    parts = " || ' ' || ".join(f"({toks})[i + {j}]" for j in range(n))
    gram = f"list_transform(generate_series(1, len({toks}) - {n - 1}), i -> {parts})"
    return f"CASE WHEN len({toks}) >= {n} THEN {gram} ELSE [] END"


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


# One md5 per shingle, then n_hashes cheap affine mixes in 30-bit
# space: h_i(s) = (a_i·(md5_long(s) & M) + b_i) & M with odd a_i — a
# bijection on [0, 2^30), the classic universal-hash MinHash family.
# Replaces the old md5(s || '#i') scheme, which re-ran md5 n_hashes
# times per shingle and dominated the LSH query wall (BENCH.md).
# 30-bit operands keep a·h + b < 2^61: no overflow in Spark longs OR
# DuckDB bigints, so the oracle replays it bit-for-bit.
_MASK30 = (1 << 30) - 1


def _mix_consts(i: int) -> tuple[int, int]:
    a = ((0x9E3779B1 * (2 * i + 1)) & _MASK30) | 1
    b = (0x85EBCA6B * (i + 1)) & _MASK30
    return a, b


def _mix_i(i: int):
    # NB: a closure factory, NOT `lambda h, i=i: ...` — PySpark binds a
    # second lambda parameter to the array *index*, shadowing defaults.
    a, b = _mix_consts(i)
    return lambda h: (h * F.lit(a) + F.lit(b)).bitwiseAND(F.lit(_MASK30))


def shingle_hashes(text: Column, shingle_n: int = 2) -> Column:
    """30-bit base hashes of the distinct shingles (one md5 each)."""
    return F.transform(shingles(text, shingle_n), lambda s: md5_long(s).bitwiseAND(F.lit(_MASK30)))


def minhash_signature(
    text: Column, n_hashes: int = 16, shingle_n: int = 2, hash_offset: int = 0
) -> Column:
    """Array of n_hashes minima over mixed shingle hashes.
    ``hash_offset`` selects an independent slice of the universal-hash
    family (lanes hash_offset..hash_offset+n_hashes-1) — two indexes
    built with disjoint offsets are independent capture passes
    (queries.capture_recapture_dups)."""
    hs = shingle_hashes(text, shingle_n)
    return F.array(
        *[F.array_min(F.transform(hs, _mix_i(hash_offset + i))) for i in range(n_hashes)]
    )


def minhash_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 2,
    carry: tuple[str, ...] = (),
    hash_offset: int = 0,
) -> DataFrame:
    """Persistable LSH index rows: (id, sig, band, bucket) — one row per
    (doc, band). Written once per corpus snapshot, this is the stored
    side of :func:`incremental_neardup`: new crawls join against it
    without ever recomputing (or even reading) old text. Band bucket =
    md5_long of the band's joined signature slice. ``carry`` names
    extra input columns to keep on every row (the streaming twin
    carries its event-time column through for the watermarked dedup).
    """
    rows = n_hashes // bands
    # materialize the base shingle hashes once: ONE md5 per shingle,
    # one tokenization pass; the n_hashes signature lanes are cheap
    # integer mixes over the same array
    sh = df.select(
        F.col(id_col).alias("id"),
        shingle_hashes(F.col(text_col), shingle_n).alias("__hs"),
        *carry,
    )
    sig = sh.select(
        "id",
        F.array(
            *[
                F.array_min(F.transform(F.col("__hs"), _mix_i(hash_offset + i)))
                for i in range(n_hashes)
            ]
        ).alias("sig"),
        *carry,
    )
    return sig.select(
        "id",
        "sig",
        *carry,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        md5_long(
                            F.concat_ws(",", *[F.col("sig")[b * rows + r].cast("string") for r in range(rows)])
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", *carry, "bb.band", "bb.bucket")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 2,
    hash_offset: int = 0,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing ≥1 LSH band bucket.

    Band bucket = md5_long of the band's joined signature slice; pairs
    come from a self-equi-join on (band, bucket) — shuffle volume scales
    with bucket occupancy, not |D|². Returns (id_a, id_b, n_bands)
    with id_a < id_b.
    """
    banded = minhash_index(
        df, text_col, id_col, n_hashes, bands, shingle_n, hash_offset=hash_offset
    ).select("id", "band", "bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, on=[F.col("a.band") == F.col("b.band"), F.col("a.bucket") == F.col("b.bucket"), F.col("a.id") < F.col("b.id")])
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_bands"))
    )


def incremental_neardup(
    new_docs: DataFrame,
    old_index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 2,
) -> DataFrame:
    """Snapshot-delta near-dup dedup: decide keep/drop for each NEW doc
    against an EXISTING corpus using only its persisted LSH index
    (:func:`minhash_index` rows (id, sig, band, bucket)) — old text is
    never recomputed or rescanned (VERDICT r2 next-round #5; the plan
    contains no scan of the old corpus beyond the index parquet,
    asserted by tests/test_incremental_dedup.py).

    Shape at 100 TB: new docs hash once; their bands semi-join the
    stored band table on (band, bucket) — shuffle ∝ new-side bands +
    colliding index rows, never the old corpus; verification joins
    signatures (already in the index) for the candidates only.
    Verification = signature lane agreement ≥ half (estimated Jaccard
    ≥ 0.5, deterministic, oracle-replayable; the exact-Jaccard verify
    of near_dedup_decision needs old shingles, which an index that
    stores only signatures deliberately does not keep).

    Returns one row per new doc: (doc_id, keep, dup_of, n_partners)
    where dup_of = smallest verified old id (null when keep). Dedup
    among the new docs themselves composes separately
    (near_dedup_decision on the new slice).
    """
    new_idx = minhash_index(new_docs, text_col, id_col, n_hashes, bands, shingle_n)
    # pairs arrive once per colliding band; countDistinct dedupes
    ver = incremental_neardup_pairs(new_idx, old_index, n_hashes).groupBy("new_id").agg(
        F.min("old_id").alias("dup_of"), F.countDistinct("old_id").alias("n_partners")
    )
    new_sig = new_idx.select(F.col("id").alias("new_id")).distinct()
    return (
        new_sig.join(ver, "new_id", "left")
        .select(
            F.col("new_id").alias(id_col),
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
            F.coalesce(F.col("n_partners"), F.lit(0)).alias("n_partners"),
        )
    )


def incremental_neardup_pairs(
    new_idx: DataFrame, old_index: DataFrame, n_hashes: int = 16
) -> DataFrame:
    """Verified (new_id, old_id) pairs from a new-side minhash_index
    frame against a stored one — the stage shared by the batch decision
    and the streaming twin (streaming/dedup.py): band equi-join, then
    the lane-agreement verify as a per-pair filter (no aggregate, so a
    stream-static join stays stateless up to the final dedup). Pairs
    may appear once per colliding band; callers dedupe (batch: the
    groupBy; streaming: dropDuplicatesWithinWatermark)."""
    new_b = new_idx.select(
        F.col("id").alias("new_id"),
        F.col("sig").alias("sig_n"),
        "band",
        "bucket",
        *[c for c in new_idx.columns if c not in ("id", "sig", "band", "bucket")],
    )
    old_b = old_index.select(
        F.col("id").alias("old_id"), F.col("sig").alias("sig_o"), "band", "bucket"
    )
    agree = F.aggregate(
        F.zip_with("sig_n", "sig_o", lambda a, b: (a == b).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        new_b.join(old_b, ["band", "bucket"])
        .withColumn("__agree", agree)
        .filter(2 * F.col("__agree") >= n_hashes)
        .drop("band", "bucket", "sig_n", "sig_o", "__agree")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: Column, shingle_n: int = 1, bits: int = 32) -> Column:
    """SimHash over shingle hashes: bit b of the fingerprint is the sign
    of Σ_tokens (±1 per token's hash bit b). JVM-only via aggregate.

    The hash array is lambda-bound once (same inlining hazard as
    :func:`shingles` — 32 per-bit aggregates would otherwise each
    re-run the tokenize+md5 chain, BENCH.md "expression inlining").
    """
    sh = shingles(text, shingle_n)
    hashes = F.transform(sh, lambda s: md5_long(s))

    def _vote(b: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    def build(hs: Column) -> Column:
        out = F.lit(0).cast("long")
        for b in range(bits):
            vote = F.aggregate(hs, F.lit(0).cast("long"), _vote(b))
            out = out + F.when(vote > 0, F.lit(2 ** b).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        return out

    return F.transform(F.array(hashes), build)[0]


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_dup_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3, bits: int = 32
) -> DataFrame:
    """Near-dup pairs by SimHash: block on the two 16-bit halves (a pair
    within hamming ≤ 3 of 32 bits shares at least one half exactly),
    then verify hamming distance — the classic Charikar blocking."""
    half = bits // 2
    sigs = df.select(F.col(id_col).alias("id"), simhash64(F.col(text_col), bits=bits).alias("sig"))
    blocks = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("part"), (F.col("sig") % F.lit(2 ** half)).alias("blk")),
                F.struct(F.lit(1).alias("part"), F.shiftright(F.col("sig"), half).alias("blk")),
            )
        ).alias("pb"),
    ).select("id", "sig", "pb.part", "pb.blk")
    a, b = blocks.alias("a"), blocks.alias("b")
    return (
        a.join(b, on=[F.col("a.part") == F.col("b.part"), F.col("a.blk") == F.col("b.blk"), F.col("a.id") < F.col("b.id")])
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), hamming64(F.col("a.sig"), F.col("b.sig")).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------


def jaccard_topk(
    df: DataFrame,
    query_ids: list[int],
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 1,
    k: int = 1,
) -> DataFrame:
    """Top-k most similar docs per query doc by shingle-set Jaccard.

    Inverted-index shape: explode shingles → self-join on shingle →
    count common → jaccard = common / (|A| + |B| − common). Exact
    rational arithmetic (int counts, one double divide) → the DuckDB
    oracle reproduces values bit-for-bit. Tie-break (jaccard desc,
    other id asc) makes top-k deterministic.
    """
    base = df.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), shingle_n).alias("sh")
    ).withColumn("sz", F.size("sh"))
    inv = base.select("id", "sz", F.explode("sh").alias("s"))
    q = inv.filter(F.col("id").isin(query_ids)).withColumnRenamed("id", "q_id").withColumnRenamed("sz", "q_sz")
    pairs = (
        q.join(inv, on="s")
        .filter(F.col("id") != F.col("q_id"))
        .groupBy("q_id", "q_sz", "id", "sz")
        .agg(F.count("*").alias("common"))
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("q_sz") + F.col("sz") - F.col("common")).cast("double"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("jaccard").desc(), F.col("id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("id").alias("match_id"), "jaccard", "rank")
    )


def containment_pairs(
    df: DataFrame,
    tau: float,
    max_df: int,
    min_shingles: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 2,
) -> DataFrame:
    """Asymmetric shingle containment — the quote/inclusion detector
    Jaccard misses: C(a→b) = |S_a ∩ S_b| / |S_a| stays high when a
    short doc is pasted inside a long one even though their Jaccard is
    tiny. Emits ordered pairs with C ≥ tau.

    Scale shape: the pair set is the inverted-index self-join — shuffle
    ∝ Σ posting_len², NOT |docs|² — and posting lists are bounded
    *before* the join by the stop-shingle rule: shingles appearing in
    more than ``max_df`` docs are dropped from the index (the standard
    boilerplate-shingle cut; at corpus scale the hot shingle IS
    boilerplate and carries no containment signal). Containment is
    therefore defined over the CAPPED shingle set (denominator = kept
    set size, docs with < ``min_shingles`` kept shingles skipped) —
    deterministic, and replayed exactly by the oracle: integer counts,
    one double divide.

    Returns (doc_a, doc_b, sz_a, common, containment) with doc_a ≠
    doc_b — C(a→b) and C(b→a) are different rows.
    """
    base = df.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), shingle_n).alias("sh")
    )
    inv = base.select("id", F.explode("sh").alias("s"))
    kept_s = inv.groupBy("s").agg(F.count("*").alias("df_cnt")).filter(
        F.col("df_cnt") <= max_df
    )
    kept = inv.join(kept_s.select("s"), "s")
    sz = kept.groupBy("id").agg(F.count("*").cast("long").alias("sz")).filter(
        F.col("sz") >= min_shingles
    )
    a = kept.join(sz, "id").select(
        F.col("id").alias("doc_a"), F.col("sz").alias("sz_a"), "s"
    )
    b = kept.join(sz.select("id"), "id").select(F.col("id").alias("doc_b"), "s")
    return (
        a.join(b, "s")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "sz_a")
        .agg(F.count("*").cast("long").alias("common"))
        .withColumn(
            "containment", F.col("common").cast("double") / F.col("sz_a").cast("double")
        )
        .filter(F.col("containment") >= tau)
        .select("doc_a", "doc_b", "sz_a", "common", "containment")
    )


def prefix_filter_jaccard(
    df: DataFrame,
    tau_pct: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """All-pairs set-similarity join with PPJoin-style prefix filtering.

    Finds every pair with shingle-set Jaccard ≥ tau_pct/100 WITHOUT the
    full inverted-index pair explosion: shingles are globally ordered by
    (document frequency asc, shingle asc) — rarest first — and a pair can
    reach the threshold only if the two docs share a shingle inside each
    other's PREFIX of length |s| − ⌈τ|s|⌉ + 1 (pigeonhole on the overlap
    bound ⌈τ/(1+τ)·(|a|+|b|)⌉ relaxed to the per-set form). Candidate
    generation therefore joins only the prefix postings — for high τ the
    prefix is a small head of rare shingles, so the candidate count
    collapses versus the full postings join (the PPJoin trick, Xiao et
    al. 2008). A length filter (τ|a| ≤ |b| ≤ |a|/τ) prunes further.
    Verification is exact and JVM-side: array_intersect on the two
    distinct shingle arrays, then the rational Jaccard test — integer
    cross-multiplied (100·common ≥ τ_pct·union) so the FILTER is exact
    and engine-independent; the reported jaccard double is one exact
    IEEE division. tau_pct is an integer percentage to keep the
    threshold arithmetic integer-exact.

    100-TB shape: one shingle-df agg (shuffle ∝ corpus shingles), one
    prefix-postings self-join (shuffle ∝ prefix postings², bounded by
    rare-shingle df), one id-keyed join back for verification — never
    |D|² and never a full postings self-join.
    """
    tau = tau_pct / 100.0
    base = df.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), shingle_n).alias("sh")
    ).withColumn("sz", F.size("sh"))
    inv = base.select("id", "sz", F.explode("sh").alias("s"))
    dfreq = inv.groupBy("s").agg(F.count("*").alias("df"))
    # prefix length p = sz − ⌈τ·sz⌉ + 1 (integer: ⌈τ·sz⌉ = (τ_pct·sz + 99) div 100)
    pref = (
        inv.join(dfreq, "s")
        .groupBy("id", "sz")
        .agg(F.array_sort(F.collect_list(F.struct("df", "s"))).alias("ordered"))
        .select(
            "id",
            "sz",
            F.explode(
                F.slice(
                    F.col("ordered").getField("s"),
                    1,
                    F.greatest(
                        F.lit(1),
                        (
                            F.col("sz")
                            - F.expr(f"cast((sz * {tau_pct} + 99) div 100 as int)")
                            + F.lit(1)
                        ),
                    ),
                )
            ).alias("s"),
        )
    )
    a = pref.select(F.col("id").alias("id_a"), F.col("sz").alias("sza"), "s")
    b = pref.select(F.col("id").alias("id_b"), F.col("sz").alias("szb"), "s")
    cand = (
        a.join(b, "s")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("szb") * 100 >= F.col("sza") * tau_pct)
            & (F.col("sza") * 100 >= F.col("szb") * tau_pct)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    av = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), F.col("sz").alias("sza"))
    bv = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), F.col("sz").alias("szb"))
    verified = (
        cand.join(av, "id_a")
        .join(bv, "id_b")
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")).cast("long"))
        .withColumn("uni", (F.col("sza") + F.col("szb") - F.col("common")).cast("long"))
        .filter(F.col("common") * 100 >= F.col("uni") * tau_pct)
    )
    return verified.select(
        "id_a",
        "id_b",
        F.col("common"),
        F.col("sza").cast("long").alias("sza"),
        F.col("szb").cast("long").alias("szb"),
        (F.col("common").cast("double") / F.col("uni").cast("double")).alias("jaccard"),
    )
