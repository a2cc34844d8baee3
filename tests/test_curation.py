"""Property tests for the training-data curation / mixing queries.

The DuckDB oracle already checks bit-exactness end-to-end; these tests
pin the *semantics* independently of SQL: sampling membership is
re-derived with hashlib, TF-IDF with collections.Counter, polygon
metrics with exact Python-int shoelace — three implementations that
share no code with either engine.
"""

import hashlib
import math
from collections import Counter

import pytest

from gipspark.queries import (
    MIX_RATES_BP,
    ORACLE_POLYGONS,
    _MIX_DEFAULT_BP,
    REGISTRY,
)


def _run(spark, sf_dir, name):
    fn, _ = REGISTRY[name]
    return fn(spark, sf_dir)


def _md5_bucket(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 10000


def test_stratified_sample_matches_hashlib(spark, sf_dir):
    docs = {
        r.doc_id: r.lang
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang").collect()
    }
    expected = {
        (did, lang, _md5_bucket(did))
        for did, lang in docs.items()
        if _md5_bucket(did) < MIX_RATES_BP.get(lang, _MIX_DEFAULT_BP)
    }
    got = {(r.doc_id, r.lang, r.bucket) for r in _run(spark, sf_dir, "stratified_sample_docs").collect()}
    assert got == expected
    assert len(got) > 0


def test_stratified_sample_rate_is_exactly_mix_table(spark, sf_dir):
    # every kept bucket respects its language's rate; no lang exceeds it
    for r in _run(spark, sf_dir, "stratified_sample_docs").collect():
        assert r.bucket < MIX_RATES_BP.get(r.lang, _MIX_DEFAULT_BP)


def test_quality_cap_structure(spark, sf_dir):
    rows = _run(spark, sf_dir, "quality_cap_per_source").collect()
    per_src = {}
    for r in rows:
        per_src.setdefault(r.source, []).append(r)
    n_docs_by_src = Counter(
        r.source for r in spark.read.parquet(f"{sf_dir}/documents.parquet").select("source").collect()
    )
    for src, grp in per_src.items():
        grp.sort(key=lambda r: r.qrank)
        assert len(grp) == min(10, n_docs_by_src[src])
        assert [r.qrank for r in grp] == list(range(1, len(grp) + 1))
        # descending quality with doc_id tie-break
        for a, b in zip(grp, grp[1:]):
            assert (a.q, -a.doc_id) >= (b.q, -b.doc_id)
    assert set(per_src) == set(n_docs_by_src)


def test_tfidf_matches_counter_reference(spark, sf_dir):
    import re

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    ).collect()
    word = re.compile(r"^[a-z]{3,}$")
    df_c: Counter = Counter()
    tf_c: Counter = Counter()
    for r in docs:
        toks = [t for t in r.text.strip().lower().split() if word.match(t)]
        for t in set(toks):
            df_c[t] += 1
        for t in toks:
            tf_c[(r.source, t)] += 1
    n = len(docs)
    best = {}
    for (src, term), tf in tf_c.items():
        score = float(tf) * n / df_c[term]
        best.setdefault(src, []).append((-score, term, tf, df_c[term]))
    expected = set()
    for src, lst in best.items():
        for rnk, (neg, term, tf, df) in enumerate(sorted(lst)[:5], start=1):
            expected.add((src, term, tf, df, -neg, rnk))
    got = {
        (r.source, r.term, r.tf, r.df, r.score, r.rnk)
        for r in _run(spark, sf_dir, "tfidf_top_terms").collect()
    }
    assert got == expected


def _exact_shoelace(poly):
    a2 = nx = ny = 0
    n_edges = 0
    for ring in poly["rings"]:
        for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
            x1u, y1u, x2u, y2u = (round(v * 1e6) for v in (x1, y1, x2, y2))
            cr = x1u * y2u - x2u * y1u
            a2 += cr
            nx += (x1u + x2u) * cr
            ny += (y1u + y2u) * cr
            n_edges += 1
    return a2, nx, ny, n_edges


def test_polygon_metrics_exact_reference(spark, sf_dir):
    got = {r.poly_id: r for r in _run(spark, sf_dir, "polygon_metrics").collect()}
    assert set(got) == {p["poly_id"] for p in ORACLE_POLYGONS}
    for p in ORACLE_POLYGONS:
        a2, nx, ny, n_edges = _exact_shoelace(p)
        r = got[p["poly_id"]]
        assert r.n_edges == n_edges
        # identical final-op replay: double(a2)/2e12 etc.
        assert r.area_deg2 == abs(float(a2)) / 2e12
        assert r.cx == float(nx) / (3.0 * float(a2)) / 1e6
        assert r.cy == float(ny) / (3.0 * float(a2)) / 1e6
        assert r.perimeter_m > 0
        # centroid must sit inside the polygon's bounding box
        xs = [v[0] for ring in p["rings"] for v in ring]
        ys = [v[1] for ring in p["rings"] for v in ring]
        assert min(xs) <= r.cx <= max(xs)
        assert min(ys) <= r.cy <= max(ys)


def test_polygon_metrics_hole_subtracts(spark, sf_dir):
    # poly 3 has a hole: its area must be strictly less than the outer
    # ring's area alone
    outer_only = {"poly_id": 3, "rings": [ORACLE_POLYGONS[3]["rings"][0]]}
    a2_outer, *_ = _exact_shoelace(outer_only)
    got = {r.poly_id: r for r in _run(spark, sf_dir, "polygon_metrics").collect()}
    assert got[3].area_deg2 < abs(a2_outer) / 2e12
    # and the perimeter includes both rings (longer than outer alone)
    hav = _ring_perimeter(outer_only["rings"][0])
    assert got[3].perimeter_m > hav


def _ring_perimeter(ring):
    total = 0
    R = 6371000.0
    for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
        p1, l1, p2, l2 = (math.radians(v) for v in (y1, x1, y2, x2))
        a = math.sin((p2 - p1) / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin((l2 - l1) / 2) ** 2
        total += round(2 * R * math.asin(math.sqrt(a)))
    return total


def test_sampling_is_partitioning_invariant(spark, sf_dir):
    # same rows regardless of input partitioning (hash-membership, no rand())
    df1 = _run(spark, sf_dir, "stratified_sample_docs")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(13)
    docs.createOrReplaceTempView("_tmp_unused")  # keep lineage distinct
    got1 = sorted((r.doc_id, r.lang, r.bucket) for r in df1.collect())
    got2 = sorted((r.doc_id, r.lang, r.bucket) for r in df1.repartition(7).collect())
    assert got1 == got2


def test_ngram_decontaminate_reference(spark, sf_dir):
    from gipspark.queries import _DECON_BENCH_DOCS, _DECON_N

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text").collect()
    toks = {r.doc_id: r.text.strip().lower().split() for r in docs}
    bench = {
        " ".join(t[:_DECON_N])
        for did, t in toks.items()
        if did < _DECON_BENCH_DOCS and len(t) >= _DECON_N
    }
    expected = {}
    for did, t in toks.items():
        grams = {" ".join(t[i : i + _DECON_N]) for i in range(len(t) - _DECON_N + 1)}
        hits = len(grams & bench)
        if hits:
            expected[did] = hits
    got = {r.doc_id: r.n_hits for r in _run(spark, sf_dir, "ngram_decontaminate").collect()}
    assert got == expected
    # benchmark docs with enough tokens must self-hit
    for did in range(_DECON_BENCH_DOCS):
        if len(toks.get(did, [])) >= _DECON_N:
            assert did in got


def test_mixture_upsample_counts(spark, sf_dir):
    from gipspark.queries import UPSAMPLE_FACTORS

    langs = {
        r.doc_id: r.lang
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang").collect()
    }
    rows = _run(spark, sf_dir, "mixture_upsample_docs").collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.copy)
    assert set(per_doc) == set(langs)
    for did, copies in per_doc.items():
        k = UPSAMPLE_FACTORS.get(langs[did], 1)
        assert sorted(copies) == list(range(1, k + 1))


def test_embedding_norm_stats_fold_reference(spark, sf_dir):
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("label", "embedding").collect()
    agg = {}
    for r in embs:
        acc = 0.0
        for x in r.embedding:
            acc = acc + float(x) * float(x)  # same sequential fold order
        t = round(acc * 1000000)
        n, s, lo, hi = agg.get(r.label, (0, 0, None, None))
        agg[r.label] = (
            n + 1,
            s + t,
            t if lo is None else min(lo, t),
            t if hi is None else max(hi, t),
        )
    got = {
        r.label: (r.n_vecs, r.sum_norm2_ticks, r.min_norm2_ticks, r.max_norm2_ticks)
        for r in _run(spark, sf_dir, "embedding_norm_stats").collect()
    }
    assert got == agg


def test_trajectory_stats_reference(spark, sf_dir):
    from gipspark.functions.cells import LAT_MOD, LAT_MUL, LON_MOD, LON_MUL

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id", "ts", "event_id").collect()
    per_user = {}
    for r in ev:
        per_user.setdefault(r.user_id, []).append((r.ts, r.event_id))
    expected = {}
    for uid, fixes in per_user.items():
        fixes.sort()
        steps = []
        prev = None
        for ts, eid in fixes:
            lat = ((eid * LAT_MUL) % LAT_MOD) / 1000.0 - 60.0
            lon = ((eid * LON_MUL) % LON_MOD) / 1000.0 - 180.0
            if prev is not None:
                steps.append(round(_hav_m(prev[0], prev[1], lat, lon)))
            prev = (lat, lon)
        expected[uid] = (len(fixes), sum(steps), max(steps) if steps else 0)
    got = {
        r.user_id: (r.n_events, r.path_m, r.max_step_m)
        for r in _run(spark, sf_dir, "trajectory_user_stats").collect()
    }
    assert got == expected


def _hav_m(lat1, lon1, lat2, lon2):
    R = 6371000.0
    p1, l1, p2, l2 = (math.radians(v) for v in (lat1, lon1, lat2, lon2))
    a = math.sin((p2 - p1) / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin((l2 - l1) / 2) ** 2
    return 2 * R * math.asin(math.sqrt(a))


def test_funnel_reference(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id", "ts", "event_type").collect()
    per_user = {}
    for r in ev:
        per_user.setdefault(r.user_id, []).append((r.ts, r.event_type))
    n_users = len(per_user)
    nv = nc = np_ = 0
    click_lag = purchase_lag = 0
    for uid, evs in per_user.items():
        views = [t for t, ty in evs if ty == "view"]
        v = min(views) if views else None
        c = p = None
        if v is not None:
            nv += 1
            clicks = [t for t, ty in evs if ty == "click" and t >= v]
            c = min(clicks) if clicks else None
        if c is not None:
            nc += 1
            click_lag += int((c - v).total_seconds() * 1_000_000)
            purchases = [t for t, ty in evs if ty == "purchase" and t >= c]
            p = min(purchases) if purchases else None
        if p is not None:
            np_ += 1
            purchase_lag += int((p - c).total_seconds() * 1_000_000)
    row = _run(spark, sf_dir, "funnel_view_click_purchase").collect()[0]
    assert (row.n_users, row.n_viewed, row.n_clicked, row.n_purchased) == (n_users, nv, nc, np_)
    assert (row.click_lag_us, row.purchase_lag_us) == (click_lag, purchase_lag)
    assert n_users >= nv >= nc >= np_ > 0  # the fixture exercises every stage


def test_concurrency_sweep_reference(spark, sf_dir):
    import datetime

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("ts").collect()
    marks = {}
    for r in ev:
        day = r.ts.date()
        marks.setdefault(day, []).append((r.ts, 1))
        marks[day].append((r.ts + datetime.timedelta(minutes=15), -1))
    expected = {}
    for day, ms in marks.items():
        ms.sort(key=lambda m: (m[0], m[1]))
        acc = best = 0
        for _, d in ms:
            acc += d
            best = max(best, acc)
        expected[day] = best
    got = {r.day: r.max_concurrent for r in _run(spark, sf_dir, "concurrent_sessions_daily").collect()}
    assert got == expected


def test_containment_asymmetric_inclusion(spark):
    # a short doc pasted verbatim inside a long one: containment
    # (short → long) == 1.0 while Jaccard is small; reverse direction
    # well below tau; stop-shingle cap drops boilerplate shared by all
    from gipspark.operators.dedup import containment_pairs

    boiler = "copyright footer terms apply all rights reserved"
    short = "quantum ducks navigate rivers using starlight and maps"
    long_extra = " ".join(f"filler{i} token{i}" for i in range(40))
    rows = [
        (1, short + " " + boiler),
        (2, long_extra + " " + short + " " + boiler),
        (3, "totally unrelated text about gardening tomatoes " + boiler),
        (4, "another unrelated entry on bicycle maintenance " + boiler),
        (5, "more unrelated words concerning pottery glazing " + boiler),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): (r.sz_a, r.common, r.containment)
        for r in containment_pairs(df, tau=0.5, max_df=3, min_shingles=3, shingle_n=2).collect()
    }
    # short→long fully contained (over kept shingles)
    assert (1, 2) in got
    sz_a, common, c = got[(1, 2)]
    assert c == 1.0 and common == sz_a
    # long→short NOT ≥ 0.5 (the asymmetry)
    assert (2, 1) not in got
    # unrelated docs share only boilerplate, which the df-cap drops
    assert not any(a == 3 or b == 3 for a, b in got)
