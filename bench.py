"""Benchmark runner — prints ONE JSON line (driver contract).

Headline metric: the north_star pipeline (scan → extract/geotag →
S2/H3 encode → PIP join → tile assign) in docs/sec over the synthetic
Common-Crawl-style table at a size proportional to the scale factor,
plus per-query timings over the driver tables, plus the two-cluster-size
scaling evidence (same job at local[N/4] and local[N] — the sandbox
surrogate for N vs 4N executors, BASELINE.md protocol).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     GIPSPARK_BENCH_DOCS (override doc count),
     GIPSPARK_BENCH_SCALING=0 to skip the scaling runs.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
N_DOCS = int(os.environ.get("GIPSPARK_BENCH_DOCS", str(int(10_000_000 * SF))))
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_top_orders",
    "broadcast_dim_join",
    "window_rank_orders",
    "tumbling_window_counts",
    "tile_assign_customers",
    "pip_join_customers",
    "knn_join_nations",
    "skew_salted_join",
    "inventory_matrix",
    "asof_purchase_click",
    "dedup_exact_docs",
    "minhash_lsh_pairs",
    "jaccard_top1_docs",
    "cosine_topk_bruteforce",
    "q5_local_supplier_volume",
    "near_dedup_decision",
    "grouping_sets_inventory",
    "stratified_sample_docs",
    "tfidf_top_terms",
    "repetition_filter_docs",
    "nearest_edge_customers",
    "heatmap_smooth_events",
    "s2_pyramid_rollup",
    "funnel_view_click_purchase",
    "pagerank_doc_links",
    "triangle_count_links",
    "inverted_index_terms",
    "geofence_transitions",
    "bloom_semi_join_orders",
    "cms_heavy_hitters_terms",
    "bbox_join_customers",
    "crawl_diff_snapshots",
    "pii_scrub_docs",
    "colocation_pairs_events",
    "segment_crossing_events",
    "merge_intervals_sessions",
    "morans_i_tiles",
    "snap_to_edge_customers",
    "idw_interpolate_probes",
    "resolve_redirect_chains",
    "hits_hub_auth_links",
    "zorder_cluster_customers",
    "hll_pyramid_contract",
    "od_matrix_daily",
    "twa_value_user",
    "skyline_customers",
    # round 3
    "incremental_neardup_decision",
    "chunk_dedup_docs",
    "kmeans_int_customers",
    "khop_cheapest_doc_links",
    "quadkey_pyramid_customers",
    "raster_gradient_cells",
    "vocab_coverage_docs",
    "dwell_cells_user",
    "map_match_smooth_events",
    "fuzzy_title_join",
    # round-4 additions: iterative closure, scanline raster, all-source
    # graph relax, deferred-acceptance matching, Apriori, gazetteer join
    "flow_accumulation_cells",
    "viewshed_scanline_cells",
    "harmonic_centrality_links",
    "capacity_matching_customers",
    "frequent_triples_docs",
    "toponym_resolution_docs",
    # round-4 session-2 additions: closed-form raster, per-bucket DP
    # packing, double-LSH capture-recapture, corpus-wide trigram df
    "line_density_cells",
    "pack_sequences_docs",
    "capture_recapture_dups",
    "boilerplate_ratio_hosts",
    # round-4 session-4 additions: deletion-neighborhood + simhash-search
    # blocking, unrolled iterative ops (Sinkhorn, power iteration, peel,
    # deferred acceptance), reverse-kNN, forward-fill attribution
    "symspell_match_docs",
    "simhash_hamming_pairs",
    "ipf_od_balance",
    "power_iteration_embeddings",
    "gale_shapley_match",
    "densest_peel_links",
    "multitouch_attribution_users",
    "rknn_influence_suppliers",
    # round-4 session-3 representatives
    "voptimal_histogram_orders",
    "lsh_pr_contract",
    "markov_attribution_channels",
    "holt_trend_cells",
    "cost_distance_cells",
    "pq_codebook_contract",
    # round-4 session-6 representatives: register-propagation sketch,
    # ordered-fold recursion, 3-layout file skipping, temporal BFS,
    # reused-pair-list 2SFCA, array-HOF canonicalization
    "hyperanf_links",
    "kalman_smooth_daily",
    "spatial_zonemap_audit",
    "temporal_reachability_users",
    "fca_accessibility_customers",
    "mobility_motifs_users",
    # round-5 representatives: learned-BPE family, PQ/IVFPQ search,
    # polygon-hygiene contracts, geohash neighbors, perimeter scaling,
    # watermark planning, curation budget cut, dedup spectrum
    "bpe_merge_token_counts",
    "bpe_vocab_curve",
    "pq_cosine_topk",
    "ivfpq_cosine_topk",
    "heaps_law_docs",
    "polyline_varint_users",
    "rle_raster_audit",
    "geohash_neighbors_contract",
    "oov_bigram_rate_docs",
    "dedup_cluster_size_census",
    "perimeter_scaling_census",
    "watermark_planning_census",
    "region_adjacency_pairs",
    "token_budget_select",
    "winsorized_mean_orders",
    "distance_approx_error_census",
    "ranker_agreement_contract",
    "windowed_bpe_token_rate",
    "fill_rule_contract",
    "ring_orientation_census",
    "pip_degenerate_contract",
]


def make_spark(cores: int):
    from gipspark import get_spark

    # session defaults carry the tuned pipeline config: task_cpus=1 +
    # 16k-row Arrow batches so each task's JVM thread and python worker
    # pipeline instead of running in lockstep (BENCH.md "arrow batch
    # pipelining"; measured 2.2× on the enrich stage at local[32])
    return get_spark(
        f"bench{cores}",
        parallelism=cores,
        extra={"spark.ui.showConsoleProgress": "false"},
    )


def ensure_docs(spark, n: int) -> str:
    """Generate (once) the deterministic doc table at ``n`` rows."""
    from gipspark.sources.fixtures import docs_df

    path = os.path.join(CACHE, f"docs_{n}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        shutil.rmtree(path, ignore_errors=True)
        docs_df(spark, n, partitions=CPUS * 2).write.mode("overwrite").parquet(path)
    return path


def run_pipeline_once(spark, docs_path: str) -> tuple[float, int]:
    """One timed end-to-end pass; returns (wall_s, rows_in)."""
    from pyspark.sql import functions as F

    from gipspark.operators.pip import pip_join
    from gipspark.plans.pipeline import enrich_docs
    from gipspark.queries import ORACLE_POLYGONS
    from gipspark.sources.fixtures import polygons

    # fixture zones + the big oracle polygons, re-keyed to avoid id clash
    polyset = polygons(50) + [
        {**p, "poly_id": 100 + p["poly_id"]} for p in ORACLE_POLYGONS
    ]
    docs = spark.read.parquet(docs_path)
    t0 = time.time()
    enriched = enrich_docs(docs).filter(F.col("lat").isNotNull())
    matched = pip_join(enriched, polyset, cell_col="cell")
    out = matched.groupBy("tile_id", "poly_id").agg(F.count("*").alias("n"))
    out.write.mode("overwrite").format("noop").save()
    wall = time.time() - t0
    return wall, docs.count()


def main() -> None:
    result: dict = {"metric": "e2e_pipeline_sec", "unit": "sec", "sf": SF}
    spark = make_spark(CPUS)

    docs_path = ensure_docs(spark, N_DOCS)

    # headline: warmup (python-worker spawn, codegen, cover cache) then
    # best of 2 timed passes — the steady-state number a long-running
    # cluster job would see
    run_pipeline_once(spark, docs_path)
    walls = []
    rows = N_DOCS
    for _ in range(4):  # best-of-4: the microVM host is bimodal —
        w, rows = run_pipeline_once(spark, docs_path)  # multi-minute
        walls.append(w)  # throttled windows alternate with clean ones
    wall = min(walls)
    result["value"] = round(wall, 3)
    result["docs"] = rows
    result["docs_per_sec"] = round(rows / wall, 1)
    # every wall, not just the min: lets a reader see whether this run
    # landed in a throttled host window (BENCH.md "environment ceiling")
    result["headline_walls"] = [round(w, 2) for w in walls]

    # per-query timings at the driver sf dir
    from gipspark.queries import REGISTRY

    qtimes: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn, _ = REGISTRY[name]
        best = float("inf")
        for _ in range(2):  # min-of-2: the host throttles bursty load
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        qtimes[name] = round(best, 3)
    result["queries"] = qtimes

    # scaling evidence (BASELINE.md protocol): same job, same input, at
    # N and 4N cores. Primary pair = local[2] -> local[8]: within the
    # box's memory-bandwidth/host-scheduling envelope, so it isolates
    # the *engine's* scaling (a real 4N-executor cluster adds memory
    # buses with its cores; a single box does not). local[CPUS] is also
    # reported -- it shows the documented single-box ceiling (BENCH.md).
    if os.environ.get("GIPSPARK_BENCH_SCALING", "1") != "0" and CPUS >= 8:
        # 4× the headline input for the scaling pair: after the arrow-
        # pipelining fix the engine clears 1M docs in ~5 s at local[8],
        # which is inside this host's noise floor (bimodal walls under
        # microVM pressure, BENCH.md). Input is identical at every
        # level — only wall times long enough to average over the noise.
        scale_docs_path = ensure_docs(spark, 4 * N_DOCS)
        spark.stop()
        levels = [2, 8] + ([CPUS] if CPUS > 8 else [])
        thr = {}
        all_walls: dict[int, list[float]] = {c: [] for c in levels}
        n_rows = 0
        # INTERLEAVED rounds — (2, 8, 32), (2, 8, 32) — not (2,2),(8,8),
        # (32,32): this host's throttle windows last minutes (memory:
        # bench bimodality), so consecutive same-level reps let one bad
        # window poison exactly one level and crater the ratio (observed
        # 2→8 eff 0.337 in a throttled window vs 0.88–1.06 pinned-clean).
        # Interleaving applies the repo's same-window A/B discipline to
        # the scaling pair itself: every level samples every window, and
        # the per-level min is taken across rounds.
        for round_i in range(2):
            for cores in levels:
                time.sleep(10)  # cooldown: decouple from the previous
                # level's sustained load (host throttle hysteresis)
                # Each measurement runs in a FRESH SUBPROCESS pinned to
                # exactly `cores` physical cores BEFORE the JVM spawns
                # (the gateway JVM outlives spark.stop(), so in-process
                # affinity changes never reach it). In local mode python
                # workers run outside the slot count, so an unpinned
                # local[2] silently uses ~4+ cores of the box —
                # inflating the small-N baseline and depressing the
                # N→4N ratio. Pinning makes local[N] a true N-core
                # machine (the faithful surrogate for an N-core
                # executor) and collapses wall variance from ±20% to
                # ±3% (idle cores no longer absorb host noise
                # asymmetrically).
                import subprocess

                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--scale-level", str(cores), scale_docs_path],
                    capture_output=True,
                    text=True,
                    timeout=1800,
                )
                if proc.returncode != 0:
                    raise RuntimeError(
                        f"scale-level child (cores={cores}) exited rc={proc.returncode}; "
                        f"stderr tail: {proc.stderr[-2000:]}"
                    )
                json_lines = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")]
                if not json_lines:
                    raise RuntimeError(
                        f"scale-level child (cores={cores}) emitted no JSON; "
                        f"stdout tail: {proc.stdout[-500:]}; stderr tail: {proc.stderr[-2000:]}"
                    )
                child = json.loads(json_lines[-1])
                all_walls[cores].extend(child["walls"])
                n_rows = child["n"]
        for cores in levels:
            thr[cores] = n_rows / min(all_walls[cores])
        scaling = {f"docs_per_sec_local{c}": round(thr[c], 1) for c in levels}
        scaling["walls"] = {f"local{c}": all_walls[c] for c in levels}
        scaling["cores_ratio"] = 4
        scaling["efficiency"] = round((thr[8] / thr[2]) / 4, 3)
        if CPUS in thr and CPUS > 8:
            scaling[f"efficiency_8to{CPUS}"] = round((thr[CPUS] / thr[8]) / (CPUS / 8), 3)
        result["scaling"] = scaling

    print(json.dumps(result))


def _scale_level_child(cores: int, docs_path: str) -> None:
    """One pinned scaling-level measurement (subprocess entry).

    Affinity is set BEFORE any JVM exists, so the gateway JVM and every
    python worker it forks inherit the N-core restriction. SYMMETRIC
    protocol across levels: 1 warmup + 1 measured pass per child; the
    parent interleaves two rounds over all levels and takes each
    level's min across rounds, so a minutes-long host-throttle window
    hits every level, not one (the same-window A/B discipline applied
    to scaling). Prints one JSON line.
    """
    os.sched_setaffinity(0, set(sorted(os.sched_getaffinity(0))[:cores]))
    s = make_spark(cores)
    run_pipeline_once(s, docs_path)  # warmup: workers, codegen, covers
    w, n = run_pipeline_once(s, docs_path)
    s.stop()
    print(json.dumps({"walls": [round(w, 2)], "n": n}))


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--scale-level":
        _scale_level_child(int(sys.argv[2]), sys.argv[3])
    else:
        main()
