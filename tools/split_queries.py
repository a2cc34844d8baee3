"""One-shot refactor: split gipspark/queries.py into a package.

Layout produced (VERDICT r4 next-round #3):

- gipspark/queries/_base.py   — the prelude: REGISTRY, register(),
  oracle SQL building blocks, shared constants, imports.
- gipspark/queries/_shared.py — every non-query top-level helper that
  was interleaved between register blocks, in original order (their
  relative order carries definition dependencies).
- gipspark/queries/<family>.py — the @register blocks, grouped by
  name-keyword family, each with explicit imports of exactly the
  _base/_shared names its blocks use (computed by free-variable
  analysis, over-approximation filtered by availability).
- gipspark/queries/__init__.py — imports every module (filling
  REGISTRY) and re-exports the union namespace so every existing
  `from gipspark.queries import X` keeps working unchanged.

Also drops the two EARLIER duplicate register blocks
(jl_projection_contract, ktruss_links) whose later registrations
shadowed them (ADVICE r4 #3) — behavior is unchanged because the
later definition already won.
"""

from __future__ import annotations

import ast
import builtins
import collections
import os
import sys

SRC = "/root/repo/gipspark/queries.py"
PKG = "/root/repo/gipspark/queries"

FAMILIES: list[tuple[str, list[str]]] = [
    # (module name, name keywords — first match wins)
    ("tpch", ["q1_", "q2_", "q3_", "q4_", "q5_", "q6_", "q7_", "q8_", "q9_",
              "q10_", "q11_", "q12_", "q13_", "q14_", "q15_", "q16_", "q17_",
              "q18_", "q19_", "q20_", "q21_", "q22_"]),
    ("dedup", ["dedup", "minhash", "simhash", "lsh", "jaccard", "fuzzy",
               "symspell", "shingle", "neardup", "duplicate", "containment",
               "capture_recapture", "exact_dup", "chunk_dup"]),
    ("similarity", ["cosine", "ann_", "ivf", "pq_", "embedding", "triplet",
                    "jl_projection", "quantization", "int8", "knn_text",
                    "vector", "centroid"]),
    ("geo_cells", ["tile", "cell", "h3", "s2_", "geohash", "quadkey",
                   "zorder", "hilbert", "kring", "grid_", "lattice",
                   "raster", "zonemap", "viewshed", "hillshade", "terrain",
                   "dasymetric", "zonal"]),
    ("geo_join", ["pip_", "polygon", "bbox", "knn_", "within", "catchment",
                  "geofence", "toponym", "gazetteer", "spatial", "snap_",
                  "idw", "voronoi", "overlay", "geotag", "antimeridian",
                  "rknn", "reverse_geocode"]),
    ("geo_stats", ["morans", "moran", "geary", "ripley", "getis", "gi_star",
                   "knox", "quadrat", "join_count", "semivariogram",
                   "kernel_density", "hotspot", "colocation", "ffunction",
                   "gfunction", "cross_k", "nearest_neighbor_index"]),
    ("trajectory", ["trajectory", "dwell", "od_matrix", "map_match", "trip",
                    "stay", "mobility", "motif", "circuity", "speed",
                    "segment_crossing", "dtw", "frechet", "radius_of_gyration"]),
    ("graph", ["pagerank", "hits_", "component", "scc_", "wcc_", "links",
               "ktruss", "centrality", "adjacency", "percolation", "bowtie",
               "attack_tolerance", "redirect", "khop", "reachability",
               "densest", "mst_", "shortest", "bfs", "propagation",
               "hyperanf", "graph", "triangle", "modularity", "clique",
               "bipartite", "assortativity"]),
    ("text", ["token", "tfidf", "bm25", "pmi", "vocab", "lang", "pii_",
              "boilerplate", "ngram", "term", "bpe", "stopword", "readability",
              "collocation", "keyword", "doc_", "docs", "corpus", "text",
              "sentence", "paragraph", "title", "url", "host", "wordcount",
              "quality", "repetition", "fingerprint", "burrows", "zipf",
              "heaps", "kneser", "inverted_index", "decontamination",
              "crawl", "warc"]),
    ("curation", ["sample", "mixture", "upsample", "stratified", "cap",
                  "curation", "pack_sequences", "decon", "filter_chain",
                  "budget", "apportion"]),
    ("streaming", ["streaming", "tumbling", "sliding", "session_window",
                   "watermark", "stream"]),
    ("timeseries", ["holt", "kalman", "ewma", "trend", "seasonal", "burst",
                    "daily", "weekly", "hourly", "lag", "autocorr", "xcorr",
                    "changepoint", "stl_", "forecast", "sma_", "cusum",
                    "twa_", "gapfill", "calendar", "resample", "interval",
                    "retention", "churn", "survival", "kaplan", "nelson",
                    "resurrection", "cohort", "funnel", "session", "modal_hour",
                    "recency", "dormancy"]),
    ("sketches", ["hll", "cms_", "bloom", "theta_sketch", "sketch",
                  "approx", "sampling", "reservoir", "histogram", "quantile",
                  "percentile", "tdigest", "voptimal", "heavy_hitters"]),
    ("matching", ["gale_shapley", "matching", "match", "assignment",
                  "attribution", "markov", "viterbi", "linkage", "luhn",
                  "isotonic", "ipf_", "sinkhorn", "propensity"]),
    ("contracts", ["contract", "census", "audit", "hygiene", "integrity",
                   "drift", "advisor", "fingerprint_diff", "span_census",
                   "coverage"]),
    ("olap", ["rollup", "cube", "grouping_sets", "window_", "rank",
              "set_ops", "pivot", "skyline", "topk", "top_", "inventory",
              "broadcast", "semi_anti", "salted", "skew", "asof", "range_join",
              "scalar_function", "json", "weighted_median", "bucketing"]),
]


def classify(name: str) -> str:
    for mod, kws in FAMILIES:
        for kw in kws:
            if kw in name:
                return mod
    return "analytics"  # descriptive catch-all


def main() -> None:
    src = open(SRC).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    def node_start(n: ast.stmt) -> int:
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)) and n.decorator_list:
            return min(d.lineno for d in n.decorator_list)
        return n.lineno

    def defined_names(n: ast.stmt) -> list[str]:
        out: list[str] = []
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            out.append(n.name)
        elif isinstance(n, ast.Assign):
            for t in n.targets:
                for x in ast.walk(t):
                    if isinstance(x, ast.Name):
                        out.append(x.id)
        elif isinstance(n, ast.AnnAssign) and isinstance(n.target, ast.Name):
            out.append(n.target.id)
        elif isinstance(n, ast.Import):
            out.extend(a.asname or a.name.split(".")[0] for a in n.names)
        elif isinstance(n, ast.ImportFrom):
            out.extend(a.asname or a.name for a in n.names)
        return out

    def register_name(n: ast.stmt) -> str | None:
        if isinstance(n, ast.FunctionDef) and n.decorator_list:
            d = n.decorator_list[0]
            if (
                isinstance(d, ast.Call)
                and isinstance(d.func, ast.Name)
                and d.func.id == "register"
                and d.args
                and isinstance(d.args[0], ast.Constant)
            ):
                return d.args[0].value
        return None

    def free_names(node_src: str) -> set[str]:
        """Over-approximate free names: every Name in Load context plus
        decorator/arg names; filtering by availability happens later."""
        t = ast.parse(node_src)
        loads: set[str] = set()
        stores: set[str] = set()
        for x in ast.walk(t):
            if isinstance(x, ast.Name):
                (loads if isinstance(x.ctx, ast.Load) else stores).add(x.id)
        return loads

    # ---- slice file into prelude + blocks ----------------------------
    body = tree.body
    first_reg = next(i for i, n in enumerate(body) if register_name(n))
    prelude_end_line = node_start(body[first_reg]) - 1
    # pull back attached comment lines that belong to the first block
    while prelude_end_line > 0 and lines[prelude_end_line - 1].lstrip().startswith("#"):
        prelude_end_line -= 1
    prelude_src = "".join(lines[:prelude_end_line])

    blocks = []  # (kind, name, src, defined, free)
    reg_line_counter: dict[str, int] = collections.Counter()
    for n in body[first_reg:]:
        rn = register_name(n)
        blocks.append(
            {
                "kind": "query" if rn else "helper",
                "name": rn or ",".join(defined_names(n)) or f"stmt@{n.lineno}",
                "start": node_start(n),
                "end": n.end_lineno,
                "defined": defined_names(n),
                "reg": rn,
            }
        )
    # attach preceding comments/blank lines to each block
    prev_end = prelude_end_line  # 0-based exclusive end
    for b in blocks:
        s = b["start"] - 1
        while s > prev_end and (
            lines[s - 1].strip() == "" or lines[s - 1].lstrip().startswith("#")
        ):
            s -= 1
        b["src"] = "".join(lines[s : b["end"]])
        prev_end = b["end"]
    trailing = "".join(lines[prev_end:])
    assert trailing.strip() == "", f"unexpected trailing code: {trailing[:200]}"

    # ---- drop earlier duplicate registrations ------------------------
    seen_last: dict[str, int] = {}
    for i, b in enumerate(blocks):
        if b["reg"]:
            seen_last[b["reg"]] = i
    dropped = []
    keep_blocks = []
    for i, b in enumerate(blocks):
        if b["reg"] and seen_last[b["reg"]] != i:
            dropped.append(b["reg"])
            continue
        keep_blocks.append(b)
    blocks = keep_blocks
    print("dropped shadowed duplicates:", dropped)

    # ---- namespaces --------------------------------------------------
    prelude_names = set()
    for n in body[:first_reg]:
        prelude_names.update(defined_names(n))
    shared_blocks = [b for b in blocks if b["kind"] == "helper"]
    shared_names = set()
    for b in shared_blocks:
        shared_names.update(b["defined"])
    query_mod: dict[str, str] = {}
    for b in blocks:
        if b["reg"]:
            query_mod[b["reg"]] = classify(b["reg"])

    builtin_names = set(dir(builtins))

    # cross-references from queries to other query functions?
    qnames = set(query_mod)
    for b in blocks:
        if not b["reg"]:
            continue
        f = free_names(b["src"]) & qnames - {b["reg"]}
        if f:
            print(f"NOTE query {b['reg']} references query fns {f}")
    for b in shared_blocks:
        f = free_names(b["src"]) & qnames
        if f:
            print(f"NOTE helper {b['name']} references query fns {f}")

    # ---- write package ----------------------------------------------
    os.makedirs(PKG, exist_ok=True)

    def import_stmt(module: str, names: set[str]) -> str:
        if not names:
            return ""
        inner = ",\n    ".join(sorted(names))
        return f"from gipspark.queries.{module} import (  # noqa: F401\n    {inner},\n)\n"

    with open(os.path.join(PKG, "_base.py"), "w") as f:
        f.write(prelude_src)

    shared_free = set()
    for b in shared_blocks:
        shared_free |= free_names(b["src"])
    shared_own = shared_names
    need = (shared_free - shared_own - builtin_names) & prelude_names
    with open(os.path.join(PKG, "_shared.py"), "w") as f:
        f.write(
            '"""Shared helpers that were interleaved between register blocks\n'
            "in the original single-file registry — original order preserved\n"
            '(it carries definition dependencies)."""\n\n'
            "from __future__ import annotations\n\n"
        )
        f.write(import_stmt("_base", need))
        f.write("\n")
        for b in shared_blocks:
            f.write(b["src"])
            if not b["src"].endswith("\n\n"):
                f.write("\n")

    mods: dict[str, list[dict]] = collections.defaultdict(list)
    for b in blocks:
        if b["reg"]:
            mods[query_mod[b["reg"]]].append(b)

    for mod, bs in sorted(mods.items()):
        free = set()
        for b in bs:
            free |= free_names(b["src"])
        # names DEFINED in this module (the def name can differ from the
        # registered name, e.g. lsh_cosine_topk_q registers
        # "lsh_cosine_topk" — subtracting registered names here would
        # wrongly suppress a needed _base import of the same-named
        # operator function)
        own = {n for b in bs for n in b["defined"]}
        free -= own | builtin_names
        from_base = free & prelude_names
        from_shared = (free - prelude_names) & shared_names
        cross = (free - prelude_names - shared_names) & qnames
        unknown = free - prelude_names - shared_names - qnames
        # names bound only inside functions (params, locals) are caught
        # by the over-approximation subtraction failing — report leftovers
        if unknown:
            print(f"module {mod}: unresolved (assumed local) names sample:",
                  sorted(unknown)[:12])
        with open(os.path.join(PKG, f"{mod}.py"), "w") as f:
            f.write(
                f'"""Registry family: {mod} (split from the single-file '
                'registry; query names and behavior unchanged)."""\n\n'
                "from __future__ import annotations\n\n"
            )
            f.write(import_stmt("_base", from_base))
            f.write(import_stmt("_shared", from_shared))
            for cq in sorted(cross):
                f.write(f"from gipspark.queries.{query_mod[cq]} import {cq}  # noqa: F401\n")
            f.write("\n")
            for b in bs:
                f.write(b["src"])
                if not b["src"].endswith("\n\n"):
                    f.write("\n")

    mod_order = sorted(mods)
    with open(os.path.join(PKG, "__init__.py"), "w") as f:
        f.write(
            '"""Query registry package (split from the former single-file\n'
            "gipspark/queries.py; VERDICT r4 next-round #3). Importing this\n"
            "package imports every family module (filling REGISTRY) and\n"
            "re-exports the union namespace so existing imports like\n"
            "``from gipspark.queries import REGISTRY, _PII_EMAIL`` keep\n"
            'working unchanged."""\n\n'
        )
        f.write("from gipspark.queries import _base, _shared\n")
        for m in mod_order:
            f.write(f"from gipspark.queries import {m}\n")
        f.write(
            "\nimport sys as _sys\n\n"
            "_self = _sys.modules[__name__]\n"
            "for _mod in (_base, _shared, "
            + ", ".join(mod_order)
            + "):\n"
            "    for _k, _v in vars(_mod).items():\n"
            "        if not _k.startswith('__'):\n"
            "            setattr(_self, _k, _v)\n"
            "del _self, _mod, _k, _v, _sys\n"
        )

    counts = {m: len(bs) for m, bs in sorted(mods.items())}
    print("module query counts:", counts)
    print("total queries:", sum(counts.values()))


if __name__ == "__main__":
    main()
