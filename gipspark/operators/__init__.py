"""Engine operators (SURVEY.md §2) — each composed from declarative
DataFrame primitives so Catalyst keeps optimizing through them:

- :mod:`pip` — point-in-polygon join: broadcast S2-cell prefilter +
  exact vectorized ray-cast refine (the north_star's signature join).
- :mod:`knn` — k-ring-expansion kNN join with a distance guarantee loop.
- :mod:`zonal` — raster↔vector zonal aggregation (gips_stats semantics).
- :mod:`tiles` — GIPS tile assignment + inventory matrices.
- :mod:`skew` — salted broadcast-vs-shuffle hybrid join for hotspot cells.
- :mod:`dedup` — exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup.
- :mod:`similarity` — embedding ANN: brute-force cosine top-k + LSH buckets.
- :mod:`asof` — as-of and range (interval) joins.
"""
