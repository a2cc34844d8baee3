"""Vendored NumPy geometry kernels (no native geo wheels in the sandbox).

Implemented from public specifications only:

- :mod:`gipspark.geo.s2` — S2 cell ids (cube face + quadratic ST +
  Hilbert curve), per the public s2geometry spec. Exact bit layout.
- :mod:`gipspark.geo.h3x` — H3-layout aperture-7 icosahedral hex index.
- :mod:`gipspark.geo.pip` — ray-casting point-in-polygon + polygon cell
  covers (replaces the reference's Shapely-prepared polygons,
  SURVEY.md §2.4).
- :mod:`gipspark.geo.haversine` — great-circle distance.

All kernels are pure NumPy array→array functions so they can run inside
vectorized pandas/Arrow UDFs (BASELINE.json:15 'no per-row Python') and
be unit-tested without a SparkSession.
"""
