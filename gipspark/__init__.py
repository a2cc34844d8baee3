"""gipspark — a from-scratch PySpark-native geospatial tile-and-join engine.

Re-expresses the capabilities of the reference (EvelynMolina/gips, a
GIPS-style tile-oriented geospatial engine; see SURVEY.md §0 for the
provenance note — the reference checkout is empty, so the authoritative
contract is BASELINE.json's north_rule/north_star) as idiomatic Spark
DataFrame operators:

- H3-layout / S2 cell indexing via vectorized pandas/Arrow UDFs
  (:mod:`gipspark.geo`, :mod:`gipspark.functions`)
- point-in-polygon joins (cell prefilter + exact ray-cast refine),
  k-ring kNN, zonal aggregation, tile assignment / inventory
  (:mod:`gipspark.operators`)
- skew-aware salted hybrid joins and repartitionByRange output layout
  (:mod:`gipspark.operators.skew`)
- per-stage checkpoint/lineage so jobs resume mid-tiling
  (:mod:`gipspark.sources.checkpoint`)
- deterministic Common-Crawl-style fixtures (:mod:`gipspark.sources.fixtures`)
- structured-streaming facet over the events table (:mod:`gipspark.streaming`)
"""

__version__ = "0.1.0"

from gipspark.session import get_spark  # noqa: F401
