"""Great-circle distance — NumPy kernel + the matching Spark Column expr.

The Spark expression form stays JVM-side (whole-stage codegen) so the
kNN hot path never crosses into Python; the NumPy form backs tests and
driver-side cover construction. Both use the same formula so distances
are bit-identical between the engine and the DuckDB oracle SQL
(which repeats the formula textually — see __spark_entry__.py).
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6371000.0


def haversine_m(
    lat1: np.ndarray, lon1: np.ndarray, lat2: np.ndarray, lon2: np.ndarray
) -> np.ndarray:
    """Distance in meters between (lat1,lon1) and (lat2,lon2), degrees in."""
    p1, l1, p2, l2 = (np.radians(np.asarray(a, dtype=np.float64)) for a in (lat1, lon1, lat2, lon2))
    a = np.sin((p2 - p1) / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin((l2 - l1) / 2) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(a))


DEG2RAD = 0.017453292519943295  # double nearest π/180 — shared with SQL


def haversine_col(lat1, lon1, lat2, lon2):
    """Spark Column: same formula, JVM-side only.

    Deliberately avoids ``radians()`` and ``pow()``: both engines round
    ``x*const`` and ``x*x`` exactly (IEEE), whereas Math.toRadians vs
    DuckDB's radians() and Math.pow vs libm pow can differ in the last
    ulp — the only remaining cross-engine wiggle is sin/cos/asin libm
    differences, absorbed by rounding in oracle-facing outputs.
    """
    from pyspark.sql import functions as F

    p1, l1, p2, l2 = (c * F.lit(DEG2RAD) for c in (lat1, lon1, lat2, lon2))
    sp = F.sin((p2 - p1) / 2)
    sl = F.sin((l2 - l1) / 2)
    a = sp * sp + F.cos(p1) * F.cos(p2) * sl * sl
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


HAVERSINE_SQL = (
    "2.0 * 6371000.0 * asin(sqrt("
    "sin((({lat2}) * 0.017453292519943295 - ({lat1}) * 0.017453292519943295) / 2) * "
    "sin((({lat2}) * 0.017453292519943295 - ({lat1}) * 0.017453292519943295) / 2) + "
    "cos(({lat1}) * 0.017453292519943295) * cos(({lat2}) * 0.017453292519943295) * "
    "sin((({lon2}) * 0.017453292519943295 - ({lon1}) * 0.017453292519943295) / 2) * "
    "sin((({lon2}) * 0.017453292519943295 - ({lon1}) * 0.017453292519943295) / 2)))"
)
