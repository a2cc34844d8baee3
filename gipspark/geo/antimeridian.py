"""Antimeridian handling: split polygons that cross ±180° into
in-strip pieces.

The engine's PIP kernel (geo/pip.py) is a planar even-odd ray cast in
(lon, lat): an edge written as (170 → −170) spans 340 planar degrees
the wrong way around the earth, so a polygon straddling the
antimeridian silently tests the complement of its intended area. The
fix every planar geo engine uses: unwrap the ring's longitudes into a
continuous chart, then clip copies shifted by ±360 against the
[−180, 180] strip (Sutherland–Hodgman against the two half-planes —
the clip region is convex, which is all S-H needs). The pieces keep
the polygon's id; under the even-odd rule a point crosses an odd
number of edges of exactly the piece containing it, so the piece UNION
reproduces the polygon's membership.

Driver-side on the polygon dim (polygons are dim-sized by the
engine-wide contract); a no-op for polygons that never wrap.

Seam convention: a point with lon exactly ±180 lies ON the cut line,
which the split turns into piece boundaries — the ray cast's half-open
boundary rule then excludes it (measure zero), exactly as it already
excludes points on any polygon edge.
"""

from __future__ import annotations


def _wrap_delta(d: float) -> float:
    """Longitude step mapped into (−180, 180]."""
    while d <= -180.0:
        d += 360.0
    while d > 180.0:
        d -= 360.0
    return d


def _unwrap_ring(ring: list[list[float]]) -> list[list[float]]:
    """Continuous-longitude copy of a closed (lon, lat) ring."""
    out = [[float(ring[0][0]), float(ring[0][1])]]
    for lon, lat in ring[1:]:
        prev = out[-1][0]
        out.append([prev + _wrap_delta(float(lon) - prev), float(lat)])
    span = max(p[0] for p in out) - min(p[0] for p in out)
    if span >= 360.0:
        raise ValueError("ring winds fully around the globe; not supported")
    return out


def _clip_half(ring: list[list[float]], bound: float, keep_right: bool) -> list[list[float]]:
    """Sutherland–Hodgman against lon >= bound (keep_right) or
    lon <= bound; lat interpolated linearly (the planar convention the
    ray cast itself uses)."""

    def inside(p):
        return p[0] >= bound if keep_right else p[0] <= bound

    def cross(a, b):
        t = (bound - a[0]) / (b[0] - a[0])
        return [bound, a[1] + t * (b[1] - a[1])]

    if not ring:
        return []
    pts = ring[:-1] if ring[0] == ring[-1] else list(ring)
    out: list[list[float]] = []
    for i, cur in enumerate(pts):
        prev = pts[i - 1]
        if inside(cur):
            if not inside(prev):
                out.append(cross(prev, cur))
            out.append(list(cur))
        elif inside(prev):
            out.append(cross(prev, cur))
    if len(out) < 3:
        return []
    if out[0] != out[-1]:
        out.append(list(out[0]))
    # drop zero-area slivers (all clipped vertices on the bound line)
    if all(p[0] == bound for p in out):
        return []
    return out


def _ring_wraps(ring: list[list[float]]) -> bool:
    pts = list(ring)
    return any(
        abs(float(pts[i + 1][0]) - float(pts[i][0])) > 180.0 for i in range(len(pts) - 1)
    )


def normalize_antimeridian(polys: list[dict]) -> list[dict]:
    """Rewrite each polygon's rings so no edge spans more than 180° of
    longitude: wrapped rings are unwrapped and clipped into [−180, 180]
    pieces (shift copies at −360/0/+360). Polygons that never wrap are
    returned unchanged (same object)."""
    out = []
    for p in polys:
        if not any(_ring_wraps(r) for r in p["rings"]):
            out.append(p)
            continue
        new_rings: list[list[list[float]]] = []
        for ring in p["rings"]:
            if not _ring_wraps(ring):
                new_rings.append(ring)
                continue
            unwrapped = _unwrap_ring(ring)
            for shift in (-360.0, 0.0, 360.0):
                shifted = [[lon + shift, lat] for lon, lat in unwrapped]
                piece = _clip_half(_clip_half(shifted, -180.0, True), 180.0, False)
                if piece:
                    new_rings.append(piece)
        out.append({**p, "rings": new_rings})
    return out
