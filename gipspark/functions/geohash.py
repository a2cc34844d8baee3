"""Geohash encode — canonical base32 geohash as a pure-JVM Column.

Interop counterpart to the S2/h3x indexes (SURVEY.md §2.3): geohash is
fully specified by its public algorithm (alternate-bisection of lon/lat,
base32 alphabet without a/i/l/o), so unlike canonical H3 it needs no
offline constant tables — the ids here are bit-identical to every other
geohash implementation and safe to join against external data.

Implementation is Morton-style rather than the textbook per-bit loop:
quantize lat/lon to 20-bit integers, spread bits with the standard
shift-and-mask sequence, interleave (lon gets the first/odd position —
the geohash convention), then slice 5-bit groups into base32 chars.
Everything is integer Column arithmetic inside whole-stage codegen —
zero Python in the row path. The DuckDB oracle (GEOHASH_SQL) mirrors
the same magic numbers textually through a CTE chain; tests additionally
check against an independent textbook bisection implementation and the
published example vectors, so a shared transcription error cannot hide.

Truncation property: a precision-p geohash is the first p chars of the
precision-8 one, so one 40-bit interleave serves every precision ≤ 8.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"

# (shift, mask) sequence spreading a 20-bit int to even bit positions
SPREAD_STEPS: tuple[tuple[int, int], ...] = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)

QBITS = 20  # quantization bits per axis (8 chars · 5 bits / 2)
QMAX = (1 << QBITS) - 1


def _quantize(v: Column, lo: float, hi: float) -> Column:
    q = F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(1 << QBITS)))
    return F.greatest(F.least(q, F.lit(QMAX)), F.lit(0)).cast("long")


def _spread(x: Column) -> Column:
    for shift, mask in SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def geohash_col(lat: Column, lon: Column, precision: int = 8) -> Column:
    """Base32 geohash string of (lat, lon) at ``precision`` ≤ 8 chars."""
    if not 1 <= precision <= 8:
        raise ValueError("precision must be in 1..8")
    z = F.shiftleft(_spread(_quantize(lon, -180.0, 360.0 - 180.0)), 1).bitwiseOR(
        _spread(_quantize(lat, -90.0, 90.0))
    )
    alphabet = F.array(*[F.lit(c) for c in BASE32])
    chars = [
        F.element_at(
            alphabet,
            (F.shiftright(z, 5 * (8 - 1 - j)).bitwiseAND(F.lit(31)) + 1).cast("int"),
        )
        for j in range(precision)
    ]
    return F.concat(*chars)


# inverse of SPREAD_STEPS: compact every other bit back into 20 bits
COMPACT_STEPS: tuple[tuple[int, int], ...] = (
    (1, 0x3333333333333333),
    (2, 0x0F0F0F0F0F0F0F0F),
    (4, 0x00FF00FF00FF00FF),
    (8, 0x0000FFFF0000FFFF),
    (16, 0x00000000000FFFFF),
)


def _compact(x: Column) -> Column:
    x = x.bitwiseAND(F.lit(0x5555555555555555))
    for shift, mask in COMPACT_STEPS:
        x = (x.bitwiseOR(F.shiftright(x, shift))).bitwiseAND(F.lit(mask))
    return x


def geohash_decode(gh: Column, precision: int = 8) -> Column:
    """struct(lat, lon) — the CENTER of a precision-8 geohash cell.

    Exact inverse of :func:`geohash_col` up to the quantization grid:
    base32 chars → 40-bit Morton code (array_position, JVM),
    de-interleave with the standard compaction sequence, then
    center = lo + (q + 0.5)·span/2^20 — every step a power-of-two
    scale, so both engines produce the identical double.

    ``gh`` and the Morton code are each bound ONCE as lambda variables
    (the shingles one-bind trick): the compact chain references its
    input 2^5 times, and inlining the full upstream expression at every
    reference makes Catalyst analysis blow up combinatorially.
    """
    if precision != 8:
        raise ValueError("decode expects full precision-8 geohashes")
    alphabet = F.array(*[F.lit(c) for c in BASE32])

    def z_of(g: Column) -> Column:
        z = F.lit(0).cast("long")
        for j in range(precision):
            idx = (F.array_position(alphabet, F.substring(g, j + 1, 1)) - 1).cast("long")
            z = z.bitwiseOR(F.shiftleft(idx, 5 * (8 - 1 - j)))
        return z

    def center_of(zv: Column) -> Column:
        xq = _compact(F.shiftright(zv, 1))
        yq = _compact(zv)
        lat = F.lit(-90.0) + (yq.cast("double") + F.lit(0.5)) * F.lit(180.0) / F.lit(
            float(1 << QBITS)
        )
        lon = F.lit(-180.0) + (xq.cast("double") + F.lit(0.5)) * F.lit(360.0) / F.lit(
            float(1 << QBITS)
        )
        return F.struct(lat.alias("lat"), lon.alias("lon"))

    return F.transform(
        F.array(gh), lambda g: F.transform(F.array(z_of(g)), center_of)[0]
    )[0]


def geohash_decode_sql(gh_expr: str, key_expr: str, table_sql: str) -> str:
    """DuckDB mirror of :func:`geohash_decode`: returns a SELECT
    yielding (key, dec_lat, dec_lon) over ``table_sql``."""
    z_terms = " | ".join(
        f"((strpos('{BASE32}', substr({gh_expr}, {j + 1}, 1)) - 1) << {5 * (8 - 1 - j)})"
        for j in range(8)
    )
    steps = []
    x, y = "x0", "y0"
    for i, (shift, mask) in enumerate(COMPACT_STEPS):
        nx, ny = f"x{i + 1}", f"y{i + 1}"
        steps.append(
            f"d{i} AS (SELECT key, (({x} | ({x} >> {shift})) & {mask}) AS {nx}, "
            f"(({y} | ({y} >> {shift})) & {mask}) AS {ny} FROM d{'z' if i == 0 else i - 1})"
        )
        x, y = nx, ny
    return f"""
WITH dsrc AS ({table_sql}),
dz AS (SELECT {key_expr} AS key,
              ((({z_terms}) >> 1) & 6148914691236517205) AS x0,
              (({z_terms}) & 6148914691236517205) AS y0
       FROM dsrc),
{", ".join(steps)}
SELECT key,
       -90.0 + (cast({y} as double) + 0.5) * 180.0 / {float(1 << QBITS)} AS dec_lat,
       -180.0 + (cast({x} as double) + 0.5) * 360.0 / {float(1 << QBITS)} AS dec_lon
FROM d{len(COMPACT_STEPS) - 1}
"""


def geohash_sql(lat_expr: str, lon_expr: str, key_expr: str, table_sql: str, precision: int = 8) -> str:
    """DuckDB oracle: same quantize→spread→interleave→base32, mirrored
    textually as a CTE chain (linear SQL size — inlining the five
    spread steps would square the expression at each level).

    Returns a SELECT yielding (key, gh) over ``table_sql``.
    """
    steps = []
    x, y = "xq", "yq"
    for i, (shift, mask) in enumerate(SPREAD_STEPS):
        nx, ny = f"x{i}", f"y{i}"
        steps.append(
            f"g{i} AS (SELECT key, (({x} | ({x} << {shift})) & {mask}) AS {nx}, "
            f"(({y} | ({y} << {shift})) & {mask}) AS {ny} FROM g{'q' if i == 0 else i - 1})"
        )
        x, y = nx, ny
    chars = " || ".join(
        f"substr('{BASE32}', cast(((z >> {5 * (8 - 1 - j)}) & 31) as int) + 1, 1)"
        for j in range(precision)
    )
    return f"""
WITH gsrc AS ({table_sql}),
gq AS (SELECT {key_expr} AS key,
              cast(greatest(least(floor((({lon_expr}) + 180.0) / 360.0 * {1 << QBITS}), {QMAX}), 0) as bigint) AS xq,
              cast(greatest(least(floor((({lat_expr}) + 90.0) / 180.0 * {1 << QBITS}), {QMAX}), 0) as bigint) AS yq
       FROM gsrc),
{", ".join(steps)},
gz AS (SELECT key, (({x} << 1) | {y}) AS z FROM g{len(SPREAD_STEPS) - 1})
SELECT key, {chars} AS gh FROM gz
"""
