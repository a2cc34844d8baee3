"""Z-order (Morton) clustering keys — the data-layout primitive.

Interleaving the bits of the integer grid coordinates gives a 1-D key
whose ranges are spatially compact, which is what table formats
cluster/sort files by (Delta/Iceberg Z-ORDER) so that a lat/lon range
scan prunes to a few files instead of the whole table. The engine
already clusters output by cell id (operators/skew.cluster_by_cell);
this adds the cross-dimension key those cells can't give you when the
query box doesn't align with the cell hierarchy.

The 16-bit magic-number spread is pure integer shift/mask arithmetic,
written ONCE as a step list and rendered to both a Spark Column and
the DuckDB oracle SQL — textually identical, so keys are bit-exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (shift, mask) steps of the classic 16→32-bit bit spread:
# x = (x | x<<8) & 0x00FF00FF; (x | x<<4) & 0x0F0F0F0F; ...
_SPREAD_STEPS: tuple[tuple[int, int], ...] = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread_bits(x: Column) -> Column:
    """Spread the low 16 bits of ``x`` to even bit positions (JVM)."""
    out = x.cast("long")
    for sh, mask in _SPREAD_STEPS:
        out = (out.bitwiseOR(F.shiftleft(out, sh))).bitwiseAND(F.lit(mask))
    return out


def spread_bits_sql(x: str) -> str:
    """The same spread as SQL text (DuckDB `<<`/`&`/`|` on BIGINT)."""
    out = f"cast({x} as bigint)"
    for sh, mask in _SPREAD_STEPS:
        out = f"(({out} | ({out} << {sh})) & {mask})"
    return out


def morton_key(gx: Column, gy: Column) -> Column:
    """Interleave two 16-bit grid coordinates: gx on even bits, gy odd."""
    return spread_bits(gx).bitwiseOR(F.shiftleft(spread_bits(gy), 1))


def morton_key_sql(gx: str, gy: str) -> str:
    return f"({spread_bits_sql(gx)} | ({spread_bits_sql(gy)} << 1))"


def zranges(
    x0: int, x1: int, y0: int, y1: int, bits: int = 16, max_ranges: int = 64
) -> list[tuple[int, int]]:
    """Decompose the inclusive grid box [x0,x1]×[y0,y1] into at most
    ``max_ranges`` Morton-key ranges [lo, hi) whose union COVERS the box
    (quadtree descent; a partial quad past the budget is emitted whole,
    so coverage is a superset and an exact gx/gy refine stays mandatory
    — the planner bounds scan METADATA, the refine keeps exactness).

    This is the scan-pruning planner for a Z-ordered table layout
    (zorder_cluster_customers): a file/row-group range metadata check
    against these intervals prunes everything outside them. Pure
    deterministic integer Python on the DRIVER — the plan is O(ranges),
    never a per-row operation; ranges are emitted sorted and coalesced
    (adjacent intervals merged) for the cheapest possible predicate.
    """
    from collections import deque

    out: list[tuple[int, int]] = []

    def full_range(prefix: int, depth: int) -> tuple[int, int]:
        span = 1 << (2 * (bits - depth))
        return prefix * span, (prefix + 1) * span

    # BREADTH-first refinement: the frontier is split level by level so
    # the range budget spreads evenly over the box boundary instead of
    # one corner eating it depth-first (which leaves the rest of the
    # boundary as a handful of giant over-covering quads).
    work = deque([(0, 0, 0, 0)])  # (qx, qy, depth, z-prefix)
    while work:
        qx, qy, depth, prefix = work.popleft()
        side = 1 << (bits - depth)
        qx0, qy0 = qx * side, qy * side
        qx1, qy1 = qx0 + side - 1, qy0 + side - 1
        if qx1 < x0 or qx0 > x1 or qy1 < y0 or qy0 > y1:
            continue
        contained = x0 <= qx0 and qx1 <= x1 and y0 <= qy0 and qy1 <= y1
        if contained or depth == bits or len(out) + len(work) + 4 > max_ranges:
            out.append(full_range(prefix, depth))
            continue
        for dy in (0, 1):
            for dx in (0, 1):
                work.append((2 * qx + dx, 2 * qy + dy, depth + 1, (prefix << 2) | (dy << 1) | dx))
    out.sort()
    merged: list[tuple[int, int]] = []
    for lo, hi in out:
        if merged and merged[-1][1] == lo:
            merged[-1] = (merged[-1][0], hi)
        else:
            merged.append((lo, hi))
    return [(lo, hi) for lo, hi in merged]
