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
