"""Hilbert-curve clustering keys — the locality-optimal layout primitive.

Morton/Z-order (operators/zorder.py) is the cheap interleave; the
Hilbert curve is the layout key with strictly better locality (every
consecutive pair of keys is an edge-adjacent cell pair — no Z-shaped
jumps across the domain), which is why table formats that offer both
(e.g. Delta OPTIMIZE ZORDER vs Databricks liquid clustering, DuckDB's
own spatial sorting) prefer Hilbert for range-scan pruning.

The classic xy2d loop mutates (x, y) in place (reflect + swap per
level), which as a Spark expression would double in size every level
(new x references both old x AND old y → 2^bits nodes). Instead the
reflect/swap history is folded into a 4-state machine over the
UNTOUCHED input bits — the standard Lawder table form — so each level
only carries (state, d) forward and the plan is a linear chain of 16
thin projections, all whole-stage codegen.

The state is the dihedral transform the loop has applied so far:
``(px, ix, iy)`` = current_x reads original coord ``px`` (0 = x,
1 = y), with inversion bits ix/iy (reflection ``s-1-x`` complements
every remaining bit). Only 4 of the 8 dihedral elements are reachable
from identity; the tables are DERIVED at import by composing the
loop's own rotation rule (see _derive_tables), not transcribed — and
pinned against the reference loop by exhaustive pytest.

Rendered ONCE from the shared tables into both a Spark Column chain
and the DuckDB oracle CTE chain (the zorder.py discipline), so keys
are bit-exact across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hilbert_ref(x: int, y: int, bits: int) -> int:
    """Reference xy2d loop (driver-side; tests + table derivation)."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def _derive_tables() -> tuple[list[int], list[int]]:
    """Fold the xy2d reflect/swap into state tables by composition.

    A state (px, ix, iy) means: current_x = ix XOR orig[px]'s bit,
    current_y = iy XOR orig[1-px]'s bit (inversion applies to all
    remaining levels). The loop's rotation in the CURRENT frame is:
    ry=1 → identity; ry=0, rx=0 → swap axes; ry=0, rx=1 → invert both
    then swap. Swapping current axes flips px and exchanges the
    inversion bits. BFS from identity enumerates the reachable states
    (exactly 4); tables are flat [state*4 + (bx*2+by)] lists.
    """
    order: list[tuple[int, int, int]] = [(0, 0, 0)]
    index = {(0, 0, 0): 0}
    nxt: list[int] = []
    dig: list[int] = []
    i = 0
    while i < len(order):
        px, ix, iy = order[i]
        for bx in (0, 1):
            for by in (0, 1):
                ox, oy = (bx, by) if px == 0 else (by, bx)
                cx, cy = ox ^ ix, oy ^ iy
                digit = (3 * cx) ^ cy
                if cy == 0:
                    ix2, iy2 = (ix ^ 1, iy ^ 1) if cx == 1 else (ix, iy)
                    st2 = (1 - px, iy2, ix2)
                else:
                    st2 = (px, ix, iy)
                if st2 not in index:
                    index[st2] = len(order)
                    order.append(st2)
                nxt.append(index[st2])
                dig.append(digit)
        i += 1
    assert len(order) == 4, f"expected 4 reachable states, got {len(order)}"
    return nxt, dig


_NEXT, _DIGIT = _derive_tables()


def hilbert_key_df(
    df: DataFrame,
    gx_col: str = "gx",
    gy_col: str = "gy",
    bits: int = 16,
    out: str = "hkey",
) -> DataFrame:
    """Append ``out`` = Hilbert d-index of integer grid (gx, gy).

    One thin projection per level; each carries only (__st, d) plus the
    input columns, so Catalyst keeps the chain linear (the state is
    referenced twice per level — a non-cheap duplicate, which is
    exactly what stops CollapseProject from inlining the chain back
    into one exponential expression).
    """
    next_arr = F.array(*[F.lit(v) for v in _NEXT])
    dig_arr = F.array(*[F.lit(v) for v in _DIGIT])
    passthrough = list(df.columns)
    cur = df.select(*passthrough, F.lit(0).alias("__st"), F.lit(0).cast("long").alias(out))
    for i in range(bits - 1, -1, -1):
        q = (
            F.shiftright(F.col(gx_col).cast("long"), i).bitwiseAND(F.lit(1)) * 2
            + F.shiftright(F.col(gy_col).cast("long"), i).bitwiseAND(F.lit(1))
        )
        idx = (F.col("__st") * 4 + q + 1).cast("int")
        cur = cur.select(
            *passthrough,
            F.element_at(next_arr, idx).alias("__st"),
            (F.col(out) * 4 + F.element_at(dig_arr, idx).cast("long")).alias(out),
        )
    return cur.select(*passthrough, out)


def hilbert_sql(
    key_expr: str,
    gx_expr: str,
    gy_expr: str,
    table_sql: str,
    bits: int = 16,
) -> str:
    """DuckDB mirror of :func:`hilbert_key_df` — CTE chain ``h{i}``
    from the SAME tables, one level per CTE, distinct column names per
    level (DuckDB's lateral column aliases would otherwise shadow the
    previous level's state mid-SELECT). Final relation: (key, gx, gy,
    hkey)."""
    next_list = "[" + ", ".join(str(v) for v in _NEXT) + "]"
    dig_list = "[" + ", ".join(str(v) for v in _DIGIT) + "]"
    parts = [
        f"h{bits} AS (SELECT {key_expr} AS key, {gx_expr} AS gx, {gy_expr} AS gy, "
        f"0 AS st{bits}, cast(0 as bigint) AS d{bits} FROM ({table_sql}) t)"
    ]
    for i in range(bits - 1, -1, -1):
        prev = i + 1
        q = f"((((gx >> {i}) & 1) * 2) + ((gy >> {i}) & 1))"
        idx = f"(st{prev} * 4 + {q} + 1)"
        parts.append(
            f"h{i} AS (SELECT key, gx, gy, "
            f"list_extract({next_list}, {idx}) AS st{i}, "
            f"d{prev} * 4 + cast(list_extract({dig_list}, {idx}) as bigint) AS d{i} "
            f"FROM h{prev})"
        )
    return (
        ",\n".join(parts)
        + f",\nhilbert AS (SELECT key, gx, gy, d0 AS hkey FROM h0)"
    )
