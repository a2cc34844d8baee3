"""segment_cells closed form vs an independent Fraction-exact walker.

The operator (gipspark/operators/rasterlines.py) computes every cell a
segment touches in closed form — no sequential grid walk. This test
re-derives the same supercover with an exact sequential reference:
crossings collected as Fractions, sorted by (t, axis) with vertical
first (the x-first corner rule), stepped one at a time.
"""

from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from gipspark.operators.rasterlines import segment_cells

G = 50


def brute_cells(x0, y0, x1, y1, grid):
    cx, cy = x0 // grid, y0 // grid
    cells = [(cx, cy)]
    dx, dy = x1 - x0, y1 - y0
    sx = (dx > 0) - (dx < 0)
    sy = (dy > 0) - (dy < 0)
    crossings = []
    if dx != 0:
        for i in range(1, abs(x1 // grid - cx) + 1):
            bx = (cx + i) * grid if sx > 0 else (cx - i + 1) * grid
            crossings.append((Fraction(abs(bx - x0), abs(dx)), 0))
    if dy != 0:
        for j in range(1, abs(y1 // grid - cy) + 1):
            by = (cy + j) * grid if sy > 0 else (cy - j + 1) * grid
            crossings.append((Fraction(abs(by - y0), abs(dy)), 1))
    crossings.sort()
    gx, gy = cx, cy
    for _, axis in crossings:
        if axis == 0:
            gx += sx
        else:
            gy += sy
        cells.append((gx, gy))
    return cells


def _segments():
    # deterministic LCG sweep + crafted edge cases
    segs = [
        (0, 0, 0, 0),  # point
        (10, 10, 400, 10),  # horizontal
        (10, 10, 10, 400),  # vertical
        (0, 0, 2 * G, 2 * G),  # exact corner run (45°)
        (G, G, 3 * G, 2 * G),  # starts exactly on a corner
        (25, 25, 3 * G, 3 * G),  # hits corner mid-way
        (499, 1, 1, 499),  # steep anti-diagonal
        (2 * G, 17, 2 * G, 17),  # point on a boundary
        (G, 10, 10, 10),  # leftward from a boundary
        (10, G, 10, 3),  # downward from a boundary
    ]
    s = 12345
    for _ in range(200):
        q = []
        for _ in range(4):
            s = (s * 48271) % 2147483647
            q.append(s % 700)
        segs.append(tuple(q))
    return segs


def test_closed_form_matches_fraction_walker(spark):
    segs = _segments()
    df = spark.createDataFrame(
        [(k, *map(int, s)) for k, s in enumerate(segs)],
        "seg_id long, x0 long, y0 long, x1 long, y1 long",
    )
    out = segment_cells(df, G).select("seg_id", "gx", "gy").collect()
    got = {}
    for r in out:
        got.setdefault(r.seg_id, []).append((r.gx, r.gy))
    for k, s in enumerate(segs):
        want = brute_cells(*s, G)
        have = got.get(k, [])
        assert sorted(have) == sorted(want), f"seg {k} {s}: {sorted(have)} != {sorted(want)}"
        # supercover invariant: nx + ny + 1 distinct cells, no dupes
        assert len(have) == len(set(have)) == len(want)


def test_cell_count_invariant(spark):
    df = spark.createDataFrame([(0, 3, 7, 777, 555)], "seg_id long, x0 long, y0 long, x1 long, y1 long")
    n = segment_cells(df, G).count()
    nx = abs(777 // G - 3 // G)
    ny = abs(555 // G - 7 // G)
    assert n == nx + ny + 1
