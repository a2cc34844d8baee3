"""Distributed global rank + STR packing vs single-window brute force."""

import random

from pyspark.sql import functions as F


def test_global_row_number_matches_single_window(spark):
    from gipspark.operators.ranking import global_row_number

    rng = random.Random(11)
    # duplicate x values on purpose: the tie-break column makes the
    # order total, including across range-partition boundaries
    rows = [(k, rng.randrange(50)) for k in range(2000)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k long, x long")
    got = {
        r.k: r.rn
        for r in global_row_number(df, ["x", "k"], num_partitions=7).collect()
    }
    want = {k: i + 1 for i, (k, _x) in enumerate(sorted(rows, key=lambda r: (r[1], r[0])))}
    assert got == want


def test_global_rank_and_cumsum_survive_boundary_resampling(spark):
    """Regression for the two-job range-boundary pin: repartitionByRange
    re-samples its boundaries per job (seed folds in the RDD id), so
    without _ranged_with_pid's localCheckpoint the offsets collect and
    the window pass can disagree on row→partition assignment. Small
    inputs are fully sampled (deterministic) and hide it — this needs
    enough rows per partition that a reservoir sample differs across
    jobs (caught live at 15k rows over 32 partitions)."""
    from gipspark.operators.ranking import global_cumsum, global_row_number

    rng = random.Random(17)
    rows = [(k, rng.randrange(1, 10_000)) for k in range(20_000)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k long, w long").repartition(8)

    got_rn = {r.k: r.rn for r in global_row_number(df, ["k"], num_partitions=32).collect()}
    assert got_rn == {k: k + 1 for k, _ in rows}

    got = {r.k: r.cum for r in global_cumsum(df, ["k"], "w", num_partitions=32).collect()}
    acc, want = 0, {}
    for k, w in sorted(rows):
        acc += w
        want[k] = acc
    assert got == want


def test_str_pack_vs_brute(spark):
    from gipspark.operators.ranking import _ceil_isqrt, str_pack

    rng = random.Random(13)
    rows = [(k, rng.randrange(-1000, 1000), rng.randrange(-1000, 1000)) for k in range(700)]
    df = spark.createDataFrame(rows, "k long, x long, y long")
    cap = 16
    out = str_pack(df, "x", "y", "k", capacity=cap).collect()

    n = len(rows)
    leaves = (n + cap - 1) // cap
    slabs = _ceil_isqrt(leaves)
    rps = (n + slabs - 1) // slabs
    by_x = sorted(rows, key=lambda r: (r[1], r[0]))
    want = {}
    for i, (k, x, y) in enumerate(by_x):
        want.setdefault(i // rps, []).append((k, x, y))
    pages = {}
    for slab, members in want.items():
        members.sort(key=lambda r: (r[2], r[0]))
        for j, (k, x, y) in enumerate(members):
            pages[k] = slab * 100000 + j // cap
    assert {r.k: r.page_id for r in out} == pages
    # page occupancy bound + MBR consistency
    occ = {}
    for r in out:
        occ[r.page_id] = occ.get(r.page_id, 0) + 1
        assert r.mbr_xmin <= r.x <= r.mbr_xmax
        assert r.mbr_ymin <= r.y <= r.mbr_ymax
    assert max(occ.values()) <= cap
    for r in out:
        assert r.page_rows == occ[r.page_id]


def test_octant_classifier(spark):
    """The shared 8-octant CASE: total (never NULL off-origin) and each
    sector's atan2 bearing lies within its 45° span (boundaries may go
    to either adjacent sector by convention — both engines share the
    same text, so the convention cancels)."""
    import math

    from gipspark.queries import _OCTANT_CASE

    deltas = [(dx, dy) for dx in range(-6, 7) for dy in range(-6, 7)]
    df = spark.createDataFrame(deltas, "dx long, dy long")
    rows = df.selectExpr("dx", "dy", f"{_OCTANT_CASE} as o").collect()
    centers = {0: 22.5, 1: 67.5, 2: 112.5, 3: 157.5, 4: 202.5, 5: 247.5, 6: 292.5, 7: 337.5}
    for r in rows:
        if (r.dx, r.dy) == (0, 0):
            assert r.o == -1
            continue
        assert r.o is not None and 0 <= r.o <= 7
        ang = math.degrees(math.atan2(r.dy, r.dx)) % 360.0
        diff = abs((ang - centers[r.o] + 180.0) % 360.0 - 180.0)
        assert diff <= 22.5 + 1e-9, (r.dx, r.dy, r.o, ang)


def test_join_counts_vs_brute(spark):
    from gipspark.operators.morans import cell_counts, join_counts

    rng = random.Random(7)
    rows = [(rng.uniform(-55.0, 55.0), rng.uniform(-170.0, 170.0)) for _ in range(900)]
    pts = spark.createDataFrame(rows, "lat double, lon double")
    out = join_counts(cell_counts(pts, 30.0)).collect()[0]

    import math

    counts = {}
    for lat, lon in rows:
        gx = math.floor((lon + 180.0) / 30.0)
        gy = math.floor((90.0 - lat) / 30.0)
        counts[(gx, gy)] = counts.get((gx, gy), 0) + 1
    n = len(counts)
    s = sum(counts.values())
    blk = {k: int(n * v > s) for k, v in counts.items()}
    bb = ww = bw = w = 0
    for (gx, gy), bi in blk.items():
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            bj = blk.get((gx + dx, gy + dy))
            if bj is None:
                continue
            w += 1
            if bi and bj:
                bb += 1
            elif not bi and not bj:
                ww += 1
            else:
                bw += 1
    nb = sum(blk.values())
    assert (out.n_cells, out.n_black, out.w_links) == (n, nb, w // 2)
    assert (out.j_bb, out.j_ww, out.j_bw) == (bb // 2, ww // 2, bw // 2)
    assert out.e_bb == (w // 2) * nb * (nb - 1.0) / (n * (n - 1.0))
    assert out.e_bw == 2.0 * (w // 2) * nb * (n - nb) / (n * (n - 1.0))
