"""Bloom-filter pre-join pruning (the runtime-filter technique).

A semi join whose probe side is 10^12 rows should not shuffle the probe
at all when the build side is selective: build a Bloom filter over the
build keys, broadcast it as a literal bitmask, and drop non-matching
probe rows INSIDE the scan stage (narrow, codegen) before the exact
join runs. Engines ship this as "runtime filters" / Bloom join pruning
(Spark's own `spark.sql.optimizer.runtime.bloomFilter.enabled` injects
the same shape); this explicit variant is oracle-replayable because the
hash is the repo's md5-hex convention (operators/dedup.md5_long) and
the k probe positions are disjoint 20-bit chunks of that one 60-bit
hash (Kirsch–Mitzenmacher derived positions — one md5 per probe row,
not k).

Scale shape: the bitmask is m bits packed into m/64 long literals
collected driver-side — bounded by the filter size (default 4096 bits
= 64 longs), never by the data. The probe-side test is two
element_at lookups + a bitwise AND per hash position, folded into
whole-stage codegen; the exact verify afterwards is a broadcast semi
join against the real key set, so false positives never reach the
output. Result is bit-identical to a plain semi join — the Bloom stage
only prunes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gipspark.operators.dedup import md5_long

_U64 = 1 << 64
_I64_MAX = (1 << 63) - 1


def _signed(w: int) -> int:
    return w - _U64 if w > _I64_MAX else w


def _bit_positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions for a key: disjoint 20-bit chunks of one
    md5_long hash, masked to m_bits (must be a power of two ≤ 2^20)."""
    assert m_bits & (m_bits - 1) == 0 and m_bits <= 1 << 20, "m_bits must be 2^n ≤ 2^20"
    assert 1 <= k <= 3, "only 3 disjoint 20-bit chunks in a 60-bit hash"
    h = md5_long(key.cast("string"))
    return [F.shiftright(h, 20 * i).bitwiseAND(F.lit(m_bits - 1)) for i in range(k)]


def build_bloom_bits(build: DataFrame, key_col: str, m_bits: int = 4096, k: int = 3) -> set[int]:
    """Set bits of the Bloom filter over ``build[key_col]``.

    The collect is bounded by m_bits (the distinct output can never
    exceed the bitmask width), not by the build cardinality — the
    same bound a native BloomFilter aggregate has.
    """
    pos = build.select(
        F.explode(F.array(*_bit_positions(F.col(key_col), m_bits, k))).alias("bit")
    ).distinct()
    return {int(r["bit"]) for r in pos.collect()}


def _bloom_test(probe_key: str, bits: set[int], m_bits: int, k: int) -> Column:
    """The codegen membership test: for each derived position, pick the
    64-bit word (element_at on m/64 literal longs), pick the single-bit
    mask (element_at on 64 literal powers — sidesteps column-valued
    shift amounts), AND them."""
    words = [0] * (m_bits // 64)
    for b in bits:
        words[b // 64] |= 1 << (b % 64)
    word_arr = F.array(*[F.lit(_signed(w)) for w in words])
    power_arr = F.array(*[F.lit(_signed(1 << j)) for j in range(64)])
    cond = None
    for p in _bit_positions(F.col(probe_key), m_bits, k):
        word = F.element_at(word_arr, (F.shiftright(p, 6) + 1).cast("int"))
        pw = F.element_at(power_arr, (p.bitwiseAND(F.lit(63)) + 1).cast("int"))
        t = word.bitwiseAND(pw) != 0
        cond = t if cond is None else cond & t
    return cond


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Semi join probe⋉build with Bloom pre-pruning inside the scan.

    Returns exactly ``probe.join(build, probe==build, "left_semi")`` —
    the bitmask filter is a narrow superset gate, the broadcast semi
    join verifies exactly.
    """
    bits = build_bloom_bits(build, build_key, m_bits, k)
    candidates = probe.filter(_bloom_test(probe_key, bits, m_bits, k))
    keys = build.select(F.col(build_key).alias(probe_key)).distinct()
    return candidates.join(F.broadcast(keys), on=probe_key, how="left_semi")


def bloom_candidates(
    probe: DataFrame, build: DataFrame, probe_key: str, build_key: str,
    m_bits: int = 4096, k: int = 3,
) -> DataFrame:
    """The pruned-but-unverified candidate set (for tests/metrics)."""
    bits = build_bloom_bits(build, build_key, m_bits, k)
    return probe.filter(_bloom_test(probe_key, bits, m_bits, k))
