"""Distributed Bloom filter in pure JVM column expressions.

PySpark 4.1 exposes neither ``DataFrameStatFunctions.bloomFilter`` nor
the internal ``bloom_filter_agg`` SQL aggregate, so this module builds
one from scratch the Spark-first way:

- k bit positions per key via Kirsch-Mitzenmacher double hashing
  (``pos_i = (h1 + i*h2) mod m``; h1/h2 are two independent xxhash64
  views of the key) — all whole-stage-codegen column arithmetic;
- the m-bit bitmap lives as ``m/64`` longs: per-key word/bit pairs are
  aggregated with ``bit_or`` grouped by word index (a bitmap-sized
  aggregation, at most m/64 rows regardless of input size), collected,
  and shipped back as one broadcast array literal;
- membership tests fold k ``element_at(bitmap, word) & bit`` checks
  into one boolean column — zero shuffle, zero Python.

The scale story is the classic runtime-filter shape: build the filter
over the SMALL side (e.g. a benchmark's n-grams), scan the 100-TB side
with the membership test as a narrow filter, and exact-verify only the
survivors — the big side never shuffles in full.  Bloom filters have no
false negatives, so a downstream exact verify makes the composition
exactly equal to the unfiltered computation (the property the oracle
pairing and pytest gate assert).

No reference counterpart (the reference repo has no corpus-scale
filtering); mandated LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _check_m_bits(m_bits: int) -> None:
    if m_bits < 64 or (m_bits & (m_bits - 1)):
        raise ValueError("m_bits must be a power of two >= 64")


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions in [0, m_bits) via double hashing.

    Both hashes are reduced mod m BEFORE combining: raw xxhash64 values
    span the full int64 range, so ``h1 + i*h2`` would overflow (an error
    under ANSI mode, the Spark 4 default).  The stride is forced odd,
    which guarantees k distinct probe bits because ``m_bits`` is a power
    of two (enforced by the callers): gcd(odd, 2^j) = 1, so the stride
    generates the full cyclic group mod m.  (For a non-power-of-two m an
    odd stride sharing a factor with m would revisit positions — e.g.
    stride 3 with m=192 — raising the FPR but never creating false
    negatives.)
    """
    m = F.lit(m_bits).cast("long")
    h1 = F.pmod(F.xxhash64(key), m)
    h2 = F.pmod(F.xxhash64(key, F.lit("bloom-salt")), m) * F.lit(2) + F.lit(1)
    return [F.pmod(h1 + F.lit(i) * h2, m) for i in range(k)]


def bloom_build(
    df: DataFrame, key: str, m_bits: int = 1 << 17, k: int = 5
) -> list[int]:
    """Aggregate the keys of ``df[key]`` into an m_bits Bloom bitmap.

    Returns the bitmap as a dense python list of ``m_bits // 64`` longs
    (driver-side — the bitmap is broadcast-literal-sized by design; 2^17
    bits = 16 KiB).  ``m_bits`` must be a power of two (>= 64): the odd
    double-hashing stride in :func:`_positions` only guarantees k
    distinct probe bits when gcd(stride, m_bits) = 1.
    """
    _check_m_bits(m_bits)
    pos = F.array(*_positions(F.col(key), m_bits, k))
    rows = (
        df.select(F.explode(pos).alias("p"))
        .select(
            (F.col("p") / F.lit(64)).cast("long").alias("w"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("p") % F.lit(64)).cast("int"),
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    bitmap = [0] * (m_bits // 64)
    for r in rows:
        bitmap[int(r.w)] = int(r.word)
    return bitmap


def bloom_might_contain(
    key: Column, bitmap: list[int], m_bits: int, k: int = 5
) -> Column:
    """Boolean membership-test column against a bloom_build bitmap.

    False negatives are impossible; false-positive rate follows the
    standard (1 - e^{-kn/m})^k bound.  All-JVM: the bitmap is an array
    literal, each probe is element_at + bitwise AND.  ``m_bits`` must be
    the same power of two used at build time.
    """
    _check_m_bits(m_bits)
    arr = F.array(*[F.lit(w).cast("long") for w in bitmap])
    cond = None
    for p in _positions(key, m_bits, k):
        word = F.element_at(arr, (p / F.lit(64)).cast("int") + F.lit(1))
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % F.lit(64)).cast("int")
        )
        c = word.bitwiseAND(bit) != F.lit(0)
        cond = c if cond is None else (cond & c)
    return cond
