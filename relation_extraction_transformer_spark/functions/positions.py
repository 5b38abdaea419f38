"""Position-vector operators (SURVEY §2.2 P6-P9).

The reference computes, per candidate sentence:

- subject/object relative-position sequences
  ``[-start..-1, 0 x span, 1..len-end-1]`` (ref:data/loader.py:292-295)
- logarithmic position binning ``sign(x)*(floor(log2(|x|))+1)``
  (ref:data/loader.py:214-228)
- the shifted diagonal-attention range ``[96-l .. 96+l-2]``
  (ref:data/loader.py:142-143)
- the 1-based instance position vector (ref:data/loader.py:120)

All are expressed as Spark SQL array expressions (no UDFs).  The binning is
implemented as an integer-exact CASE chain (bit-length) rather than
``floor(log2(x))`` so results cannot drift across libm implementations;
a DuckDB-dialect builder shares the same chain for oracle queries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import constants as C

# Highest bin needed for 32-bit ints; sentence positions only need 7
# (|pos| <= ABS_MAX_LEN-1 = 95) but the generic operator supports any int.
_MAX_BIN = 31


def log2_bin_sql(var: str) -> str:
    """CASE-chain SQL for sign(x)*(floor(log2(|x|))+1), 0 -> 0.

    Integer-exact: bin(x) = bit_length(x) for x > 0.  Valid in both Spark
    SQL and DuckDB (plain CASE/WHEN on integers).
    """
    pos_whens = " ".join(
        f"WHEN {var} >= {1 << (b - 1)} THEN {b}" for b in range(_MAX_BIN, 0, -1)
    )
    neg_whens = " ".join(
        f"WHEN -({var}) >= {1 << (b - 1)} THEN -{b}" for b in range(_MAX_BIN, 0, -1)
    )
    return (
        f"CASE WHEN {var} = 0 THEN 0 "
        f"WHEN {var} > 0 THEN (CASE {pos_whens} END) "
        f"ELSE (CASE {neg_whens} END) END"
    )


def log2_bin(col: Column) -> Column:
    """Column form of :func:`log2_bin_sql` for scalar int columns.

    Integer-exact like the SQL CASE chain, but via ``length(bin(|x|))``
    (= bit_length for positive ints — the same trick sketches.py uses
    for the HLL rho): the binning runs once per array ELEMENT on the
    inference hot path, and one bin/length pair is ~3x cheaper than the
    62-branch CASE chain the previous form compiled to (r8 measured;
    values identical on the full int32 range, pinned by the golden
    vectors in tests/test_positions.py)."""
    mag_bits = F.length(F.bin(F.abs(col).cast("bigint"))).cast("int")
    return (
        F.when(col == 0, F.lit(0))
        .when(col > 0, mag_bits)
        .otherwise(-mag_bits)
    )


def bin_positions(arr: Column) -> Column:
    """P9: bin every element of an int array (ref:data/loader.py:214-228)."""
    return F.transform(arr, log2_bin)


def _empty_int_array() -> Column:
    return F.array().cast("array<int>")


def get_positions(start: Column, end: Column, length: Column) -> Column:
    """P8: position sequence relative to a [start, end] span
    (ref:data/loader.py:292-295).

    ``[-start..-1] ++ [0]*(end-start+1) ++ [1..length-end-1]``

    Guards against Spark's descending ``sequence`` when a side is empty.
    """
    head = F.when(start > 0, F.sequence(-start, F.lit(-1))).otherwise(
        _empty_int_array()
    )
    mid = F.array_repeat(F.lit(0), (end - start + 1).cast("int"))
    tail_n = (length - end - 1).cast("int")
    tail = F.when(tail_n > 0, F.sequence(F.lit(1), tail_n)).otherwise(
        _empty_int_array()
    )
    return F.concat(head.cast("array<int>"), mid, tail.cast("array<int>"))


def binned_span_positions(start: Column, end: Column, length: Column) -> Column:
    """get_positions followed by log2 binning, as used on the inference path
    (ref:data/loader.py:166-184)."""
    return bin_positions(get_positions(start, end, length))


def relative_position_range(length: Column, max_len: int = C.ABS_MAX_LEN) -> Column:
    """P7: shifted diagonal-attention index range ``[96-l .. 96+l-2]``
    (length ``2l-1``) (ref:data/loader.py:142-143)."""
    return F.when(
        length > 0, F.sequence(F.lit(max_len) - length, F.lit(max_len) + length - 2)
    ).otherwise(_empty_int_array()).cast("array<int>")


def inst_position(token_ids: Column) -> Column:
    """P6: 1-based position for non-PAD ids, 0 for PAD
    (ref:data/loader.py:120)."""
    return F.transform(
        token_ids, lambda x, i: F.when(x != C.PAD_ID, i + 1).otherwise(F.lit(0))
    )


# ---------------------------------------------------------------------------
# DuckDB-dialect builders (oracle SQL).  DuckDB's scalar range(a,b) is
# exclusive-end and returns [] when a >= b, which matches python range().
# ---------------------------------------------------------------------------

def get_positions_duckdb(start: str, end: str, length: str) -> str:
    return (
        f"list_concat(list_concat("
        f"range(-({start}), 0), "
        f"list_transform(range(1, {end} - {start} + 2), __z -> 0)), "
        f"range(1, {length} - {end}))"
    )


def bin_positions_duckdb(arr_expr: str) -> str:
    return f"list_transform({arr_expr}, __x -> ({log2_bin_sql('__x')}))"
