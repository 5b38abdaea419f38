"""Shared MinHash / LSH-band core.

One parameterized implementation used by BOTH near-dup surfaces so the
LSH parameters (k, bands, salt format, band digest) cannot diverge:

- document near-dup (plans/sql_queries.py: minhash_bands,
  minhash_candidate_pairs, ngram_jaccard_buckets) over word 3-gram
  shingles
- entity canonicalization (operators/canonicalize.py) over char 3-gram
  shingles of normalized names

Scale shape (round-3 rewrite): signatures are NARROW — one projection
computes the per-shingle base hashes as an array column and each of the k
min-hashes as ``array_min(transform(...))`` over it, then a stack()
unpivot to band rows.  ZERO shuffle until the single equi-join on
(band, band_hash) — round 2 exploded to one row per shingle and
aggregated back (a full shuffle of every shingle); the array form keeps
each document in its own row end to end and is ~2x faster measured.
Never an all-pairs comparison.

Hashing: each shingle is md5'd ONCE into a 60-bit integer, and the k
signatures are universal affine transforms ((h mod P) * a_k + b_k) mod P
(P = 2^31 - 1) of that base hash — the standard datasketch-style
construction.  Round 1 computed k separate salted md5s per shingle; one
md5 + k multiply-adds is ~4x cheaper on the dominant dedup-path cost.
Every fragment has a DuckDB twin built HERE (``duck_*``) so the Spark
plan and the oracle SQL can never diverge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import exprcache as XC

MINHASH_K = 8
MINHASH_BANDS = 2  # 2 bands x 4 rows

_P = (1 << 31) - 1  # Mersenne prime; (h%P)*a + b stays well under 2^63


def _affine_consts(k: int) -> tuple[int, int]:
    a = (k * 1103515245 + 12345) % _P or 1
    b = (k * 2654435761 + 1013904223) % _P
    return a, b


def base_hash(col: Column) -> Column:
    """Shingle -> 60-bit integer: md5 hex chars [2..16] as BIGINT
    (identical in DuckDB: see BASE_HASH_DUCK)."""
    return F.conv(F.substring(F.md5(col), 2, 15), 16, 10).cast("long")


BASE_HASH_DUCK = "CAST(('0x' || substr(md5({x}), 2, 15)) AS BIGINT)"


# Horner multiplier for combining token hashes into shingle hashes
# (< 2^31 so (acc % P) * A + h stays well inside int64 in both engines)
_WORD_A = 1103515245


def word_shingle_hashes(col: Column, n: int = 3) -> Column:
    """Word n-gram shingle HASHES without building shingle strings: hash
    each token once (md5 -> 60-bit -> mod P), then combine n consecutive
    token hashes with a Horner chain mod P.  Round 3 measurement: the
    round-2 form spent most of its time in split+slice+concat_ws string
    construction, not in md5 — hashing tokens and combining
    arithmetically removes the string building entirely.  Short texts
    fall back to the whole-text hash (one shingle).  DuckDB twin:
    :func:`duck_word_shingle_hashes` (identical arithmetic)."""
    th = F.transform(F.split(col, " "), lambda t: base_hash(t) % _P)
    # Horner chain via slice + zip_with, NOT element_at inside a lambda:
    # a lambda body referencing th would re-evaluate the whole token-hash
    # array per element (O(len^2) md5s — measured 10x slower); as slice
    # arguments th is a top-level subexpression, computed once per row
    m = F.size(th) - (n - 1)
    acc = F.slice(th, 1, m)
    for j in range(1, n):
        acc = F.zip_with(
            acc,
            F.slice(th, 1 + j, m),
            lambda a, b: (a * F.lit(_WORD_A) + b) % _P,
        )
    return F.when(F.size(th) >= n, acc).otherwise(
        F.array(base_hash(col) % _P)
    )


def duck_word_shingle_hashes(text_col: str, n: int = 3) -> str:
    """DuckDB twin of :func:`word_shingle_hashes` — same base hash, same
    mod-P Horner combination, 1-based list indexing.  The token-hash
    array is inlined at each use (no CTE/subquery needed by callers); the
    oracle recomputing it is irrelevant at gate scale."""
    base = BASE_HASH_DUCK.format(x="t")
    th = f"list_transform(string_split({text_col}, ' '), t -> ({base}) % {_P})"
    acc = f"({th})[i]"
    for j in range(1, n):
        acc = f"(({acc}) * {_WORD_A} + ({th})[i+{j}]) % {_P}"
    whole = BASE_HASH_DUCK.format(x=text_col)
    return (
        f"CASE WHEN len({th}) >= {n} THEN "
        f"list_transform(range(1, len({th}) - {n - 2}), i -> {acc}) "
        f"ELSE [({whole}) % {_P}] END"
    )


def word_shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles of a space-tokenized text column; short texts
    fall back to the whole text as a single shingle."""
    toks = F.split(col, " ")
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array(col))


def char_shingles(col: Column, n: int = 3) -> Column:
    """Character n-gram shingles of ^col$ (boundary-marked); short strings
    fall back to the whole marked string."""
    s = F.concat(F.lit("^"), col, F.lit("$"))
    return F.when(
        F.length(s) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(s) - n + 1),
            lambda i: s.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array(s))


def minhash_bands(
    df: DataFrame,
    id_col: str,
    shingles: Column | None = None,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    hashes: Column | None = None,
) -> DataFrame:
    """(id_col, shingle-array expr) -> (id_col, band, band_hash), one row
    per band.  Signature i = min over shingles of the i-th universal
    affine transform of the shingle's base hash.

    Pass either ``shingles`` (string array; each element is md5-hashed
    here — the char-shingle path) or ``hashes`` (precomputed integer
    hash array — the word path via :func:`word_shingle_hashes`, which
    skips shingle string construction).

    Narrow by construction: hash array in one projection, then k
    ``array_min(transform(...))`` projections — no explode, no groupBy,
    no Exchange anywhere in this function."""
    if hashes is None:
        if shingles is None:
            raise ValueError("minhash_bands: pass either shingles or hashes")
        hashes = F.transform(shingles, lambda s: base_hash(s))
    rows_per_band = k // bands
    hashed = df.select(id_col, hashes.alias("__hs"))

    # the k signature projections are pure functions of (i,) over the
    # __hs column — memoized so repeated plan constructions (the band
    # build runs per query invocation on the dedup, cluster and
    # canonicalization paths) skip their py4j lambda roundtrips (r8,
    # functions/exprcache.py)
    def _sig_col(i: int):
        return XC.cached_column(
            ("minhash_sig", i),
            lambda: F.array_min(
                F.transform(F.col("__hs"), lambda h: _affine_sig(h, i))
            ).alias(f"sig{i}"),
        )

    sigs = hashed.select(id_col, *[_sig_col(i) for i in range(k)])
    band_cols = [
        f"{b}, md5(concat_ws('|', "
        + ", ".join(
            f"CAST(sig{b * rows_per_band + r} AS STRING)"
            for r in range(rows_per_band)
        )
        + "))"
        for b in range(bands)
    ]
    return sigs.selectExpr(
        id_col,
        f"stack({bands}, " + ", ".join(band_cols) + ") AS (band, band_hash)",
    )


def _affine_sig(h: Column, k: int) -> Column:
    a, b = _affine_consts(k)
    return ((h % _P) * F.lit(a) + F.lit(b)) % _P


# ---- DuckDB twins (used by plans/sql_queries.py and plans/kg_sql.py) ----


def duck_word_shingles(text_col: str, n: int = 3) -> str:
    toks = f"string_split({text_col}, ' ')"
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(range(1, len({toks}) - {n - 2}), "
        f"i -> array_to_string(({toks})[i:i+{n - 1}], ' ')) "
        f"ELSE [{text_col}] END"
    )


def duck_char_shingles(col: str, n: int = 3) -> str:
    mk = f"('^' || {col} || '$')"
    return (
        f"CASE WHEN len({mk}) >= {n} THEN "
        f"list_transform(range(1, len({mk}) - {n - 2}), "
        f"i -> substr({mk}, CAST(i AS INT), {n})) ELSE [{mk}] END"
    )


def duck_minhash_ctes(
    source: str,
    id_col: str,
    shingles_expr: str | None = None,
    prefix: str = "mh",
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    hashes_expr: str | None = None,
) -> str:
    """CTE text '<prefix>_sh AS (...), <prefix>_sigs AS (...),
    <prefix>_bands AS (...)' — the DuckDB value-twin of
    :func:`minhash_bands` (unnest + GROUP BY form; the Spark side uses
    narrow array expressions — same min over the same affine transforms
    of the same base hashes, so values are identical).  Embed after a
    WITH keyword."""
    rows_per_band = k // bands
    sig_cols = ", ".join(
        f"MIN(((h % {_P}) * {_affine_consts(i)[0]} + {_affine_consts(i)[1]}) "
        f"% {_P}) AS sig{i}"
        for i in range(k)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT {id_col}, {b} AS band, md5(concat_ws('|', "
        + ", ".join(
            f"CAST(sig{b * rows_per_band + r} AS VARCHAR)"
            for r in range(rows_per_band)
        )
        + f")) AS band_hash FROM {prefix}_sigs"
        for b in range(bands)
    )
    if hashes_expr is not None:
        sh_cte = (
            f"SELECT {id_col}, unnest({hashes_expr}) AS h FROM {source}"
        )
    else:
        base = BASE_HASH_DUCK.format(x="s")
        sh_cte = (
            f"SELECT {id_col}, {base} AS h "
            f"FROM (SELECT {id_col}, unnest({shingles_expr}) AS s "
            f"FROM {source})"
        )
    return f"""
    {prefix}_sh AS (
      {sh_cte}
    ),
    {prefix}_sigs AS (
      SELECT {id_col}, {sig_cols} FROM {prefix}_sh GROUP BY {id_col}
    ),
    {prefix}_bands AS (
      {band_selects}
    )"""


def band_candidate_pairs(
    bands_df: DataFrame,
    id_col: str,
    out_a: str = "src",
    out_b: str = "dst",
    persist: bool = True,
    persisted_out: list | None = None,
) -> DataFrame:
    """Self-equi-join on (band, band_hash), id_a < id_b, distinct.  The
    only join in the near-dup path — AQE-skew-splittable at scale.

    ``persist`` (default) caches the band rows before the self-join so the
    shingle explode + K-min-hash aggregation — the dominant cost of the
    whole dedup path — runs ONCE instead of once per join side (round 2
    computed it twice here and a third time in the Jaccard verify stage).
    Spark's cache manager is plan-keyed, so repeated calls over the same
    input reuse one entry, and downstream consumers of the same bands plan
    (the Jaccard verify join) hit the cache too.  MEMORY_AND_DISK: band
    rows are 2 small rows/doc — at true 100 TB scale a pipeline would
    materialize them to a table instead, which is the same idea durable.

    Cache lifetime: a long-lived session calling this over many distinct
    inputs would otherwise accumulate cache entries — pass a list as
    ``persisted_out`` to receive the persisted handle and
    ``.unpersist()`` it once the pairs (and any band-blocked verify
    stage sharing the plan) have been consumed."""
    if persist:
        from pyspark import StorageLevel

        bands_df = bands_df.persist(StorageLevel.MEMORY_AND_DISK)
        if persisted_out is not None:
            persisted_out.append(bands_df)
    a, b = bands_df.alias("a"), bands_df.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias(out_a), F.col(f"b.{id_col}").alias(out_b)
        )
        .distinct()
    )
