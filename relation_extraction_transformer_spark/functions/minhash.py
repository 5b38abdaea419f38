"""Shared MinHash / LSH-band core.

One parameterized implementation used by BOTH near-dup surfaces so the
LSH parameters (k, bands, salt format, band digest) cannot diverge:

- document near-dup (plans/sql_queries.py: minhash_bands,
  minhash_candidate_pairs, ngram_jaccard_buckets) over word 3-gram
  shingles
- entity canonicalization (operators/canonicalize.py) over char 3-gram
  shingles of normalized names

Scale shape: ONE explode over the shingle array, ONE partially-aggregating
groupBy computing all k min-hashes, a stack() unpivot to band rows, and an
equi-join on (band, band_hash) — never an all-pairs comparison.  All
hashing is md5 (identical lowercase hex in Spark and DuckDB, so the same
construction is expressible in the oracle dialect).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MINHASH_K = 8
MINHASH_BANDS = 2  # 2 bands x 4 rows


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
    shingles: Column,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
) -> DataFrame:
    """(id_col, shingle-array expr) -> (id_col, band, band_hash), one row
    per band.  Signature i = min(md5(f"{i}:" || shingle))."""
    rows_per_band = k // bands
    sh = df.select(id_col, F.explode(shingles).alias("s"))
    sigs = sh.groupBy(id_col).agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("s")))).alias(f"sig{i}")
            for i in range(k)
        ]
    )
    band_cols = [
        f"{b}, md5(concat_ws('|', "
        + ", ".join(f"sig{b * rows_per_band + r}" for r in range(rows_per_band))
        + "))"
        for b in range(bands)
    ]
    return sigs.selectExpr(
        id_col,
        f"stack({bands}, " + ", ".join(band_cols) + ") AS (band, band_hash)",
    )


def band_candidate_pairs(
    bands_df: DataFrame, id_col: str, out_a: str = "src", out_b: str = "dst"
) -> DataFrame:
    """Self-equi-join on (band, band_hash), id_a < id_b, distinct.  The
    only join in the near-dup path — AQE-skew-splittable at scale."""
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
