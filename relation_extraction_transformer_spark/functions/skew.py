"""Skew handling: salted repartitioning for hot hosts/languages.

Common-Crawl page volume is heavily skewed by host (a few domains dominate)
and language.  A plain ``repartition(host)`` sends a hot host to one task;
salting fans each key over ``n_salts`` buckets.  The salt is derived from
``xxhash64(url)`` — deterministic (same input -> same placement, unlike
``rand()``) yet uniform within a key.

Used before the inference stage when the upstream source is key-clustered;
AQE's ``skewJoin`` handles the join-side skew (enabled in session conf),
this handles scan/UDF-side skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_of(url_col) -> F.Column:
    return F.regexp_extract(url_col, r"^https?://([^/]+)/", 1)


def salted_repartition(
    df: DataFrame,
    key_cols: list[str],
    n_partitions: int,
    n_salts: int = 8,
    salt_source: str = "url",
) -> DataFrame:
    """Repartition by (key, salt) so each hot key spreads over n_salts
    tasks; drops the salt column afterwards."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts))
    )
    out = salted.repartition(
        n_partitions, *[F.col(c) for c in key_cols], F.col("__salt")
    )
    return out.drop("__salt")


def partition_size_stats(df: DataFrame) -> DataFrame:
    """Diagnostic: rows per partition (skew visibility for lineage/metrics).
    """
    return (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("rows"))
        .orderBy("__pid")
    )
