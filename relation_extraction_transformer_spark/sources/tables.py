"""Lakehouse table IO: Iceberg in production, parquet in this sandbox.

The north rule targets Iceberg tables of web pages and nodes/edges
outputs.  This sandbox ships no Iceberg jars, so the engine routes all
table IO through this module: the SAME DataFrame code path, with the
format switched by ``RETS_TABLE_FORMAT`` (or the ``fmt`` argument).

Iceberg specifics handled here when enabled:
- writes go through ``writeTo(table).createOrReplace()`` (catalog tables,
  not paths), picking up partition specs via ``partitionedBy``
- reads use ``spark.read.table`` so snapshot isolation / time travel work
- dynamic partition overwrite maps to ``overwritePartitions()``

To enable on a real cluster:
    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.12:<ver> \
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.lake.type=hive ... \
      RETS_TABLE_FORMAT=iceberg ...
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def table_format() -> str:
    return os.environ.get("RETS_TABLE_FORMAT", "parquet").lower()


def read_table(spark: SparkSession, location: str, fmt: str | None = None) -> DataFrame:
    fmt = fmt or table_format()
    if fmt == "iceberg":
        return spark.read.table(location)
    return spark.read.parquet(location)


def write_table(
    df: DataFrame,
    location: str,
    fmt: str | None = None,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    fmt = fmt or table_format()
    if fmt == "iceberg":
        w = df.writeTo(location)
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "overwrite":
            w.createOrReplace()
        elif mode == "append":
            w.append()
        else:  # dynamic partition overwrite
            w.overwritePartitions()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if mode == "overwrite" and partition_by:
        w = w.option("partitionOverwriteMode", "dynamic")
    w.parquet(location)
