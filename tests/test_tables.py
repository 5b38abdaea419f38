"""Lakehouse IO layer (sources/tables.py): the single seam where parquet
(sandbox) swaps for Iceberg (production) without touching pipeline code."""

import pyspark.sql.functions as F

from relation_extraction_transformer_spark.sources import pages as PG
from relation_extraction_transformer_spark.sources import tables as TB


def test_write_table_partitions_and_reads_back(spark, tmp_path):
    out = str(tmp_path / "pages_tbl")
    pages = PG.synthetic_pages(spark, 80, seed=3)
    TB.write_table(pages, out, partition_by=["lang"])
    back = TB.read_table(spark, out)
    assert back.count() == 80
    # lang partitioning makes the pipeline's lang filter a partition-
    # pruning predicate: the en-only scan reads only the en directory
    plan = (
        back.filter(F.col("lang") == "en")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "lang=en" in plan or "PartitionFilters: [isnotnull(lang" in plan


def test_read_table_catalog_path(spark, tmp_path):
    """fmt='iceberg' resolves a CATALOG TABLE NAME via spark.read.table —
    exercised here against a registered view (no Iceberg jars in this
    sandbox; the code path is identical, only the catalog differs)."""
    PG.synthetic_pages(spark, 20, seed=5).createOrReplaceTempView(
        "pages_catalog_test"
    )
    got = TB.read_table(spark, "pages_catalog_test", fmt="iceberg")
    assert got.count() == 20
    assert set(got.columns) == {"url", "warc_ts", "html", "lang", "text"}


def test_run_pipeline_reads_through_table_layer(spark, tmp_path):
    """run_pipeline --pages goes through TB.read_table, so a table-format
    switch needs no script change; smoke the parquet branch end to end."""
    src = str(tmp_path / "pages_in")
    out = str(tmp_path / "kg_out")
    TB.write_table(PG.synthetic_pages(spark, 40, seed=9), src)

    from relation_extraction_transformer_spark.plans import lineage as LIN

    pages = TB.read_table(spark, src)
    report = LIN.materialize_triples_resumable(
        spark, pages, out, run_id="tables-test", n_buckets=4,
        buckets_per_group=2,
    )
    assert report.rows_out > 0
    assert spark.read.parquet(f"{out}/triples").count() == report.rows_out
