"""Freeze the deterministic KG test corpora to parquet under artifacts/.

The driver's DuckDB oracle can only see data that exists as files, so the
synthetic pages / media corpora (and the pipeline's triples over them) are
materialized ONCE here and committed.  Both sides of every kg_* oracle
pair then read the same bytes:

- artifacts/kg_pages.parquet   pages(n=300, seed=42)   (pure python gen)
- artifacts/kg_media.parquet   media(n=200, seed=42)   (pure python gen)
- artifacts/kg_triples.parquet triples_plan over kg_pages (one Spark run;
  its correctness gate is the NumPy-oracle parity suite, tests/)

Regeneration is idempotent: the generators are seed-deterministic, so
re-running reproduces byte-identical rows (file bytes may differ by
pyarrow version; row content may not).

Usage: PYTHONPATH=/root/repo python scripts/freeze_artifacts.py
"""

from __future__ import annotations

import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
ART = os.path.join(REPO, "artifacts")

N_PAGES = 300
N_MEDIA = 200
SEED = 42


def freeze_pages() -> str:
    from relation_extraction_transformer_spark.sources.pages import render_page

    rows = [render_page(i, SEED) for i in range(N_PAGES)]
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us", tz="UTC")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    path = os.path.join(ART, "kg_pages.parquet")
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema, preserve_index=False), path
    )
    return path


def freeze_media() -> str:
    from relation_extraction_transformer_spark.operators.multimodal import (
        render_media,
    )

    rows = [render_media(i, SEED) for i in range(N_MEDIA)]
    pdf = pd.DataFrame(
        rows,
        columns=[
            "media_id", "kind", "payload", "mime", "width", "height",
            "duration_ms",
        ],
    )
    schema = pa.schema(
        [
            ("media_id", pa.int64()),
            ("kind", pa.string()),
            ("payload", pa.binary()),
            ("mime", pa.string()),
            ("width", pa.int32()),
            ("height", pa.int32()),
            ("duration_ms", pa.int32()),
        ]
    )
    path = os.path.join(ART, "kg_media.parquet")
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema, preserve_index=False), path
    )
    return path


def freeze_triples(pages_path: str) -> str:
    from pyspark.sql import SparkSession

    from relation_extraction_transformer_spark.plans import pipeline as PL

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_path)
    triples = PL.triples_plan(pages, spark, keep_probs=False)
    pdf = (
        triples.toPandas()
        .sort_values(["url", "sent_id", "pair_id"])
        .reset_index(drop=True)
    )
    spark.stop()
    path = os.path.join(ART, "kg_triples.parquet")
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("sent_id", pa.int32()),
            ("pair_id", pa.int32()),
            ("subj", pa.string()),
            ("subj_type", pa.string()),
            ("pred", pa.string()),
            ("obj", pa.string()),
            ("obj_type", pa.string()),
            ("prob", pa.float64()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(pdf[[f.name for f in schema]], schema=schema,
                             preserve_index=False),
        path,
    )
    return path


if __name__ == "__main__":
    os.makedirs(ART, exist_ok=True)
    p = freeze_pages()
    print("wrote", p)
    m = freeze_media()
    print("wrote", m)
    t = freeze_triples(p)
    print("wrote", t)
