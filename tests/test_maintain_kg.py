"""24/7 KG maintenance loop: a two-day fold-in simulation over the
frozen crawl must land on exactly the single-pass full rebuild — the
edge report AND the re-resolved conflicts — and state versions must
accumulate without the job ever overwriting the version it reads."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from maintain_kg import maintain  # noqa: E402

from relation_extraction_transformer_spark.operators import (  # noqa: E402
    incremental as INC,
)
from relation_extraction_transformer_spark.plans import kg_sql as KQ  # noqa: E402
from relation_extraction_transformer_spark.plans import pipeline as PL  # noqa: E402

PAGES = "/root/repo/artifacts/kg_pages.parquet"


@pytest.fixture(scope="module")
def split_pages(spark):
    pages = spark.read.parquet(PAGES)
    parity = F.crc32("url") % 2
    return pages.where(parity == 0), pages.where(parity == 1), pages


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_two_day_fold_equals_full_rebuild(spark, tmp_path, split_pages):
    day1, day2, full = split_pages
    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir)

    _, _, s1 = maintain(spark, day1, state_dir)
    assert s1["bootstrap"] and s1["state_version"] == 1
    report2, conflicts2, s2 = maintain(spark, day2, state_dir)
    assert not s2["bootstrap"] and s2["state_version"] == 2
    # both versions persisted; LATEST points at v2
    assert sorted(os.listdir(state_dir)) == ["LATEST", "v1", "v2"]

    # single-pass rebuild from the full crawl
    triples = PL.triples_plan(full, spark, keep_probs=False)
    obs = triples.select("url", "subj", "pred", "obj", "prob").join(
        full.select(
            "url", F.unix_timestamp("warc_ts").cast("bigint").alias("ts")
        ),
        "url",
    )
    rebuilt = INC.edge_state(obs)
    assert _rows(report2) == _rows(INC.edge_report(rebuilt))
    assert s2["edges"] == rebuilt.stats.count()

    # conflicts off standing state == the registered kg_conflicts query
    # over the same triples (one window implementation serves both)
    assert _rows(conflicts2) == _rows(
        KQ._kg_conflicts_spark(spark, "", triples=triples)
    )
    assert s2["conflicted_keys"] == len(_rows(conflicts2))
