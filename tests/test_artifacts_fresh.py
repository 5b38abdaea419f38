"""Guard against frozen-artifact drift: the committed artifacts/*.parquet
feed both sides of the kg_*/media_* oracle pairs, so if the deterministic
generators change without re-running scripts/freeze_artifacts.py the
oracles would silently verify stale data.  These tests pin the frozen
bytes to the live generator output."""

import duckdb
import numpy as np

from relation_extraction_transformer_spark.operators.multimodal import (
    render_media,
)
from relation_extraction_transformer_spark.plans.kg_sql import (
    MEDIA_PARQUET, PAGES_PARQUET, TRIPLES_PARQUET,
)
from relation_extraction_transformer_spark.sources.pages import render_page


def test_frozen_pages_match_generator():
    rows = duckdb.sql(
        f"SELECT url, html, text, lang FROM read_parquet('{PAGES_PARQUET}') "
        "ORDER BY url"
    ).fetchall()
    assert len(rows) == 300
    by_url = {r[0]: r for r in rows}
    for i in (0, 7, 150, 299):
        url, _ts, html, text, lang = render_page(i, 42)
        assert by_url[url][1] == html
        assert by_url[url][2] == text
        assert by_url[url][3] == lang


def test_frozen_media_match_generator():
    rows = duckdb.sql(
        f"SELECT media_id, kind, payload FROM read_parquet('{MEDIA_PARQUET}')"
    ).fetchall()
    assert len(rows) == 200
    by_id = {r[0]: r for r in rows}
    for i in (0, 3, 99, 199):
        mid, kind, payload, *_ = render_media(i, 42)
        assert by_id[mid][1] == kind
        assert bytes(by_id[mid][2]) == payload


def test_frozen_triples_match_pipeline(spark):
    """The frozen triples are the pipeline's own output over the frozen
    pages — recompute and compare exactly (fp32 preds are deterministic)."""
    from relation_extraction_transformer_spark.plans import pipeline as PL

    pages = spark.read.parquet(PAGES_PARQUET)
    live = {
        (r.url, r.sent_id, r.pair_id): (r.subj, r.pred, r.obj, r.prob)
        for r in PL.triples_plan(pages, spark, keep_probs=False).collect()
    }
    frozen = {
        (r[0], r[1], r[2]): (r[3], r[4], r[5], r[6])
        for r in duckdb.sql(
            "SELECT url, sent_id, pair_id, subj, pred, obj, prob "
            f"FROM read_parquet('{TRIPLES_PARQUET}')"
        ).fetchall()
    }
    assert set(live) == set(frozen)
    for k, (subj, pred, obj, prob) in live.items():
        fsubj, fpred, fobj, fprob = frozen[k]
        # triples (incl. predicted relation) must match exactly; prob may
        # wiggle in the last fp32 bits with Arrow batch composition
        assert (subj, pred, obj) == (fsubj, fpred, fobj), k
        assert abs(prob - fprob) < 1e-6, k
