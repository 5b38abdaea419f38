"""Web-scale robustness: a crawl delivers malformed bytes, empty payloads,
nulls, and paragraph-less HTML; ONE such page must never abort the job
(ANSI decode would: [MALFORMED_CHARACTER_CODING])."""

import datetime as dt

from relation_extraction_transformer_spark.plans import pipeline as PL
from relation_extraction_transformer_spark.sources import pages as PG


def _page(url, html, lang="en"):
    return (url, dt.datetime(2024, 1, 1), html, "", lang)


def test_pipeline_survives_garbage_pages(spark):
    good = PG.synthetic_pages(spark, 10, seed=42)
    garbage = spark.createDataFrame(
        [
            _page("https://h/1", b"\xff\xfe\x00<html><p>Alice Turner is a engineer at Acme Corp .</p></html>"),
            _page("https://h/2", b"<html>no paragraph at all</html>"),
            _page("https://h/3", b""),
            _page("https://h/4", None),
            _page("https://h/5", b"\x80\x81\x82\x83"),
        ],
        good.schema,
    )
    mixed = good.unionByName(garbage)
    triples = PL.triples_plan(mixed, spark, keep_probs=False).collect()
    good_only = PL.triples_plan(good, spark, keep_probs=False).collect()
    # the job completes, the valid pages' triples are unaffected, and the
    # recoverable garbage page (valid body after invalid prefix bytes)
    # still contributes
    keyed = {(r.url, r.sent_id, r.pair_id): (r.subj, r.pred, r.obj)
             for r in triples}
    for r in good_only:
        assert keyed[(r.url, r.sent_id, r.pair_id)] == (r.subj, r.pred, r.obj)
    assert any(r.url == "https://h/1" for r in triples), (
        "body after invalid prefix bytes should still extract"
    )
    assert not any(r.url in ("https://h/2", "https://h/3", "https://h/4",
                             "https://h/5") for r in triples)
