"""Knowledge fusion + conflict resolution semantics on a hand-built
fixture — an oracle independent of the DuckDB twin: fused scores are
computed by hand from the quantized noisy-or formula, the conflict
winner/margin checked against those numbers."""

import math

import pytest
from pyspark.sql import functions as F

from relation_extraction_transformer_spark.plans import kg_sql as KQ


def _triples(spark, rows):
    return spark.createDataFrame(
        rows,
        "url string, subj string, subj_type string, pred string, "
        "obj string, obj_type string, prob double",
    )


def _score(probs):
    """The documented fusion formula: -sum of ln(1-p) rounded to 6dp."""
    return -sum(round(math.log(1.0 - min(p, 0.999999)), 6) for p in probs)


FIX = [
    # Bonn observed 3x from 2 urls; Kyoto 1x with one high prob
    ("u1", "Ada", "PERSON", "per:city_of_birth", "Bonn", "CITY", 0.30),
    ("u1", "Ada", "PERSON", "per:city_of_birth", "Bonn", "CITY", 0.20),
    ("u2", "Ada", "PERSON", "per:city_of_birth", "Bonn", "CITY", 0.25),
    ("u3", "Ada", "PERSON", "per:city_of_birth", "Kyoto", "CITY", 0.40),
    # non-functional predicate: never a conflict row
    ("u1", "Ada", "PERSON", "per:cities_of_residence", "Oslo", "CITY", 0.9),
    ("u2", "Ada", "PERSON", "per:cities_of_residence", "Lima", "CITY", 0.9),
    # single-candidate functional fact: fused but not conflicting
    ("u4", "Bob", "PERSON", "per:date_of_death", "2001", "DATE", 0.5),
]


def test_fusion_matches_hand_computed_noisy_or(spark):
    out = {
        (r.subj, r.pred, r.obj): r
        for r in KQ._kg_fusion_spark(
            spark, "", triples=_triples(spark, FIX)
        ).collect()
    }
    assert len(out) == 5
    bonn = out[("Ada", "per:city_of_birth", "Bonn")]
    assert (bonn.n_obs, bonn.n_urls) == (3, 2)
    assert bonn.fused_score == pytest.approx(
        _score([0.30, 0.20, 0.25]), abs=1e-12
    )
    kyoto = out[("Ada", "per:city_of_birth", "Kyoto")]
    assert (kyoto.n_obs, kyoto.n_urls) == (1, 1)
    assert kyoto.fused_score == pytest.approx(_score([0.40]), abs=1e-12)


def test_conflict_winner_margin_and_scope(spark):
    rows = KQ._kg_conflicts_spark(
        spark, "", triples=_triples(spark, FIX)
    ).collect()
    # only the genuinely contested functional (subj, pred) appears
    assert [(r.subj, r.pred) for r in rows] == [("Ada", "per:city_of_birth")]
    r = rows[0]
    bonn, kyoto = _score([0.30, 0.20, 0.25]), _score([0.40])
    assert bonn > kyoto  # accumulated weak evidence beats one strong hit
    assert r.winner_obj == "Bonn" and r.winner_obs == 3
    assert (r.n_candidates, r.total_obs) == (2, 4)
    assert r.winner_score == pytest.approx(bonn, abs=1e-12)
    assert r.margin == pytest.approx(bonn - kyoto, abs=1e-12)


def test_conflict_tie_breaks_are_deterministic(spark):
    """Equal fused scores and equal n_obs -> lexicographically smaller
    object wins, under any input partitioning."""
    tied = [
        ("u1", "Cy", "PERSON", "per:city_of_death", "Lima", "CITY", 0.3),
        ("u2", "Cy", "PERSON", "per:city_of_death", "Agra", "CITY", 0.3),
    ]
    for parts in (1, 5):
        out = KQ._kg_conflicts_spark(
            spark, "", triples=_triples(spark, tied).repartition(parts)
        ).collect()
        assert [(r.winner_obj, r.margin) for r in out] == [("Agra", 0.0)]
