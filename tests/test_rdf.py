"""RDF N-Triples serialization: golden escaping vectors on adversarial
entity surfaces, sink round-trip (files parse back to the exact fact
set), shard-concatenation validity, and a JVM-only plan guard."""

import glob
import re
import urllib.parse

from pyspark.sql import functions as F

from relation_extraction_transformer_spark.functions import rdf as R

ADVERSARIAL = [
    ("Acme Corp", "per:title", 'say "hi"'),
    ("50% off", "org:members", "a\\b"),
    ("<tag>", "per:employee_of", "curly{brace}"),
    ("pipe|caret^tick`", "org:dissolved", "plain"),
]


def _serialize(spark, rows):
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    return [
        r.ntriple
        for r in df.select(
            R.ntriple_line(F.col("subj"), F.col("pred"), F.col("obj")).alias(
                "ntriple"
            )
        ).collect()
    ]


def test_iri_encoding_matches_urllib_for_covered_chars(spark):
    """Percent-encoding agrees with urllib.parse.quote for every char
    the table covers (an independent implementation of the spec)."""
    covered = '%" <>\\|^`{}'
    for subj, pred, obj in ADVERSARIAL:
        line = _serialize(spark, [(subj, pred, obj)])[0]
        m = re.fullmatch(r"<([^>]*)> <([^>]*)> <([^>]*)> \.", line)
        assert m, line
        enc = urllib.parse.quote(subj, safe="".join(
            c for c in map(chr, range(33, 127)) if c not in covered
        ))
        assert m.group(1) == R.ENTITY_NS + enc


def test_sink_round_trip_recovers_exact_fact_set(spark, tmp_path):
    facts = [
        ("Ada Lovelace", "per:city_of_birth", "London"),
        ("Acme 100% Corp", "org:dissolved", "1999"),
        ("A<B>C", "per:title", "Chief \\ Engineer"),
    ]
    df = spark.createDataFrame(
        facts, "subj string, pred string, obj string"
    ).repartition(3)
    out = str(tmp_path / "kg.nt")
    R.write_ntriples(df, out)
    # concatenating the shards must itself be a valid N-Triples doc
    lines = []
    for f in sorted(glob.glob(out + "/part-*")):
        lines += open(f, encoding="utf-8").read().splitlines()
    assert len(lines) == len(facts)
    got = set()
    for ln in lines:
        m = re.fullmatch(r"<([^>]*)> <([^>]*)> <([^>]*)> \.", ln)
        assert m, ln
        s, p, o = (urllib.parse.unquote(g) for g in m.groups())
        assert s.startswith(R.ENTITY_NS) and p.startswith(R.REL_NS)
        got.add(
            (s[len(R.ENTITY_NS):], p[len(R.REL_NS):], o[len(R.ENTITY_NS):])
        )
    assert got == set(facts)


def test_literal_escaping_golden(spark):
    df = spark.createDataFrame([('a"b\\c\nd\te\rf',)], "v string")
    got = df.select(R.literal(F.col("v")).alias("l")).first().l
    assert got == '"a\\"b\\\\c\\nd\\te\\rf"'


def test_serialization_is_jvm_only(spark):
    df = spark.createDataFrame(ADVERSARIAL, "subj string, pred string, obj string")
    out = df.select(
        R.ntriple_line(F.col("subj"), F.col("pred"), F.col("obj")).alias("n")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_round_trip_fuzz(spark):
    """Hypothesis fuzz: ASCII surfaces INCLUDING control characters
    (tab/newline/CR/NUL and the rest of C0) survive serialize ->
    regex-parse -> unquote exactly — control chars must never land raw
    inside an IRIREF (the grammar forbids #x00-#x20)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    surface = st.text(
        alphabet=st.characters(min_codepoint=0, max_codepoint=126),
        min_size=1,
        max_size=24,
    )

    @settings(max_examples=25, deadline=None)
    @given(surface, surface, surface)
    def _check(s, p, o):
        line = _serialize(spark, [(s, p, o)])[0]
        m = re.fullmatch(r"<([^>]*)> <([^>]*)> <([^>]*)> \.", line)
        assert m, line
        for g in m.groups():  # IRIREF grammar: no raw control chars
            assert not any(ord(c) <= 0x20 for c in g), line
        su, pu, ou = (urllib.parse.unquote(g) for g in m.groups())
        assert (su, pu, ou) == (
            R.ENTITY_NS + s, R.REL_NS + p, R.ENTITY_NS + o
        )

    _check()


def test_null_component_propagates_to_null_line(spark):
    """A NULL subj/pred/obj yields a NULL statement (matching the DuckDB
    ``||`` chain) — never a truncated '<s> <p> .' malformed line."""
    rows = [("s", "p", None), ("s", None, "o"), (None, "p", "o"),
            ("s", "p", "o")]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = [
        r.n
        for r in df.select(
            R.ntriple_line(F.col("subj"), F.col("pred"), F.col("obj")).alias("n")
        ).collect()
    ]
    assert got.count(None) == 3
    (line,) = [g for g in got if g is not None]
    assert re.fullmatch(r"<([^>]*)> <([^>]*)> <([^>]*)> \.", line)


def test_duckdb_twin_byte_identical_on_control_chars(spark):
    """The DuckDB SQL twin emits byte-identical statements for surfaces
    carrying C0 control characters (chr(n)-based SQL quoting path)."""
    import duckdb

    rows = [
        ("a\tb", "per:title", "c\nd"),
        ("nul\x00mid", "org:members", "cr\rend"),
        ("esc\x1b", "per:age", "bell\x07"),
    ] + ADVERSARIAL
    spark_lines = _serialize(spark, rows)
    con = duckdb.connect()
    duck_lines = [
        con.execute(
            f"SELECT {R.duck_ntriple_sql('?', '?', '?')}", [s, p, o]
        ).fetchone()[0]
        for s, p, o in rows
    ]
    assert spark_lines == duck_lines
