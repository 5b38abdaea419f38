"""P11: lemma-path text normalization (ref:utils/extract_lemmas.py:14-97).

The reference normalizes the space-joined sentence through an ordered
regex-rewrite chain and then runs spaCy lemmatization, asserting the token
count is preserved (ref:utils/extract_lemmas.py:122).  This path is OFF in
the shipped config (use_lemmas defaults False, ref:runner.py:94); it is
provided for surface parity.

The rewrite chain is expressed once as data (pattern, replacement) in
python-re syntax and compiled to both dialects:
- Spark: chained ``regexp_replace`` (Java regex; ``\\g<n>`` -> ``$n``,
  ``{,n}`` -> ``{0,n}``) — fully JVM-side
- oracle: ``re.sub`` in order

spaCy is not installed in this container, so the lemmatizer stage is a
clearly-marked deterministic stub (lowercase, which is the dominant effect
of ``tok.lemma_.lower()`` on regular tokens); the real spaCy call slots
into the same pandas-UDF contract.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered rewrite chain, verbatim semantics of
# ref:utils/extract_lemmas.py:18-97 (python-re syntax)
REWRITES: tuple[tuple[str, str], ...] = (
    (r"(\w),?\.?-(\w)", r"\g<1>_\g<2>"),
    (r"(\w),(\w)", r"\g<1>_\g<2>"),
    (r"(\w)-+(\w)", r"\g<1>_\g<2>"),
    (r"(\w)/(\w)/?(\w){,3}?/?(\w){,3}?", r"\g<1>_\g<2>"),
    (r"(\w)\.+([\w@])", r"\g<1>_\g<2>"),
    (r" '(\w)", r" \g<1>"),
    (r" '(\d)", r" \g<1>"),
    (r" \+(\d)", r" \g<1>"),
    (r" ,(\w)", r" \g<1>"),
    (r" ,(\d)", r"\g<1>"),
    (r" [:#]([\d\w-])", r" \g<1>"),
    (r"^[:#]([\d\w-])", r"\g<1>"),
    (r"(\w)[:!?=](\w)", r"\g<1>_\g<2>"),
    (r"(\w)[:!?=]([A-Z])", r"\g<1>_\g<2>"),
    (r" <(\w)", r" \g<1>"),
    (r"([\w\d])[>!?\]] ?", r"\g<1> "),
    (r"(\w)&(\w)", r"\g<1>_\g<2>"),
    (r"([\w\d])& ", r"\g<1> "),
    (r"(\w)\.", r"\g<1>"),
    (r"(\w)\* ", r"\g<1> "),
    (r"(\w)'", r"\g<1>"),
    (r"(\w): ", r"\g<1> "),
    (r"([\w\.]); ", r"\g<1> "),
    (r"(\w)_ ", r"\g<1> "),
    (r" ;([\d\w-])", r" \g<1>"),
    (r"(\d+)K ", r"\g<1>.000 "),
    (r"(\d+)[A-Za-z][A-Za-z]? ", r"\g<1> "),
    (r"(\d+)[A-Za-z][A-Za-z]?$", r"\g<1> "),
    (r"(\d+)m+ ", r"\g<1> "),
    (r"(\d+)pm ", r"\g<1> "),
    (r" [Ww]ed\.? ", " wedding "),
    (r" (couldnt|wouldnt) ", " would "),
    (r" wont ", " will "),
    (r" cant ", " can "),
    (r" didnt ", " did "),
    (r" thats ", " that "),
    (r"^thats ", "that "),
    (r" shes ", " she "),
    (r" hes ", " he "),
    (r" whats ", " what "),
    (r" wasnt ", " was "),
    (r" whos ", " who "),
    (r" shouldnt ", " should "),
    (r" theres ", " there "),
    (r" isnt ", " is "),
    (r" werent ", " were "),
    (r" dont ", " do "),
    (r" doesnt ", " does "),
    (r"Cant ", "Can "),
    (r"Hes ", "He "),
    (r"Thats ", "That "),
    (r" Hed ", " He "),
    (r" [Ii]m ", " I "),
    (r"^[Ii]m ", "I "),
    (r"([\!\?\*\_\=\.\#\']){1,}", r"\g<1>"),
    (r"(\w)\. ", r"\g<1> "),
    (r"(\w)\# ", r"\g<1> "),
    (r"(\w)=(\w)", r"\g<1>_\g<2>"),
)

_GROUP_REF = re.compile(r"\\g<(\d+)>")
_OPEN_BOUND = re.compile(r"\{,(\d+)\}")


def _to_java_pattern(pat: str) -> str:
    # python {,n} (= {0,n}) is invalid in Java regex
    return _OPEN_BOUND.sub(r"{0,\1}", pat)


def _to_java_replacement(rep: str) -> str:
    return _GROUP_REF.sub(r"$\1", rep)


def normalize_for_lemmas(col: Column) -> Column:
    """The full rewrite chain as chained JVM regexp_replace calls."""
    out = col
    for pat, rep in REWRITES:
        out = F.regexp_replace(out, _to_java_pattern(pat), _to_java_replacement(rep))
    return out


def normalize_for_lemmas_py(text: str) -> str:
    """Oracle form: re.sub in order (the reference's exact calls)."""
    for pat, rep in REWRITES:
        text = re.sub(pat, rep, text)
    return text


def lemmatize_tokens(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """Normalization + lemmatizer over a token-array column.

    Tries spaCy (the reference's lemmatizer); this container has no spaCy,
    so the STUB lowercases tokens (the dominant effect of
    ``tok.lemma_.lower()``) — clearly marked in the output column
    ``lemmatizer`` so downstream can tell which engine produced it.
    Preserves token count like the reference's assertion
    (ref:utils/extract_lemmas.py:122): if the rewrite chain changes the
    count, falls back to the original tokens for that row.
    """
    out_schema = df.schema.simpleString()[7:-1] + ",lemmas:array<string>,lemmatizer:string"

    try:
        import spacy  # noqa: F401

        have_spacy = True
    except Exception:
        have_spacy = False

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        nlp = None
        if have_spacy:
            import spacy

            nlp = spacy.load("en_core_web_lg")
        for pdf in batches:
            lemmas, engines = [], []
            for toks in pdf[tokens_col]:
                toks = list(toks)
                joined = normalize_for_lemmas_py(" ".join(toks))
                if nlp is not None:
                    doc = nlp(joined)
                    lem = [
                        t.lemma_.lower().strip()
                        if t.lemma_ != "-PRON-" else t.lower_
                        for t in doc
                    ]
                    engine = "spacy"
                else:
                    lem = [t.lower() for t in joined.split(" ") if t != ""]
                    engine = "stub-lower"
                if len(lem) != len(toks):
                    lem = toks  # count-preservation fallback
                    engine += "-fallback"
                lemmas.append(lem)
                engines.append(engine)
            pdf = pdf.copy()
            pdf["lemmas"] = lemmas
            pdf["lemmatizer"] = engines
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
