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

spaCy is not installed in this container; since round 5 the in-container
engine is a REAL conservative rule lemmatizer (``rule_lemma``: irregular
verb/noun table + plural/-ing/-ed suffix detachment with doubling-undo
and bounded e-restoration — morphy-style, but only the rules that stay
high-precision without the WordNet lexicon or POS tags).  spaCy remains
the preferred engine when installed and slots into the same pandas-UDF
contract; each row is labeled with the engine that produced it
(``spacy`` / ``rules-en``), and exact spaCy parity is NOT claimed — the
divergences are the documented cost of a dictionary-free engine.
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


# ---------------------------------------------------------------------------
# From-scratch rule lemmatizer (round 5): upgrades the in-container stage
# from lowercase-only to a real (if deliberately conservative) English
# lemmatizer.  Morphy-style suffix detachment without the WordNet lexicon:
# only rules that are high-precision WITHOUT a dictionary or POS tags are
# applied — irregular verb/noun table, plural -s/-es/-ies, -ing/-ed with
# consonant-doubling undo and short-stem e-restoration.  Adjective
# -er/-est is deliberately NOT handled (without POS it corrupts 'other',
# 'never', 'interest').  spaCy remains the preferred engine when
# installed; outputs are labeled ('spacy' / 'rules-en').
# ---------------------------------------------------------------------------

IRREGULAR_LEMMAS: dict[str, str] = {
    "was": "be", "were": "be", "is": "be", "are": "be", "am": "be",
    "been": "be", "being": "be",
    "has": "have", "had": "have", "having": "have",
    "does": "do", "did": "do", "done": "do", "doing": "do",
    "goes": "go", "went": "go", "gone": "go", "going": "go",
    "said": "say", "says": "say", "made": "make", "took": "take",
    "taken": "take", "came": "come", "saw": "see", "seen": "see",
    "got": "get", "gotten": "get", "knew": "know", "known": "know",
    "gave": "give", "given": "give", "found": "find",
    "thought": "think", "told": "tell", "became": "become",
    "felt": "feel", "brought": "bring", "began": "begin",
    "begun": "begin", "kept": "keep", "held": "hold", "wrote": "write",
    "written": "write", "stood": "stand", "heard": "hear",
    "meant": "mean", "met": "meet", "ran": "run", "paid": "pay",
    "sat": "sit", "spoke": "speak", "spoken": "speak", "led": "lead",
    "grew": "grow", "grown": "grow", "lost": "lose", "fell": "fall",
    "fallen": "fall", "sent": "send", "built": "build",
    "understood": "understand", "drew": "draw", "drawn": "draw",
    "broke": "break", "broken": "break", "spent": "spend",
    "rose": "rise", "risen": "rise", "drove": "drive",
    "driven": "drive", "bought": "buy", "wore": "wear", "worn": "wear",
    "chose": "choose", "chosen": "choose",
    "men": "man", "women": "woman", "children": "child",
    "feet": "foot", "teeth": "tooth", "mice": "mouse",
    "geese": "goose", "knives": "knife", "wives": "wife",
}

_VOWELS = "aeiou"

# -ing words that are NOT gerunds (or whose gerund reading is not the
# dominant one): stripping would corrupt top-frequency English words
# (review r5: 'during'->'dure', 'nothing'->'noth', 'string'->'str')
NON_GERUND_ING = frozenset(
    {
        "during", "nothing", "something", "anything", "everything",
        "morning", "evening", "spring", "string", "sterling",
        "sibling", "darling", "ceiling", "herring", "pudding",
        "shilling", "duckling", "dumpling", "gosling", "inkling",
        "offspring", "upbringing", "lightning", "cunning", "awning",
    }
)


def _undouble(stem: str) -> str:
    if len(stem) >= 3 and stem[-1] == stem[-2] and stem[-1] not in "lsz":
        return stem[:-1]
    return stem


def _maybe_restore_e(stem: str) -> str:
    """mak -> make, writ -> write.  Only for stems <= 4 chars: short
    monosyllabic CVC stems almost always dropped an -e; longer stems
    (visit-, creat-) more often did not, and a wrong -e is worse than a
    missing one for a dictionary-free engine."""
    if (
        3 <= len(stem) <= 4
        and stem[-1] in "bcdgkmnprstvz"
        and stem[-2] in _VOWELS
        and stem[-3] not in _VOWELS
    ):
        return stem + "e"
    return stem


def rule_lemma(token: str) -> str:
    """Lowercased lemma of one token via the conservative rule engine.
    Tokens with any non-ascii-letter character pass through lowercased
    (numbers, urls, the rewrite chain's ``_``-joined compounds)."""
    w = token.lower()
    if not w.isascii() or not w.isalpha():
        return w
    if w in IRREGULAR_LEMMAS:
        return IRREGULAR_LEMMAS[w]
    if w.endswith("ies") and len(w) >= 5:
        return w[:-3] + "y"
    if w.endswith("sses"):
        return w[:-2]
    if w.endswith(("ches", "shes", "xes", "zes")) and len(w) >= 5:
        return w[:-2]
    if (
        w.endswith("s")
        and len(w) >= 4
        and not w.endswith(("ss", "us", "is"))
    ):
        # plain -s strip also covers -es after a silent-e stem (ties,
        # houses, creates); -es after sibilants took the branches above
        return w[:-1]
    if w.endswith("ing") and len(w) >= 6 and w not in NON_GERUND_ING:
        stem = w[:-3]
        un = _undouble(stem)
        return un if un != stem else _maybe_restore_e(stem)
    if w.endswith("ied") and len(w) >= 5:
        return w[:-3] + "y"
    if w.endswith("ed") and len(w) >= 5:
        stem = w[:-2]
        un = _undouble(stem)
        if un != stem:
            return un
        # NB no "us" here: 'focused' must not become 'focuse' (review r5)
        if stem.endswith(("at", "iv", "ag", "iz")):
            return stem + "e"  # created, received, managed, realized
        return _maybe_restore_e(stem)
    return w


def lemmatize_tokens(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """Normalization + lemmatizer over a token-array column.

    Tries spaCy (the reference's lemmatizer); without it, the real
    in-container rule engine (:func:`rule_lemma`) lemmatizes — the
    output column ``lemmatizer`` labels which engine produced each row.
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
                    # real in-container engine (round 5): conservative
                    # rule lemmatizer — irregulars + plural/ing/ed
                    lem = [
                        rule_lemma(t) for t in joined.split(" ") if t != ""
                    ]
                    engine = "rules-en"
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
