"""Deterministic entity gazetteer and sentence templates.

The reference consumes pre-computed Stanford NER annotations from the
TACRED JSON (ref:data/loader.py:114-116) — it never runs NER itself.  Our
pipeline starts from raw web pages, so mention detection must be supplied;
we use a closed-world gazetteer (longest-match) that is deterministic and
identically implementable in Spark (broadcast n-gram join) and in the
single-process oracle, making end-to-end triple parity exact.

All tokens are pre-tokenized (single spaces, punctuation as its own
token); the static vocabulary derives from this module so the model's
embedding table is corpus-size independent.
"""

from __future__ import annotations

from functools import lru_cache

from .. import constants as C

_FIRST = ("Alice", "John", "Maria", "Chen", "Ivan", "Fatima", "Erik", "Lucia")
_LAST = ("Turner", "Smith", "Garcia", "Wei", "Petrov", "Hassan", "Larsen", "Rossi")

PERSONS = tuple(f"{f} {l}" for f in _FIRST for l in _LAST)

ORGS = (
    "Acme Corp", "Globex Inc", "Initech Ltd", "Umbrella Group",
    "Vertex Labs", "Nimbus Systems", "Orion Partners", "Zenith Media",
    "Atlas Energy", "Quantum Works", "Helios Bank", "Polar Foods",
)

CITIES = (
    "Berlin", "Paris", "Madrid", "Tokyo", "Oslo", "Cairo", "Lima",
    "Dublin", "Vienna", "Prague",
)

COUNTRIES = (
    "Germany", "France", "Spain", "Japan", "Norway", "Egypt", "Peru",
    "Ireland",
)

TITLES = (
    "engineer", "director", "manager", "analyst", "scientist",
    "designer", "chairman", "economist",
)

YEARS = tuple(str(y) for y in range(1984, 2016, 3))

AGES = tuple(str(a) for a in range(24, 80, 7))

NATIONALITIES = ("German", "French", "Spanish", "Japanese", "Norwegian", "Egyptian")

#: surface phrase -> NER type (types from ref:utils/constant.py:24-26)
def build_gazetteer() -> dict[str, str]:
    g: dict[str, str] = {}
    for p in PERSONS:
        g[p] = "PERSON"
    for o in ORGS:
        g[o] = "ORGANIZATION"
    for c in CITIES:
        g[c] = "CITY"
    for c in COUNTRIES:
        g[c] = "COUNTRY"
    for t in TITLES:
        g[t] = "TITLE"
    for y in YEARS:
        g[y] = "DATE"
    for a in AGES:
        g[a] = "NUMBER"
    for n in NATIONALITIES:
        g[n] = "NATIONALITY"
    return g


MAX_PHRASE_TOKENS = 2

# sentence templates; slots are filled by the page generator.  Relations
# implied by templates are from the TACRED schema (per:title,
# org:founded_by, per:country_of_birth, per:age, org:city_of_headquarters,
# per:spouse, per:origin ...), giving the corpus realistic pair structure.
TEMPLATES = (
    "{P} is a {T} at {O} .",
    "{P} works as a {T} for {O} .",
    "{O} was founded by {P} in {Y} .",
    "{O} is based in {CITY} .",
    "{P} was born in {COUNTRY} in {Y} .",
    "{P} , {AGE} , lives in {CITY} .",
    "{P} is a {NAT} citizen .",
    "{P} married {P2} in {Y} .",
    "The market in {CITY} grew rapidly last year .",
    "Analysts expect strong results from the region .",
)

_FILLER_TOKENS = (
    "The", "market", "in", "grew", "rapidly", "last", "year", ".",
    "Analysts", "expect", "strong", "results", "from", "the", "region",
    "is", "a", "at", "works", "as", "for", "was", "founded", "by",
    "based", "born", ",", "lives", "citizen", "married",
)

# deterministic rule-based POS tagging (stands in for stanford_pos, which
# the model embeds but our closed world must synthesize identically on the
# Spark and oracle sides)
_VERBS = ("is", "was", "works", "lives", "grew", "expect", "founded",
          "based", "born", "married")
_PREPS = ("in", "at", "for", "as", "by", "from")
_DETS = ("the", "a", "The", "an")


def pos_tag(token: str) -> str:
    if token in (".", ","):
        return token
    if token.isdigit():
        return "CD"
    if token in _DETS:
        return "DT"
    if token in _PREPS:
        return "IN"
    if token in _VERBS:
        return "VBZ"
    if token[:1].isupper():
        return "NNP"
    return "NN"


@lru_cache(maxsize=1)
def static_vocab() -> dict[str, int]:
    """Corpus-independent word vocabulary: PAD, UNK, entity-mask tokens
    (ref:prepare_vocab.py:107-114 adds SUBJ-*/OBJ-* masks), then every
    token this closed world can produce, sorted."""
    masks = sorted(
        [f"SUBJ-{t}" for t in ("PERSON", "ORGANIZATION")]
        + [f"OBJ-{t}" for t in C.OBJ_NER_TO_ID if t not in (C.PAD_TOKEN, C.UNK_TOKEN)]
    )
    tokens: set[str] = set(_FILLER_TOKENS)
    for phrase in build_gazetteer():
        tokens.update(phrase.split(" "))
    ordered = [C.PAD_TOKEN, C.UNK_TOKEN] + masks + sorted(tokens)
    return {t: i for i, t in enumerate(ordered)}
