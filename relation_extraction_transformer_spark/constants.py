"""Fixed vocabularies and geometry of the TACRED relation-extraction task.

The id assignments must match the reference exactly so that preprocessing
parity holds (ref:utils/constant.py:14-32).  The tag sets themselves are the
public Stanford CoreNLP / TACRED vocabularies; we rebuild the id maps
programmatically from ordered tuples instead of hard-coding dict literals.
"""

from __future__ import annotations

PAD_TOKEN = "<PAD>"
UNK_TOKEN = "<UNK>"
PAD_ID = 0
UNK_ID = 1

# geometry (ref:data/loader.py:18, ref:utils/constant.py:11)
ABS_MAX_LEN = 96  # hard cap on sentence length
MAX_LEN = 100     # positional-embedding index offset

EMB_INIT_RANGE = 1.0

VOCAB_PREFIX = (PAD_TOKEN, UNK_TOKEN)

# --- ordered tag inventories (ids = 2 + position; 0/1 are PAD/UNK) ---------

_SUBJ_NER = ("ORGANIZATION", "PERSON")

_OBJ_NER = (
    "PERSON", "ORGANIZATION", "DATE", "NUMBER", "TITLE", "COUNTRY",
    "LOCATION", "CITY", "MISC", "STATE_OR_PROVINCE", "DURATION",
    "NATIONALITY", "CAUSE_OF_DEATH", "CRIMINAL_CHARGE", "RELIGION",
    "URL", "IDEOLOGY",
)

_NER = (
    "O", "PERSON", "ORGANIZATION", "LOCATION", "DATE", "NUMBER", "MISC",
    "DURATION", "MONEY", "PERCENT", "ORDINAL", "TIME", "SET",
)

_POS = (
    "NNP", "NN", "IN", "DT", ",", "JJ", "NNS", "VBD", "CD", "CC", ".",
    "RB", "VBN", "PRP", "TO", "VB", "VBG", "VBZ", "PRP$", ":", "POS",
    "''", "``", "-RRB-", "-LRB-", "VBP", "MD", "NNPS", "WP", "WDT",
    "WRB", "RP", "JJR", "JJS", "$", "FW", "RBR", "SYM", "EX", "RBS",
    "WP$", "PDT", "LS", "UH", "#",
)

_DEPREL = (
    "punct", "compound", "case", "nmod", "det", "nsubj", "amod", "conj",
    "dobj", "ROOT", "cc", "nmod:poss", "mark", "advmod", "appos",
    "nummod", "dep", "ccomp", "aux", "advcl", "acl:relcl", "xcomp",
    "cop", "acl", "auxpass", "nsubjpass", "nmod:tmod", "neg",
    "compound:prt", "mwe", "parataxis", "root", "nmod:npmod", "expl",
    "csubj", "cc:preconj", "iobj", "det:predet", "discourse", "csubjpass",
)

# relation schema: id 0 is the null class (ref:utils/constant.py:32)
_RELATIONS = (
    "per:title", "org:top_members/employees", "per:employee_of",
    "org:alternate_names", "org:country_of_headquarters",
    "per:countries_of_residence", "org:city_of_headquarters",
    "per:cities_of_residence", "per:age",
    "per:stateorprovinces_of_residence", "per:origin", "org:subsidiaries",
    "org:parents", "per:spouse", "org:stateorprovince_of_headquarters",
    "per:children", "per:other_family", "per:alternate_names",
    "org:members", "per:siblings", "per:schools_attended", "per:parents",
    "per:date_of_death", "org:member_of", "org:founded_by", "org:website",
    "per:cause_of_death", "org:political/religious_affiliation",
    "org:founded", "per:city_of_death", "org:shareholders",
    "org:number_of_employees/members", "per:date_of_birth",
    "per:city_of_birth", "per:charges", "per:stateorprovince_of_death",
    "per:religion", "per:stateorprovince_of_birth", "per:country_of_birth",
    "org:dissolved", "per:country_of_death",
)

NO_RELATION = "no_relation"


def _with_prefix(names: tuple[str, ...]) -> dict[str, int]:
    out = {PAD_TOKEN: PAD_ID, UNK_TOKEN: UNK_ID}
    for i, name in enumerate(names):
        out[name] = i + 2
    return out


SUBJ_NER_TO_ID = _with_prefix(_SUBJ_NER)
OBJ_NER_TO_ID = _with_prefix(_OBJ_NER)
NER_TO_ID = _with_prefix(_NER)
POS_TO_ID = _with_prefix(_POS)
DEPREL_TO_ID = _with_prefix(_DEPREL)

LABEL_TO_ID: dict[str, int] = {NO_RELATION: 0}
for _i, _r in enumerate(_RELATIONS):
    LABEL_TO_ID[_r] = _i + 1

ID_TO_LABEL: dict[int, str] = {v: k for k, v in LABEL_TO_ID.items()}

NUM_CLASSES = len(LABEL_TO_ID)
assert NUM_CLASSES == 42

# GloVe bracket-token normalization (ref:utils/vocab.py:46-55)
GLOVE_NORMALIZE = {
    "-LRB-": "(", "-RRB-": ")",
    "-LSB-": "[", "-RSB-": "]",
    "-LCB-": "{", "-RCB-": "}",
}
