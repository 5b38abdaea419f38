"""Token masking and dictionary-id mapping (SURVEY §2.2 P1-P5, P12).

All JVM-side: entity masking is an indexed ``transform`` over the token
array; the small fixed dictionaries (POS/NER/DEPREL/labels) become map
literals with an UNK fallback (ref:data/loader.py:107-116,287-289).
The large word vocab is handled separately (broadcast dict inside the
Arrow inference UDF) because a 50k-entry map literal would bloat the plan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import constants as C
from . import exprcache as XC


def lower_tokens(tokens: Column) -> Column:
    """P1 (ref:data/loader.py:101-103)."""
    return F.transform(tokens, F.lower)


def mask_entity_spans(
    tokens: Column,
    subj_start: Column,
    subj_end: Column,
    obj_start: Column,
    obj_end: Column,
    subj_type: Column,
    obj_type: Column,
) -> Column:
    """P2: overwrite the subject span with ``SUBJ-<type>`` and the object
    span with ``OBJ-<type>`` (ref:data/loader.py:107-110).

    The reference applies the subject mask first, then the object mask, so
    on overlapping spans the object mask wins — replicated by checking the
    object span first here.
    """
    return F.transform(
        tokens,
        lambda x, i: F.when(
            (i >= obj_start) & (i <= obj_end), F.concat(F.lit("OBJ-"), obj_type)
        )
        .when(
            (i >= subj_start) & (i <= subj_end), F.concat(F.lit("SUBJ-"), subj_type)
        )
        .otherwise(x),
    )


def _map_literal(d: dict[str, int]) -> Column:
    # literal maps are pure functions of their entries: memoize the
    # Column so repeated plan constructions skip the 2x|d| py4j literal
    # roundtrips (r8, functions/exprcache.py)
    def build() -> Column:
        pairs: list[Column] = []
        for k, v in d.items():
            pairs.append(F.lit(k))
            pairs.append(F.lit(v))
        return F.create_map(*pairs)

    return XC.cached_column(
        ("map_literal", tuple(d.items())), build
    )


def map_tags_to_ids(tags: Column, tag_dict: dict[str, int]) -> Column:
    """P4: tag-sequence -> id-sequence with UNK fallback
    (ref:data/loader.py:114-116,287-289)."""
    m = _map_literal(tag_dict)
    return F.transform(
        tags, lambda x: F.coalesce(F.element_at(m, x), F.lit(C.UNK_ID))
    )


def label_to_id(label: Column) -> Column:
    """P5 forward map (ref:data/loader.py:188)."""
    m = _map_literal(C.LABEL_TO_ID)
    return F.coalesce(F.element_at(m, label), F.lit(C.LABEL_TO_ID[C.NO_RELATION]))


def id_to_label(label_id: Column) -> Column:
    """P5 inverse map (ref:runner.py:245, ref:eval.py:77)."""

    def build() -> Column:
        pairs: list[Column] = []
        for i, name in C.ID_TO_LABEL.items():
            pairs.append(F.lit(i))
            pairs.append(F.lit(name))
        return F.create_map(*pairs)

    m = XC.cached_column(("id_to_label_map",), build)
    return F.element_at(m, label_id.cast("int"))


def normalize_glove_token(token: Column) -> Column:
    """P12: bracket-token normalization (ref:utils/vocab.py:46-55)."""
    pairs: list[Column] = []
    for k, v in C.GLOVE_NORMALIZE.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    sm = F.create_map(*pairs)
    return F.coalesce(F.element_at(sm, token), token)
