"""Single-process oracle for the full pages -> triples pipeline.

Plain-Python re-implementation of every pipeline stage (text extraction,
sentence split, tokenization, gazetteer NER with containment removal, pair
enumeration, preprocessing, naive forward pass).  Shares ONLY the weight
arrays and gazetteer data with the Spark plan — all logic is written
independently so the end-to-end parity test is meaningful
(SURVEY §5.3: identical triples required)."""

from __future__ import annotations

import re
from dataclasses import dataclass

from . import constants as C
from . import oracle
from .config import ModelConfig
from .sources import gazetteer as G
from .weights import Params

_SENT_RE = re.compile(r"(?<=\.)\s+")
_BODY_RE = re.compile(r"<p>(.*)</p>")


@dataclass(frozen=True)
class OracleTriple:
    url: str
    sent_id: int
    pair_id: int
    subj: str
    pred: str
    obj: str


def extract_text(html: bytes) -> str:
    m = _BODY_RE.search(html.decode("utf-8"))
    return m.group(1) if m else ""


def detect_mentions(tokens: list[str], gaz: dict[str, str]):
    """All gazetteer n-gram matches (n = 1..MAX), minus spans strictly
    contained in a longer match; sorted by (start, end, surface, type)."""
    found = []
    for n in range(1, G.MAX_PHRASE_TOKENS + 1):
        for i in range(0, len(tokens) - n + 1):
            surface = " ".join(tokens[i : i + n])
            if surface in gaz:
                found.append((i, i + n - 1, surface, gaz[surface]))
    kept = []
    for m in found:
        contained = any(
            o[0] <= m[0] and o[1] >= m[1] and (o[1] - o[0]) > (m[1] - m[0])
            for o in found
        )
        if not contained:
            kept.append(m)
    return sorted(kept)


def ner_tags(tokens: list[str], mentions) -> list[str]:
    tags = []
    for i in range(len(tokens)):
        t = "O"
        for (s, e, _surf, typ) in mentions:
            if s <= i <= e:
                t = typ
                break
        tags.append(t)
    return tags


def enumerate_pairs(mentions, cap: int):
    pairs = []
    for s in mentions:
        if s[3] not in ("PERSON", "ORGANIZATION"):
            continue
        for o in mentions:
            if o[0] == s[0] and o[1] == s[1]:
                continue
            pairs.append((s, o))
    return pairs[:cap]


def run_oracle_pipeline(
    pages: list[dict],
    params: Params,
    cfg: ModelConfig,
    vocab: dict[str, int] | None = None,
    cap: int = 12,
) -> list[OracleTriple]:
    """pages: list of {url, html(bytes), lang} dicts -> triples."""
    gaz = G.build_gazetteer()
    vocab = vocab if vocab is not None else G.static_vocab()
    out: list[OracleTriple] = []
    for page in pages:
        if page["lang"] != "en":
            continue
        text = extract_text(page["html"])
        sentences = [s for s in _SENT_RE.split(text) if s]
        for sent_id, sent in enumerate(sentences):
            tokens = sent.split(" ")
            if not (1 <= len(tokens) <= C.ABS_MAX_LEN):
                continue
            mentions = detect_mentions(tokens, gaz)
            tags = ner_tags(tokens, mentions)
            pos = [G.pos_tag(t) for t in tokens]
            for pair_id, (s, o) in enumerate(enumerate_pairs(mentions, cap)):
                ex = oracle.preprocess_example(
                    tokens,
                    subj_start=s[0], subj_end=s[1],
                    obj_start=o[0], obj_end=o[1],
                    subj_type=s[3], obj_type=o[3],
                    pos_tags=pos, ner_tags=tags,
                    vocab=vocab, lower=cfg.lower,
                )
                pred_id, _probs = oracle.naive_forward_example(params, cfg, ex)
                if pred_id != C.LABEL_TO_ID[C.NO_RELATION]:
                    out.append(
                        OracleTriple(
                            url=page["url"], sent_id=sent_id, pair_id=pair_id,
                            subj=s[2], pred=C.ID_TO_LABEL[pred_id], obj=o[2],
                        )
                    )
    return out
