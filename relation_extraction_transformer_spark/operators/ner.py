"""Sentence segmentation, tokenization, POS tagging and gazetteer NER.

The reference consumes pre-annotated ``stanford_pos`` / ``stanford_ner``
fields (ref:data/loader.py:114-116); our pipeline synthesizes them
deterministically from raw text, entirely JVM-side:

- sentences: regex split on sentence-final periods
- tokens: whitespace split (corpus is pre-tokenized web text)
- POS: rule CASE expression mirroring sources.gazetteer.pos_tag
- mentions: candidate n-grams (``transform`` over index sequences)
  broadcast-hash-joined against the gazetteer — the Spark-native form of
  dictionary NER.  No shuffle: the gazetteer side is broadcast, the
  containment filter is an array expression, not a self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import exprcache as XC
from ..sources import gazetteer as G

SENTENCE_SPLIT_REGEX = r"(?<=\.)\s+"


def split_sentences(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """pages -> (url, lang, sent_id, sentence); P-analog of the json scan
    exploding documents into sentence examples."""
    sent = F.posexplode(
        F.split(F.col(text_col), SENTENCE_SPLIT_REGEX)
    )
    return (
        pages.select("url", "lang", sent.alias("sent_id", "sentence"))
        .filter(F.length("sentence") > 0)
    )


def tokenize(sentences: DataFrame) -> DataFrame:
    return sentences.withColumn("tokens", F.split(F.col("sentence"), " "))


def pos_tags(tokens_col):
    """Rule POS tagger as a JVM CASE chain (== gazetteer.pos_tag)."""
    verbs = F.array(*[F.lit(v) for v in G._VERBS])
    preps = F.array(*[F.lit(p) for p in G._PREPS])
    dets = F.array(*[F.lit(d) for d in G._DETS])
    return F.transform(
        tokens_col,
        lambda t: F.when(t.isin(".", ","), t)
        .when(t.rlike("^[0-9]+$"), F.lit("CD"))
        .when(F.array_contains(dets, t), F.lit("DT"))
        .when(F.array_contains(preps, t), F.lit("IN"))
        .when(F.array_contains(verbs, t), F.lit("VBZ"))
        .when(t.rlike("^[A-Z]"), F.lit("NNP"))
        .otherwise(F.lit("NN")),
    )


def gazetteer_df(spark: SparkSession) -> DataFrame:
    rows = [
        (phrase, typ, len(phrase.split(" ")))
        for phrase, typ in sorted(G.build_gazetteer().items())
    ]
    return spark.createDataFrame(
        rows, "phrase string, ner_type string, n_tokens int"
    )


def _containment_filter(ms):
    """Drop spans strictly contained in a longer kept span."""
    return F.array_sort(
        F.filter(
            ms,
            lambda m: ~F.exists(
                ms,
                lambda o: (o["m_start"] <= m["m_start"])
                & (o["m_end"] >= m["m_end"])
                & ((o["m_end"] - o["m_start"]) > (m["m_end"] - m["m_start"])),
            ),
        )
    )


def detect_mentions(
    tokenized: DataFrame,
    gaz_map: dict[str, str] | None = None,
    max_phrase_tokens: int = G.MAX_PHRASE_TOKENS,
) -> DataFrame:
    """Longest-match gazetteer NER against a SMALL dictionary, entirely as
    array expressions over a map literal — no join, no explode, no shuffle.
    The whole sentence->mentions stage stays narrow, which is what makes
    the candidate generation embarrassingly parallel at 100 TB.

    For dictionaries too large for a map literal, use
    :func:`detect_mentions_join` (broadcast join path) instead.

    Output: url, sent_id, tokens, mentions array<struct> (sorted).
    """
    gaz_map = gaz_map if gaz_map is not None else G.build_gazetteer()
    gaz_items = tuple(sorted(gaz_map.items()))
    # the full mentions expression references only the "tokens" column,
    # so it is memoized per (dictionary, max_phrase_tokens) — building
    # it costs ~0.8 s of py4j roundtrips (254 literals + nested
    # lambdas), which the flagship otherwise pays on EVERY plan
    # construction (r8; see functions/exprcache.py)
    mentions = XC.cached_column(
        ("detect_mentions", gaz_items, max_phrase_tokens),
        lambda: _mentions_expr(gaz_items, max_phrase_tokens),
    )
    return tokenized.select("url", "sent_id", "tokens", mentions)


def _mentions_expr(
    gaz_items: tuple[tuple[str, str], ...], max_phrase_tokens: int
):
    """Build the (cacheable) mentions Column over the ``tokens`` column."""
    pairs: list = []
    for phrase, typ in gaz_items:
        pairs.append(F.lit(phrase))
        pairs.append(F.lit(typ))
    gmap = F.create_map(*pairs)
    # Catalyst's GetMapValue on a literal map is a LINEAR scan of all
    # entries per lookup; gate it behind a hashed InSet test on the
    # span's FIRST TOKEN (derived from the same dictionary, so the
    # result set is provably unchanged: a phrase match implies its
    # first word is in this set).  Most spans fail the set test and
    # never pay the O(|dict|) scan — measured ~2x on the NER stage (r8).
    first_words = sorted({phrase.split(" ")[0] for phrase, _ in gaz_items})

    # span candidates carry only (m_start, m_end) — the surface STRING
    # (a concat_ws over a token slice) is built only for spans whose
    # first token passes the InSet test, i.e. for the tiny fraction that
    # can possibly match (r8; previously every n-gram of every sentence
    # allocated its surface up front)
    toks = F.col("tokens")

    def _bare_spans(n: int):
        # NOTE: a `lambda i, n=n` default-arg capture would change the
        # lambda's ARITY, which pyspark's transform() reads as the
        # (element, index) form — hence the explicit closure factory
        return F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.struct(
                    i.alias("m_start"), (i + n - 1).alias("m_end")
                ),
            ),
        ).otherwise(F.array().cast("array<struct<m_start:int,m_end:int>>"))

    bare = F.concat(
        *[_bare_spans(n) for n in range(1, max_phrase_tokens + 1)]
    )
    candidates = F.transform(
        F.filter(
            bare,
            lambda sp: F.element_at(toks, sp["m_start"] + 1).isin(
                *first_words
            ),
        ),
        lambda sp: F.struct(
            sp["m_start"].alias("m_start"),
            sp["m_end"].alias("m_end"),
            F.concat_ws(
                " ",
                F.slice(toks, sp["m_start"] + 1, sp["m_end"] - sp["m_start"] + 1),
            ).alias("surface"),
        ),
    )
    typed = F.filter(
        F.transform(
            candidates,
            lambda sp: F.struct(
                sp["m_start"].alias("m_start"),
                sp["m_end"].alias("m_end"),
                sp["surface"].alias("surface"),
                F.element_at(gmap, sp["surface"]).alias("ner_type"),
            ),
        ),
        lambda m: m["ner_type"].isNotNull(),
    )
    return _containment_filter(typed).alias("mentions")


def detect_mentions_join(
    tokenized: DataFrame,
    gaz: DataFrame,
    max_phrase_tokens: int = G.MAX_PHRASE_TOKENS,
) -> DataFrame:
    """Longest-match gazetteer NER via broadcast join — the scale path for
    dictionaries with millions of surface forms (entity-linking style).

    1. generate all n-gram spans (n = 1..max) as (start, end, phrase)
    2. broadcast join against the gazetteer
    3. drop mentions strictly contained in a longer mention of the same
       sentence (leftmost-longest semantics for the nested case)

    Output: url, sent_id, tokens, mentions array<struct> (sorted).
    """
    grams = None
    for n in range(1, max_phrase_tokens + 1):
        g = tokenized.filter(F.size("tokens") >= n).select(
            "url", "sent_id", "tokens",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("tokens") - n),
                    lambda i: F.struct(
                        i.alias("m_start"),
                        (i + n - 1).alias("m_end"),
                        F.concat_ws(
                            " ", F.slice(F.col("tokens"), i + 1, n)
                        ).alias("surface"),
                    ),
                )
            ).alias("span"),
        )
        grams = g if grams is None else grams.unionByName(g)

    hits = (
        grams.select(
            "url", "sent_id", "tokens",
            F.col("span.m_start").alias("m_start"),
            F.col("span.m_end").alias("m_end"),
            F.col("span.surface").alias("surface"),
        )
        .join(
            F.broadcast(gaz.withColumnRenamed("phrase", "surface")),
            on="surface",
            how="inner",
        )
    )

    # containment removal without a self-join: collect each sentence's
    # mention spans once, keep spans not strictly inside another
    per_sent = hits.groupBy("url", "sent_id", "tokens").agg(
        F.collect_list(
            F.struct("m_start", "m_end", "surface", "ner_type")
        ).alias("ms")
    )
    kept = per_sent.select(
        "url", "sent_id", "tokens",
        # array_sort fixes the nondeterministic collect_list order (structs
        # compare field-by-field: m_start, then m_end)
        F.array_sort(
            F.filter(
                "ms",
                lambda m: ~F.exists(
                    "ms",
                    lambda o: (o["m_start"] <= m["m_start"])
                    & (o["m_end"] >= m["m_end"])
                    & (
                        (o["m_end"] - o["m_start"])
                        > (m["m_end"] - m["m_start"])
                    ),
                ),
            )
        ).alias("mentions"),
    )
    return kept


def ner_tags_from_mentions(kept: DataFrame) -> DataFrame:
    """Project mention spans back to a per-token NER tag sequence
    (the synthetic ``stanford_ner`` field)."""
    ner = XC.cached_column(
        ("ner_tags_from_mentions",),
        lambda: F.transform(
            F.sequence(F.lit(0), F.size("tokens") - 1),
            lambda i: F.coalesce(
                F.try_element_at(
                    F.filter(
                        "mentions",
                        lambda m: (i >= m["m_start"]) & (i <= m["m_end"]),
                    ),
                    F.lit(1),
                )["ner_type"],
                F.lit("O"),
            ),
        ),
    )
    return kept.withColumn("ner", ner)
