"""Entity linking: mention surface form -> canonical entity id.

No reference counterpart (the reference stops at per-sentence
classification); mandated by the north rule.  Three deterministic steps:

1. surface normalization (JVM string ops)
2. candidate generation via broadcast join against an alias dictionary
   (alias -> entity); aliases include the full name plus, for persons,
   the family name, so one surface can yield several candidates
3. deterministic best-candidate scoring: exact-alias rank, then type
   agreement, then lowest entity_id — a window row_number, no UDF.

At web scale the alias dictionary outgrows a broadcast; the same plan
shape then runs as a salted sort-merge join (AQE skew-join enabled), which
is why candidate generation is expressed as a plain equi-join here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import gazetteer as G


def normalize_surface(col):
    """Deterministic surface normalization shared by dictionary and
    mentions: lowercase + whitespace squeeze."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def entity_dictionary(spark: SparkSession) -> DataFrame:
    """alias -> (entity_id, canonical_name, ner_type, alias_rank).

    entity ids are xxhash64 of 'type:canonical_name' — stable across runs
    and cluster sizes, no sequence/driver state.
    alias_rank: 0 = canonical surface, 1 = partial alias (person family
    name), used by the scorer.
    """
    rows = []
    for phrase, typ in sorted(G.build_gazetteer().items()):
        rows.append((phrase, phrase, typ, 0))
        if typ == "PERSON" and " " in phrase:
            rows.append((phrase.split(" ")[-1], phrase, typ, 1))
    df = spark.createDataFrame(
        rows, "alias string, canonical_name string, ner_type string, alias_rank int"
    )
    return df.select(
        normalize_surface(F.col("alias")).alias("alias_norm"),
        "canonical_name", "ner_type", "alias_rank",
        F.xxhash64(F.concat_ws(":", "ner_type", "canonical_name")).alias(
            "entity_id"
        ),
    )


def link_surface(
    df: DataFrame,
    dictionary: DataFrame,
    surface_col: str,
    type_col: str,
    out_prefix: str,
) -> DataFrame:
    """Attach ``<out_prefix>_entity_id`` / ``<out_prefix>_canonical`` to df
    by best-candidate linking of ``surface_col``."""
    key_cols = [c for c in df.columns]
    cands = (
        df.withColumn("__surf", normalize_surface(F.col(surface_col)))
        .join(
            F.broadcast(dictionary),
            F.col("__surf") == F.col("alias_norm"),
            "left",
        )
        .withColumn(
            "__type_match",
            F.when(F.col("ner_type") == F.col(type_col), 0).otherwise(1),
        )
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.asc("alias_rank"), F.asc("__type_match"), F.asc("entity_id")
    )
    best = (
        cands.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *key_cols,
            F.col("entity_id").alias(f"{out_prefix}_entity_id"),
            F.coalesce(F.col("canonical_name"), F.col(surface_col)).alias(
                f"{out_prefix}_canonical"
            ),
        )
    )
    return best


def link_triples(triples: DataFrame, dictionary: DataFrame) -> DataFrame:
    """triples (subj, pred, obj, ...) -> linked triples with entity ids.

    Unlinkable surfaces keep a synthetic id (xxhash64 of the raw surface)
    so downstream graph ops never see nulls.
    """
    linked = link_surface(triples, dictionary, "subj", "subj_type", "subj")
    linked = link_surface(linked, dictionary, "obj", "obj_type", "obj")
    return linked.withColumn(
        "subj_entity_id",
        F.coalesce("subj_entity_id", F.xxhash64(normalize_surface(F.col("subj")))),
    ).withColumn(
        "obj_entity_id",
        F.coalesce("obj_entity_id", F.xxhash64(normalize_surface(F.col("obj")))),
    )
