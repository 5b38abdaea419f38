"""Vocabulary + embedding-matrix build (SURVEY S2-S4, A1-A3, J1-J2, O4).

The Spark-native form of ref:prepare_vocab.py / ref:utils/vocab.py:

- token frequency count over the corpus        (A1, Counter -> groupBy)
- threshold + frequency-ranked ids             (A2/O4, with a fixed
  tie-break on token so ids are partition-count independent — the
  reference relies on CPython sort stability instead)
- GloVe text scan                              (S2, spark.read.text)
- vocab ∩ GloVe semi-join                      (J1, broadcast left-semi)
- vocab ⟕ vectors with seeded uniform fallback (J2; the reference draws
  np.random.uniform per missing row — we derive the fallback vector
  deterministically from the token hash so the result is stable under any
  row order)
- OOV-rate metrics                             (A3)

The finished vocab/matrix are collected (they are model-sized, not
data-sized) and broadcast — the same topology as the reference's
driver-held arrays (ref:runner.py:206-219).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import constants as C


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """A1 (ref:prepare_vocab.py:86-97): corpus token frequencies."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ranked_vocab(counts: DataFrame, threshold: int = 0) -> DataFrame:
    """A2/O4 (ref:utils/vocab.py:71-78): drop below-threshold tokens, rank
    by (cnt desc, token asc), ids offset by the PAD/UNK prefix.

    Two-phase distributed rank — the semantic twin of
    ``row_number() OVER (ORDER BY cnt DESC, token)`` with NO
    SinglePartition exchange (the same scheme as operators/packing.py):

      Phase A — a LOCAL row_number inside each ``(cnt, leading
      codepoint)`` group via a *partitioned* window; all groups rank in
      parallel.  Splitting ties on the leading codepoint keeps the giant
      low-frequency tie groups (Zipf tail: cnt==1 can be half the vocab)
      from serializing into one task, and is order-consistent with
      Spark's bytewise-UTF8 string comparator because UTF-8 byte order
      preserves codepoint order.

      Phase B — the group-size table (distinct cnt values × leading
      codepoints; vocab-metadata-sized, like packing's shard totals) is
      collected, prefix-summed driver-side in global ``(cnt desc, head
      asc)`` order, and the exclusive offsets broadcast-joined back:
      ``token_id = offset + local_rank + |PREFIX| - 1``.

    Row-identical to the global-window form for any input — including
    multibyte tokens and NULL/empty tokens
    (tests/test_vocab_scorer_ensemble.py::test_ranked_vocab_matches_global_window).
    """
    filtered = counts.filter(F.col("cnt") >= threshold) if threshold > 1 else counts
    spark = filtered.sparkSession
    base = len(C.VOCAB_PREFIX) - 1
    # Phases A and B both consume the counts; without a materialization
    # the upstream aggregation (corpus-wide explode + count — the
    # dominant cost) would run twice.  localCheckpoint rather than
    # persist: no cache entry outlives the call in a long-lived session
    # (the driver's 50-query battery), same discipline as the graph
    # queries' _materialize_release.
    headed = filtered.withColumn(
        "_hd", F.ascii(F.substring(F.col("token"), 1, 1))
    ).localCheckpoint(eager=True)
    local_w = Window.partitionBy("cnt", "_hd").orderBy(F.asc("token"))
    local = headed.withColumn("_lr", F.row_number().over(local_w))
    sizes = (
        headed.groupBy("cnt", "_hd")
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    # None-safe ordering (a NULL token row gives _hd = NULL; Python 3
    # cannot order None against int) — NULLS FIRST within a cnt group,
    # matching Spark's ASC NULLS FIRST default the window uses
    sizes.sort(
        key=lambda r: (-r["cnt"], r["_hd"] is not None, r["_hd"] or 0)
    )
    offs, run = [], 0
    for r in sizes:
        offs.append((r["cnt"], r["_hd"], run))
        run += r["_n"]
    schema = headed.select("cnt", "_hd").schema.add("_off", "long")
    off_df = spark.createDataFrame(offs, schema).select(
        F.col("cnt").alias("_off_cnt"),
        F.col("_hd").alias("_off_hd"),
        "_off",
    )
    # null-safe equi-join so a NULL-_hd row still finds its offset (the
    # packing.py phase-B discipline; a plain equi-join drops it)
    cond = F.col("cnt").eqNullSafe(F.col("_off_cnt")) & F.col(
        "_hd"
    ).eqNullSafe(F.col("_off_hd"))
    return (
        local.join(F.broadcast(off_df), cond)
        .withColumn(
            "token_id",
            (F.col("_off") + F.col("_lr") + F.lit(base)).cast("int"),
        )
        .select(*counts.columns, "token_id")
    )


def read_glove(spark: SparkSession, path: str, dim: int) -> DataFrame:
    """S2 (ref:utils/vocab.py:18-43): GloVe text file -> (token, vector).
    Token may contain spaces in pathological GloVe lines; the reference
    joins all leading fields (ref:utils/vocab.py:27) — replicated with a
    slice/concat split."""
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), " ")
    return lines.select(
        F.concat_ws(
            "", F.slice(parts, 1, F.size(parts) - dim)
        ).alias("token"),
        F.transform(
            F.slice(parts, -dim, dim), lambda x: x.cast("float")
        ).alias("vector"),
    )


def vocab_glove_semi_join(vocab: DataFrame, glove: DataFrame) -> DataFrame:
    """J1 (ref:prepare_vocab.py:86-97): keep corpus tokens present in
    GloVe."""
    return vocab.join(F.broadcast(glove.select("token")), "token", "left_semi")


def oov_stats(vocab: DataFrame, glove: DataFrame) -> DataFrame:
    """A3 (ref:prepare_vocab.py:100-104): matched vs total token mass."""
    joined = vocab.join(
        F.broadcast(glove.select("token", F.lit(1).alias("hit"))),
        "token",
        "left",
    )
    return joined.agg(
        F.sum("cnt").cast("long").alias("total_tokens"),
        F.sum(F.when(F.col("hit").isNull(), F.col("cnt")).otherwise(0))
        .cast("long").alias("oov_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum(F.when(F.col("hit").isNull(), 1).otherwise(0))
        .cast("long").alias("oov_vocab"),
    )


def _hash_uniform_vector(token: str, dim: int, lo=-1.0, hi=1.0) -> list[float]:
    """Deterministic per-token fallback vector (replaces the reference's
    row-order-dependent np.random.uniform init, ref:utils/vocab.py:20)."""
    seed = int.from_bytes(token.encode("utf-8")[:8].ljust(8, b"\0"), "little")
    rng = np.random.default_rng((seed, dim))
    return rng.uniform(lo, hi, dim).astype(np.float64).tolist()


def build_embedding_matrix(
    ranked: DataFrame, glove: DataFrame, dim: int
) -> np.ndarray:
    """J2 (ref:utils/vocab.py:18-30): PAD row zero, GloVe vector where
    present, deterministic uniform fallback otherwise.  Collected to a
    dense driver-side matrix for broadcasting."""
    joined = (
        ranked.join(F.broadcast(glove), "token", "left")
        .select("token", "token_id", "vector")
        .collect()
    )
    size = len(C.VOCAB_PREFIX) + len(joined)
    emb = np.zeros((size, dim))
    emb[C.UNK_ID] = _hash_uniform_vector(C.UNK_TOKEN, dim)
    for r in joined:
        emb[r.token_id] = (
            np.asarray(r.vector, dtype=np.float64)
            if r.vector is not None
            else _hash_uniform_vector(r.token, dim)
        )
    return emb
