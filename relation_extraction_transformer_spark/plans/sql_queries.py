"""SQL-checkable operator battery for the driver's DuckDB oracle gate.

Every entry registers a Spark implementation (DataFrame API) and an
equivalent ANSI/DuckDB SQL string over the driver-provided testdata views
(region nation customer supplier part orders lineitem events documents
embeddings).  Together they cover SURVEY §2's SQL-expressible inventory
(A1-A7, J1-J5, O1-O4, P1-P9) plus the training-data-pipeline extensions
(dedup, similarity search, text analysis).

Cross-engine determinism rules (so value hashes match):

- float SUMS are computed in DECIMAL (exact, order-independent) and cast
  to DOUBLE at the end;
- similarity math is quantized to BIGINT components before summing;
- ratios divide exact integers/decimals in one IEEE double op (correctly
  rounded -> identical in both engines), then ROUND(x, 6);
- every top-k has a total tie-broken ORDER BY;
- hash functions are md5 (identical lowercase hex in both engines).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import exprcache as XC
from ..functions import positions as POS

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    spark: SparkQuery
    oracle: str | None  # None -> driver runs a rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None):
    def deco(fn: SparkQuery) -> SparkQuery:
        REGISTRY[name] = QuerySpec(spark=fn, oracle=oracle)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def tb(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Balanced read for compute-heavy NARROW stages: when the scan
    yields fewer splits than the cluster has slots — the small-file
    case of guide §2.5 "input skew: ... repartition immediately after
    the read" — round-robin the rows across ``defaultParallelism``
    once, so the heavy per-row work engages every core instead of one
    task per tiny file.  Scale-adaptive, not a local[32] constant: at
    production input sizes the scan has far more splits than slots and
    this is the identity (no Exchange is added), so the narrow
    zero-shuffle plan shape is preserved exactly where it matters.
    Results are partitioning-independent (row-wise hashes + commutative
    aggregations downstream).

    Use ONLY where the per-row compute dwarfs a row's shuffle cost —
    the minhash signature build (per-token md5 + Horner + k affine
    minima per document), the shingle-array construction of the Jaccard
    verify stage, and the DECIMAL fact-side aggregation of the TPC-H
    core.  Measured r8: the same balancing applied to explode+aggregate
    queries (vocab counts, simhash bit sums, HLL/CMS sketches) made
    them SLOWER — their single-task compute is smaller than the added
    exchange + extra stage, so those read with t().

    Detection is BYTES-based, not split-count-based: Spark's
    ``files.minPartitionNum`` slices even a tiny single file into >=
    ``defaultParallelism`` byte ranges, but a parquet ROW GROUP belongs
    to whichever split holds its midpoint, so a single-row-group file
    still runs as one effective task no matter how many empty splits
    surround it — the split count cannot see that.  A sub-
    ``slots * 8 MB`` input is guaranteed cheaper to round-robin once
    than to risk serializing; anything larger keeps its native splits.
    Non-local paths (OSError) fall back to the split-count test."""
    df = t(spark, sf_dir, name)
    slots = spark.sparkContext.defaultParallelism
    path = f"{sf_dir}/{name}.parquet"
    try:
        import os as _os

        if _os.path.isdir(path):
            total = sum(
                _os.path.getsize(_os.path.join(root, f))
                for root, _, files in _os.walk(path)
                for f in files
            )
        else:
            total = _os.path.getsize(path)
        if total < slots * 8 * 1024 * 1024:
            return df.repartition(slots)
        return df
    except OSError:
        if df.rdd.getNumPartitions() < slots:
            return df.repartition(slots)
        return df


# ===========================================================================
# §1 TPC-H-style relational core: scan / filter / aggregate / join / top-k
# ===========================================================================

_DEC = "DECIMAL(18,2)"

register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS {_DEC})) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS {_DEC}) * CAST(1 - l_discount AS {_DEC})) AS DOUBLE) AS sum_disc_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)(
    # r8: tb() — the single-row-group testdata file otherwise runs the
    # whole DECIMAL partial aggregation in one task (identity at
    # production split counts)
    lambda spark, sf: tb(spark, sf, "lineitem")
    .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    .groupBy("l_returnflag", "l_linestatus")
    .agg(
        F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double").alias("sum_base_price"),
        F.sum(
            F.col("l_extendedprice").cast(_DEC)
            * (F.lit(1) - F.col("l_discount")).cast(_DEC)
        ).cast("double").alias("sum_disc_price"),
        F.count(F.lit(1)).alias("count_order"),
    )
)


register(
    "q3_shipping_priority",
    f"""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS {_DEC}) * CAST(1 - l_discount AS {_DEC})) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)(
    lambda spark, sf: t(spark, sf, "customer")
    .filter(F.col("c_mktsegment") == "BUILDING")
    .join(
        t(spark, sf, "orders").filter(
            F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
        ),
        F.col("c_custkey") == F.col("o_custkey"),
    )
    .join(
        # r8: tb() measured a LOSS here (the lineitem side feeds a
        # broadcast-join probe chain, not a direct aggregation — the
        # added exchange costs more than the parallel probe saves);
        # only q1's scan->aggregate shape keeps the balanced read
        t(spark, sf, "lineitem").filter(
            F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
        ),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    .groupBy("l_orderkey", "o_orderdate")
    .agg(
        F.sum(
            F.col("l_extendedprice").cast(_DEC)
            * (F.lit(1) - F.col("l_discount")).cast(_DEC)
        ).cast("double").alias("revenue")
    )
    .select("l_orderkey", "revenue", "o_orderdate")
    .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
    .limit(10)
)


register(
    "q5_region_revenue",
    f"""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS {_DEC}) * CAST(1 - l_discount AS {_DEC})) AS DOUBLE) AS revenue
    FROM region JOIN nation ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
                JOIN orders ON o_custkey = c_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
                JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = n_nationkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)(
    lambda spark, sf: t(spark, sf, "region")
    .filter(F.col("r_name") == "ASIA")
    .join(t(spark, sf, "nation"), F.col("n_regionkey") == F.col("r_regionkey"))
    .join(t(spark, sf, "customer"), F.col("c_nationkey") == F.col("n_nationkey"))
    .join(t(spark, sf, "orders"), F.col("o_custkey") == F.col("c_custkey"))
    .join(t(spark, sf, "lineitem"), F.col("l_orderkey") == F.col("o_orderkey"))
    .join(
        t(spark, sf, "supplier"),
        (F.col("s_suppkey") == F.col("l_suppkey"))
        & (F.col("s_nationkey") == F.col("n_nationkey")),
    )
    .groupBy("n_name")
    .agg(
        F.sum(
            F.col("l_extendedprice").cast(_DEC)
            * (F.lit(1) - F.col("l_discount")).cast(_DEC)
        ).cast("double").alias("revenue")
    )
)


register(
    "top_customer_per_nation",
    f"""
    WITH spend AS (
      SELECT c_nationkey, c_custkey, c_name,
             SUM(CAST(o_totalprice AS {_DEC})) AS total
      FROM customer JOIN orders ON o_custkey = c_custkey
      GROUP BY c_nationkey, c_custkey, c_name
    )
    SELECT c_nationkey, c_custkey, c_name,
           CAST(total AS DOUBLE) AS total_spend
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY c_nationkey ORDER BY total DESC, c_custkey) AS rn
          FROM spend)
    WHERE rn = 1
    """,
)(
    lambda spark, sf: t(spark, sf, "customer")
    .join(t(spark, sf, "orders"), F.col("o_custkey") == F.col("c_custkey"))
    .groupBy("c_nationkey", "c_custkey", "c_name")
    .agg(F.sum(F.col("o_totalprice").cast(_DEC)).alias("total"))
    .withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("c_nationkey").orderBy(
                F.desc("total"), F.asc("c_custkey")
            )
        ),
    )
    .filter(F.col("rn") == 1)
    .select(
        "c_nationkey", "c_custkey", "c_name",
        F.col("total").cast("double").alias("total_spend"),
    )
)


register(
    "orders_with_shipped_items",  # left-semi join (J1 analog)
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > TIMESTAMP '2000-01-01')
    GROUP BY o_orderpriority
    """,
)(
    lambda spark, sf: t(spark, sf, "orders")
    .join(
        t(spark, sf, "lineitem").filter(
            F.col("l_shipdate") > F.lit("2000-01-01").cast("timestamp")
        ),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_semi",
    )
    .groupBy("o_orderpriority")
    .agg(F.count(F.lit(1)).alias("order_count"))
)


# ===========================================================================
# §2 Vocabulary build (SURVEY A1-A3, O4, J1): documents as the corpus
# ===========================================================================

register(
    "vocab_counts",  # A1 + A2 threshold (ref:prepare_vocab.py:86-97)
    """
    SELECT token, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token HAVING COUNT(*) >= 10
    """,
)(
    lambda spark, sf: t(spark, sf, "documents")
    .select(F.explode(F.split("text", " ")).alias("token"))
    .groupBy("token")
    .agg(F.count(F.lit(1)).alias("cnt"))
    .filter(F.col("cnt") >= 10)
)


def _vocab_ranked_spark(spark, sf):
    # two-phase distributed rank (operators/vocab.ranked_vocab): identical
    # rows to the global-window SQL below, but no SinglePartition exchange
    from ..operators.vocab import ranked_vocab

    return ranked_vocab(
        t(spark, sf, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 10)
    )


register(
    "vocab_ranked",  # O4: ids by desc frequency, deterministic tie-break
    # (ref:utils/vocab.py:71-78; ids offset by 2 for PAD/UNK)
    """
    SELECT token, cnt,
           ROW_NUMBER() OVER (ORDER BY cnt DESC, token) + 1 AS token_id
    FROM (
      SELECT token, COUNT(*) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY token HAVING COUNT(*) >= 10
    )
    """,
)(
    _vocab_ranked_spark
)


register(
    "oov_rate",  # A3 (ref:prepare_vocab.py:100-104): non-en tokens vs en vocab
    """
    WITH en_vocab AS (
      SELECT DISTINCT unnest(string_split(text, ' ')) AS token
      FROM documents WHERE lang = 'en'
    ),
    toks AS (
      SELECT lang, unnest(string_split(text, ' ')) AS token
      FROM documents WHERE lang <> 'en'
    )
    SELECT lang,
           COUNT(*) AS total_tokens,
           COUNT(*) FILTER (WHERE token NOT IN (SELECT token FROM en_vocab))
             AS oov_tokens
    FROM toks GROUP BY lang
    """,
)(
    lambda spark, sf: (
        lambda docs: docs.filter(F.col("lang") != "en")
        .select("lang", F.explode(F.split("text", " ")).alias("token"))
        .join(
            F.broadcast(
                docs.filter(F.col("lang") == "en")
                .select(F.explode(F.split("text", " ")).alias("token"))
                .distinct()
                .withColumn("in_vocab", F.lit(1))
            ),
            "token",
            "left",
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("total_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias(
                "oov_tokens"
            ),
        )
    )(t(spark, sf, "documents"))
)


# ===========================================================================
# §3 Text analysis: token stats, quality, language guess, fingerprint
# ===========================================================================

register(
    "token_stats",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           length(text) AS text_chars,
           ROUND(CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS avg_token_len
    FROM documents
    """,
)(
    lambda spark, sf: t(spark, sf, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.length("text").alias("text_chars"),
        F.round(
            (F.length("text") - F.size(F.split("text", " ")) + 1).cast("double")
            / F.size(F.split("text", " ")),
            6,
        ).alias("avg_token_len"),
    )
)


register(
    "quality_scores",  # type-token ratio + stopword ratio as quality features
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    )
    SELECT doc_id,
           len(l) AS n_tokens,
           len(list_distinct(l)) AS n_distinct,
           ROUND(CAST(len(list_distinct(l)) AS DOUBLE) / len(l), 6) AS ttr,
           len(list_filter(l, x -> x IN ('the', 'a'))) AS stopword_hits
    FROM toks
    """,
)(
    lambda spark, sf: t(spark, sf, "documents")
    .select("doc_id", F.split("text", " ").alias("l"))
    .select(
        "doc_id",
        F.size("l").alias("n_tokens"),
        F.size(F.array_distinct("l")).alias("n_distinct"),
        F.round(
            F.size(F.array_distinct("l")).cast("double") / F.size("l"), 6
        ).alias("ttr"),
        F.size(F.filter("l", lambda x: x.isin("the", "a"))).alias(
            "stopword_hits"
        ),
    )
)


def _spark_repetition_scores(spark, sf):
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1): the
    standard Common-Crawl quality signals — most-frequent-token fraction
    and duplicate-bigram fraction — as NARROW array expressions.  The top
    token count is the longest equal run in the sorted token array,
    computed with one F.aggregate fold (no explode, no shuffle)."""
    toks = F.split("text", " ")
    n = F.size(toks)
    srt = F.array_sort(toks)
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc, x):
        new_run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            new_run.alias("run"),
            F.greatest(acc["best"], new_run).alias("best"),
        )

    top_cnt = F.aggregate(srt, init, step, lambda acc: acc["best"])
    bg = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return t(spark, sf, "documents").select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(
            F.size(F.array_distinct(toks)).cast("double") / n, 6
        ).alias("distinct_token_ratio"),
        F.round(top_cnt.cast("double") / n, 6).alias("top_token_ratio"),
        F.when(n >= 2,
               F.round(
                   F.lit(1.0)
                   - F.size(F.array_distinct(bg)).cast("double") / F.size(bg),
                   6,
               )).otherwise(F.lit(0.0)).alias("dup_bigram_ratio"),
    )


register(
    "repetition_scores",  # Gopher-style repetition/quality filters
    # DuckDB twin: top token count = max per-token count (== longest
    # equal run in the sorted list); list-expression form, value-equal
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    bg AS (
      SELECT doc_id, l,
             CASE WHEN len(l) >= 2 THEN
               list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])
             ELSE [] END AS b
      FROM toks
    )
    SELECT doc_id,
           len(l) AS n_tokens,
           ROUND(CAST(len(list_distinct(l)) AS DOUBLE) / len(l), 6)
             AS distinct_token_ratio,
           ROUND(CAST(list_max(list_transform(list_distinct(l),
                 t -> len(list_filter(l, x -> x = t)))) AS DOUBLE) / len(l), 6)
             AS top_token_ratio,
           CASE WHEN len(l) >= 2 THEN
             ROUND(1.0 - CAST(len(list_distinct(b)) AS DOUBLE) / len(b), 6)
           ELSE 0.0 END AS dup_bigram_ratio
    FROM bg
    """,
)(_spark_repetition_scores)


def _spark_corpus_filter(spark, sf):
    """The composed keep/drop decision of a training-data cleaning job:
    length, repetition, and type-token-ratio gates evaluated per document
    with the failed-rule names carried as an array (the audit trail real
    cleaning pipelines keep).  Pure narrow expressions over the same
    signals as quality_scores / repetition_scores."""
    toks = F.split("text", " ")
    n = F.size(toks)
    ttr = F.size(F.array_distinct(toks)).cast("double") / n
    bg = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    dup_bg = F.when(
        n >= 2,
        F.lit(1.0) - F.size(F.array_distinct(bg)).cast("double") / F.size(bg),
    ).otherwise(F.lit(0.0))
    reasons = F.array_compact(
        F.array(
            F.when(n < 10, F.lit("too_short")),
            F.when(n > 5000, F.lit("too_long")),
            F.when(ttr < 0.2, F.lit("low_ttr")),
            F.when(dup_bg > 0.3, F.lit("repetitive")),
            F.when(F.col("lang") != "en", F.lit("non_english")),
        )
    )
    return t(spark, sf, "documents").select(
        "doc_id",
        n.alias("n_tokens"),
        # joined string, not array: the driver's cross-engine value hash
        # compares scalar columns
        F.array_join(reasons, ",").alias("drop_reasons"),
        (F.size(reasons) == 0).alias("keep"),
    )


register(
    "corpus_filter_decisions",  # composed cleaning gates + audit trail
    """
    WITH sig AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS n,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) AS ttr,
             CASE WHEN len(string_split(text, ' ')) >= 2 THEN
               1.0 - CAST(len(list_distinct(list_transform(
                       range(1, len(string_split(text, ' '))),
                       i -> (string_split(text, ' '))[i] || ' ' ||
                            (string_split(text, ' '))[i+1]))) AS DOUBLE)
                   / (len(string_split(text, ' ')) - 1)
             ELSE 0.0 END AS dup_bg
      FROM documents
    ),
    r AS (
      SELECT doc_id, n,
             list_filter([
               CASE WHEN n < 10 THEN 'too_short' END,
               CASE WHEN n > 5000 THEN 'too_long' END,
               CASE WHEN ttr < 0.2 THEN 'low_ttr' END,
               CASE WHEN dup_bg > 0.3 THEN 'repetitive' END,
               CASE WHEN lang <> 'en' THEN 'non_english' END
             ], x -> x IS NOT NULL) AS drop_reasons
      FROM sig
    )
    SELECT doc_id, n AS n_tokens,
           COALESCE(array_to_string(drop_reasons, ','), '') AS drop_reasons,
           len(drop_reasons) = 0 AS keep
    FROM r
    """,
)(_spark_corpus_filter)


def _spark_stratified_sample(spark, sf):
    """Deterministic hash-based stratified sampling: per-language keep
    rates applied with an md5-derived uniform — reproducible across
    runs, partitionings, and engines (no rand()).  The downsampling
    primitive of corpus curation (e.g. keep all 'en', thin the rest)."""
    rates = F.when(F.col("lang") == "en", F.lit(1.0)).otherwise(F.lit(0.25))
    # md5 hex chars [1..8] -> 32-bit int -> uniform in [0, 1)
    u = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit("sample"), "doc_id")), 1, 8),
        16, 10,
    ).cast("double") / F.lit(float(1 << 32))
    return (
        t(spark, sf, "documents")
        .filter(u < rates)
        .select("doc_id", "lang")
    )


register(
    "stratified_sample",  # deterministic per-stratum downsampling
    f"""
    SELECT doc_id, lang FROM documents
    WHERE CAST(('0x' || substr(md5('sample|' || CAST(doc_id AS VARCHAR)),
                               1, 8)) AS BIGINT) / {float(1 << 32)}
          < CASE WHEN lang = 'en' THEN 1.0 ELSE 0.25 END
    """,
)(_spark_stratified_sample)


_PACK_LEN = 512


def _spark_pack_segments(spark, sf):
    """Sequence packing for pretraining: documents are concatenated in a
    deterministic global order (doc_id) and cut into fixed-length packs
    of {_PACK_LEN} tokens — the 'document concatenation' packing used to
    build LLM training sequences.  Runs the scale-safe two-phase form
    (operators/packing.py: range-sharded partitioned window + broadcast
    shard offsets, no SinglePartition exchange); the global single-window
    twin survives only as the DuckDB oracle below, and
    tests/test_packing.py asserts the two are row-identical."""
    from ..operators.packing import pack_segments

    docs = t(spark, sf, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    return pack_segments(docs, pack_len=_PACK_LEN)


register(
    "pack_segments",  # pretraining sequence packing (window cumsum)
    f"""
    WITH d AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM d
    )
    SELECT doc_id, n_tokens,
           CAST(FLOOR((cum - n_tokens) / {_PACK_LEN}.0) AS BIGINT) AS pack_id,
           CAST((cum - n_tokens) % {_PACK_LEN} AS BIGINT) AS pack_offset,
           FLOOR((cum - n_tokens) / {_PACK_LEN}.0)
             <> FLOOR((cum - 1) / {_PACK_LEN}.0) AS crosses_boundary
    FROM c
    """,
)(_spark_pack_segments)


def _spark_bpe_merge_candidates(spark, sf):
    """First iteration of BPE tokenizer training (operators/bpe.py): the
    adjacent-symbol pair counts over the word-frequency table, top 50
    with a total deterministic order.  The distributed part of BPE
    learning — the merge loop itself runs driver-side over this
    vocabulary-sized table."""
    from ..operators.bpe import EOW, word_frequencies

    wf = word_frequencies(t(spark, sf, "documents"))
    L = F.length("word")
    word = F.col("word")
    inner = F.when(
        L >= 2,
        F.transform(
            F.sequence(F.lit(1), L - 1),
            lambda i: F.concat(word.substr(i, F.lit(1)),
                               word.substr(i + 1, F.lit(1))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pairs = F.concat(
        inner, F.array(F.concat(word.substr(L, F.lit(1)), F.lit(EOW)))
    )
    return (
        wf.select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.desc("cnt"), "pair")
        .limit(50)
    )


register(
    "bpe_merge_candidates",  # BPE training iteration 1: pair counts
    """
    WITH wf AS (
      SELECT word, COUNT(*) AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
      ) WHERE word <> '' GROUP BY word
    ),
    p AS (
      SELECT unnest(list_concat(
               CASE WHEN len(word) >= 2 THEN
                 list_transform(range(1, len(word)),
                   i -> substr(word, CAST(i AS INT), 1)
                        || substr(word, CAST(i + 1 AS INT), 1))
               ELSE [] END,
               [substr(word, len(word), 1) || '</w>']
             )) AS pair, freq
      FROM wf
    )
    SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM p
    GROUP BY pair ORDER BY cnt DESC, pair LIMIT 50
    """,
)(_spark_bpe_merge_candidates)


def _spark_bpe_encode_tokens(spark, sf):
    """Corpus-wide BPE tokenization (operators/bpe.py bpe_encode): learn
    a 50-merge table from the documents table, then apply it to every
    document with the distributed mapInPandas encoder (per-partition
    word memo, no shuffle).  Rows-only in the driver battery — BPE's
    iterative merge loop has no SQL form; the exactness gate is
    tests/test_bpe.py (ranked==sequential on the real vocab, doc-by-doc
    parity with driver-side encode_word, partitioning invariance)."""
    from ..operators.bpe import bpe_encode, learn_bpe

    docs = t(spark, sf, "documents").select("doc_id", "text")
    merges = learn_bpe(docs, n_merges=50)
    enc = bpe_encode(docs, merges)
    return enc.select(
        "doc_id",
        F.size("bpe_tokens").alias("n_bpe_tokens"),
        F.concat_ws(" ", F.slice("bpe_tokens", 1, 24)).alias("bpe_prefix"),
    )


register("bpe_encode_tokens", None)(_spark_bpe_encode_tokens)


register(
    "lang_guess",  # n-gram/stopword language-id heuristic vs declared lang
    """
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(*) FILTER (
             WHERE len(list_filter(string_split(text, ' '),
                                   x -> x IN ('the', 'a', 'value', 'table'))) * 5
                   >= len(string_split(text, ' '))
           ) AS guessed_en
    FROM documents GROUP BY lang
    """,
)(
    lambda spark, sf: t(spark, sf, "documents")
    .select(
        "lang",
        (
            F.size(
                F.filter(
                    F.split("text", " "),
                    lambda x: x.isin("the", "a", "value", "table"),
                )
            ) * 5
            >= F.size(F.split("text", " "))
        ).alias("g"),
    )
    .groupBy("lang")
    .agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("g"), 1).otherwise(0)).alias("guessed_en"),
    )
)


register(
    "doc_fingerprints",  # rolling-hash-style prefix fingerprint groups
    """
    SELECT fp, COUNT(*) AS n_docs, MIN(doc_id) AS canonical_doc_id
    FROM (SELECT doc_id,
                 md5(array_to_string((string_split(text, ' '))[1:10], ' ')) AS fp
          FROM documents)
    GROUP BY fp
    """,
)(
    lambda spark, sf: t(spark, sf, "documents")
    .select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.slice(F.split("text", " "), 1, 10))).alias("fp"),
    )
    .groupBy("fp")
    .agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("canonical_doc_id"),
    )
)


# ===========================================================================
# §4 Deduplication suite
# ===========================================================================

# The synthetic documents corpus has NO exact duplicates, so a plain
# GROUP BY HAVING > 1 passes trivially on empty output (round-2 verdict
# finding).  The query therefore self-plants a deterministic duplicated
# slice — every doc_id divisible by 25 is re-inserted under doc_id +
# 1,000,000 — identically in the Spark plan and the DuckDB oracle, so the
# dedup logic is proven on NON-empty output: each planted copy must land
# in a dup group of exactly its source, with the source as canonical id.
_DEDUP_PLANT_MOD = 25
_DEDUP_PLANT_OFFSET = 1_000_000


def _spark_dedup_exact(spark, sf):
    docs = t(spark, sf, "documents").select("doc_id", "text")
    planted = docs.unionAll(
        docs.filter(F.col("doc_id") % _DEDUP_PLANT_MOD == 0).select(
            (F.col("doc_id") + _DEDUP_PLANT_OFFSET).alias("doc_id"), "text"
        )
    )
    return (
        planted.groupBy(F.md5("text").alias("fp"))
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("dup_count") > 1)
    )


register(
    "dedup_exact",  # exact hash-groupBy dedup (planted positive path)
    f"""
    WITH docs_planted AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {_DEDUP_PLANT_OFFSET} AS doc_id, text FROM documents
      WHERE doc_id % {_DEDUP_PLANT_MOD} = 0
    )
    SELECT md5(text) AS fp, COUNT(*) AS dup_count, MIN(doc_id) AS canonical_doc_id
    FROM docs_planted GROUP BY md5(text) HAVING COUNT(*) > 1
    """,
)(_spark_dedup_exact)


from ..functions import minhash as MH

_MINHASH_K = MH.MINHASH_K
_MINHASH_BANDS = MH.MINHASH_BANDS  # 2 bands x 4 rows


_spark_shingles = MH.word_shingles  # shared LSH core (functions/minhash.py)

_DUCK_SHINGLES = MH.duck_word_shingles("text")  # Jaccard verify stage

# the DuckDB twin of MH.minhash_bands over the documents table; embed
# after WITH (defines mh_sh / mh_sigs / mh_bands).  The minhash path
# uses arithmetic token-hash shingles (word_shingle_hashes — no shingle
# string construction); the Jaccard VERIFY stage still compares real
# string shingle sets.
_DUCK_MH_CTES = MH.duck_minhash_ctes(
    "documents", "doc_id", prefix="mh",
    hashes_expr=MH.duck_word_shingle_hashes("text"),
)


def _spark_minhash_bands(spark, sf):
    # shared LSH core, fully narrow: per-token hashes Horner-combined to
    # shingle hashes, k array_min projections, stack() unpivot — no
    # per-shingle shuffle anywhere (plan-guarded in
    # tests/test_plan_quality.py); tb() balances the scan when the input
    # under-fills the cluster (guide §2.5), identity at real scale
    return MH.minhash_bands(
        tb(spark, sf, "documents"),
        "doc_id",
        hashes=XC.cached_column(
            ("word_shingle_hashes", "text"),
            lambda: MH.word_shingle_hashes(F.col("text")),
        ),
        k=_MINHASH_K,
        bands=_MINHASH_BANDS,
    )


register(
    "minhash_bands",  # signature -> LSH band hashes (dedup scale path)
    f"WITH {_DUCK_MH_CTES} SELECT doc_id, band, band_hash FROM mh_bands",
)(_spark_minhash_bands)


def _spark_minhash_pairs(spark, sf):
    return MH.band_candidate_pairs(
        _spark_minhash_bands(spark, sf), "doc_id", "doc_a", "doc_b"
    )


register(
    "minhash_candidate_pairs",  # LSH band-bucket self-join
    f"""
    WITH {_DUCK_MH_CTES}
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM mh_bands a JOIN mh_bands b
      ON a.band = b.band AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
    """,
)(_spark_minhash_pairs)


def _spark_ngram_jaccard(spark, sf):
    # blocking is the LSH band join (shared with minhash_candidate_pairs):
    # the pair count is LSH-bounded, never quadratic in a size bucket —
    # round 1 keyed this on (lang, len//16), which is O(n^2) per bucket at
    # web scale; this is the exact-verify stage over LSH candidates
    pairs = _spark_minhash_pairs(spark, sf)
    sh = tb(spark, sf, "documents").select(
        "doc_id", F.array_distinct(_spark_shingles(F.col("text"))).alias("s")
    )
    j = (
        pairs.join(
            sh.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa")),
            "doc_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb")),
            "doc_b",
        )
        .withColumn("inter_cnt", F.size(F.array_intersect("sa", "sb")))
        .withColumn("na", F.size("sa"))
        .withColumn("nb", F.size("sb"))
    )
    return j.filter(
        F.col("inter_cnt") * 10 >= (F.col("na") + F.col("nb") - F.col("inter_cnt"))
    ).select(
        "doc_a", "doc_b",
        F.round(
            F.col("inter_cnt").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter_cnt")),
            6,
        ).alias("jaccard"),
    )


register(
    "ngram_jaccard_buckets",  # n-gram Jaccard verify over LSH-band buckets
    f"""
    WITH {_DUCK_MH_CTES},
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM mh_bands a JOIN mh_bands b
        ON a.band = b.band AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    sh AS (
      SELECT doc_id, list_distinct({_DUCK_SHINGLES}) AS s FROM documents
    ),
    scored AS (
      SELECT p.doc_a, p.doc_b,
             len(list_filter(a.s, x -> list_contains(b.s, x))) AS inter_cnt,
             len(a.s) AS na, len(b.s) AS nb
      FROM pairs p JOIN sh a ON a.doc_id = p.doc_a
                   JOIN sh b ON b.doc_id = p.doc_b
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(inter_cnt AS DOUBLE) / (na + nb - inter_cnt), 6) AS jaccard
    FROM scored WHERE inter_cnt * 10 >= (na + nb - inter_cnt)
    """,
)(_spark_ngram_jaccard)


def _spark_simhash(spark, sf):
    # use the first 15 hex chars (60 bits, fits signed BIGINT exactly in
    # both engines), test each of the low 16 bits.  ONE partial-aggregating
    # groupBy with 16 conditional sums — round 1 crossJoined a 16-row bit
    # table (16x the shuffle rows) and aggregated twice; this is the same
    # result with a single map-side-combinable shuffle
    tok_hash = (
        t(spark, sf, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .withColumn(
            "h", F.conv(F.substring(F.md5("tok"), 2, 15), 16, 10).cast("long")
        )
    )
    sums = tok_hash.groupBy("doc_id").agg(
        *[
            F.sum(
                F.expr(f"CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END")
            ).alias(f"s{b}")
            for b in range(16)
        ]
    )
    bit_terms = [
        F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        for b in range(16)
    ]
    acc = bit_terms[0]
    for term in bit_terms[1:]:
        acc = acc + term
    return sums.select("doc_id", acc.cast("long").alias("simhash"))


register(
    "simhash_64",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    hashed AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(tok), 2, 15)) AS BIGINT) AS h
      FROM toks
    ),
    bits AS (
      SELECT doc_id, b.bit,
             SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS score
      FROM hashed, (SELECT unnest(range(0, 16)) AS bit) b
      GROUP BY doc_id, b.bit
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN score > 0 THEN CAST(1 AS BIGINT) << bit ELSE 0 END)
                AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
    """,
)(_spark_simhash)


# ===========================================================================
# §5 Similarity search over embeddings
# ===========================================================================

_Q = 1000  # quantization: component -> CAST(ROUND(x * 1000) AS BIGINT)
_N_QUERIES = 8
_TOP_K = 5


def _spark_quantize(col):
    return F.transform(
        col, lambda x: F.round(x.cast("double") * _Q).cast("long")
    )


_DUCK_QUANT = (
    "list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
)


def _spark_int_dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


register(
    "ann_cosine_topk",  # brute-force cosine top-k (similarity baseline)
    f"""
    WITH q AS (
      SELECT vec_id AS qid, {_DUCK_QUANT} AS v FROM embeddings
      WHERE vec_id < {_N_QUERIES}
    ),
    c AS (
      SELECT vec_id AS cid, {_DUCK_QUANT} AS v FROM embeddings
    ),
    dots AS (
      SELECT qid, cid,
        CAST(list_sum(list_transform(range(1, len(q.v) + 1),
             i -> q.v[i] * c.v[i])) AS BIGINT) AS dot,
        CAST(list_sum(list_transform(q.v, x -> x * x)) AS BIGINT) AS qq,
        CAST(list_sum(list_transform(c.v, x -> x * x)) AS BIGINT) AS cc
      FROM q, c WHERE qid <> cid
    )
    SELECT qid, cid, rank FROM (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY ROUND(CAST(dot AS DOUBLE) /
                 (sqrt(CAST(qq AS DOUBLE)) * sqrt(CAST(cc AS DOUBLE))), 9) DESC,
               cid) AS rank
      FROM dots WHERE qq > 0 AND cc > 0
    ) WHERE rank <= {_TOP_K}
    """,
)(
    # r8: per-vector norms are computed ONCE per side before the pair
    # join (previously per PAIR — N_QUERIES redundant reevaluations of
    # each candidate's self-dot through the interpreted higher-order
    # aggregate).  Same dot/qq/cc values, so identical rounded cosines.
    lambda spark, sf: (
        lambda emb: emb.filter(F.col("vec_id") < _N_QUERIES)
        .select(
            F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
            F.col("vv").alias("qq"),
        )
        .join(
            emb.select(
                F.col("vec_id").alias("cid"), F.col("v").alias("cv"),
                F.col("vv").alias("cc"),
            ),
            F.col("qid") != F.col("cid"),
        )
        .select(
            "qid", "cid",
            _spark_int_dot(F.col("qv"), F.col("cv")).alias("dot"),
            "qq", "cc",
        )
        .filter((F.col("qq") > 0) & (F.col("cc") > 0))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(
                    F.desc(
                        F.round(
                            F.col("dot").cast("double")
                            / (
                                F.sqrt(F.col("qq").cast("double"))
                                * F.sqrt(F.col("cc").cast("double"))
                            ),
                            9,
                        )
                    ),
                    F.asc("cid"),
                )
            ),
        )
        .filter(F.col("rank") <= _TOP_K)
        .select("qid", "cid", "rank")
    )(
        t(spark, sf, "embeddings").select(
            "vec_id", _spark_quantize(F.col("embedding")).alias("v")
        ).withColumn("vv", _spark_int_dot(F.col("v"), F.col("v")))
    )
)


# deterministic +-1 hyperplanes shared verbatim by both engines
_N_PLANES = 8
_DIM = 64
_PLANES = (
    (np.random.default_rng(20240816).integers(0, 2, (_N_PLANES, _DIM)) * 2 - 1)
    .astype(int)
    .tolist()
)


def _duck_plane_literal(k: int) -> str:
    return "[" + ", ".join(str(v) for v in _PLANES[k]) + "]"


register(
    "ann_lsh_buckets",  # sign-random-projection LSH (similarity scale path)
    f"""
    WITH q AS (SELECT vec_id, {_DUCK_QUANT} AS v FROM embeddings)
    SELECT vec_id,
           CAST({" + ".join(
        f"(CASE WHEN CAST(list_sum(list_transform(range(1, {_DIM} + 1), "
        f"i -> v[i] * ({_duck_plane_literal(k)})[i])) AS BIGINT) >= 0 "
        f"THEN {1 << k} ELSE 0 END)"
        for k in range(_N_PLANES)
    )} AS BIGINT) AS bucket
    FROM q
    """,
)(
    lambda spark, sf: t(spark, sf, "embeddings")
    .select("vec_id", _spark_quantize(F.col("embedding")).alias("v"))
    .select(
        "vec_id",
        sum(
            [
                F.when(
                    _spark_int_dot(
                        F.col("v"),
                        F.array(*[F.lit(x).cast("long") for x in _PLANES[k]]),
                    )
                    >= 0,
                    F.lit(1 << k),
                ).otherwise(F.lit(0))
                for k in range(_N_PLANES)
            ],
            F.lit(0),
        ).cast("long").alias("bucket"),
    )
)


register(
    "knn_label_vote",  # k-NN classification: majority label of cosine top-k
    f"""
    WITH q AS (
      SELECT vec_id AS qid, {_DUCK_QUANT} AS v FROM embeddings
      WHERE vec_id < {_N_QUERIES}
    ),
    c AS (SELECT vec_id AS cid, label, {_DUCK_QUANT} AS v FROM embeddings),
    dots AS (
      SELECT qid, cid, label,
        CAST(list_sum(list_transform(range(1, len(q.v) + 1),
             i -> q.v[i] * c.v[i])) AS BIGINT) AS dot,
        CAST(list_sum(list_transform(q.v, x -> x * x)) AS BIGINT) AS qq,
        CAST(list_sum(list_transform(c.v, x -> x * x)) AS BIGINT) AS cc
      FROM q, c WHERE qid <> cid
    ),
    topk AS (
      SELECT qid, cid, label FROM (
        SELECT qid, cid, label,
               ROW_NUMBER() OVER (PARTITION BY qid
                 ORDER BY ROUND(CAST(dot AS DOUBLE) /
                   (sqrt(CAST(qq AS DOUBLE)) * sqrt(CAST(cc AS DOUBLE))), 9) DESC,
                 cid) AS rank
        FROM dots WHERE qq > 0 AND cc > 0
      ) WHERE rank <= {_TOP_K}
    )
    SELECT qid, voted_label FROM (
      SELECT qid, label AS voted_label,
             ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY COUNT(*) DESC, label) AS rn
      FROM topk GROUP BY qid, label
    ) WHERE rn = 1
    """,
)(
    lambda spark, sf: (
        lambda emb: emb.filter(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"))
        .join(
            emb.select(
                F.col("vec_id").alias("cid"), "label", F.col("v").alias("cv")
            ),
            F.col("qid") != F.col("cid"),
        )
        .select(
            "qid", "cid", "label",
            _spark_int_dot(F.col("qv"), F.col("cv")).alias("dot"),
            _spark_int_dot(F.col("qv"), F.col("qv")).alias("qq"),
            _spark_int_dot(F.col("cv"), F.col("cv")).alias("cc"),
        )
        .filter((F.col("qq") > 0) & (F.col("cc") > 0))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(
                    F.desc(
                        F.round(
                            F.col("dot").cast("double")
                            / (
                                F.sqrt(F.col("qq").cast("double"))
                                * F.sqrt(F.col("cc").cast("double"))
                            ),
                            9,
                        )
                    ),
                    F.asc("cid"),
                )
            ),
        )
        .filter(F.col("rank") <= _TOP_K)
        .groupBy("qid", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("votes"), F.asc("label"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("qid", F.col("label").alias("voted_label"))
    )(
        t(spark, sf, "embeddings").select(
            "vec_id", "label", _spark_quantize(F.col("embedding")).alias("v")
        )
    )
)


# ===========================================================================
# §6 Scorer semantics (SURVEY A4-A6, ref:utils/scorer.py:22-118) over a
# deterministic synthetic gold/pred derivation from the events table
# ===========================================================================

# label perturbation cycle (shared by both dialects)
_SHIFT_CASE_SQL = (
    "CASE event_type WHEN 'click' THEN 'view' WHEN 'view' THEN 'click' "
    "WHEN 'signup' THEN 'purchase' WHEN 'purchase' THEN 'error' "
    "ELSE 'signup' END"
)

_GOLD_SQL = (
    "CASE WHEN event_id % 13 = 0 THEN 'no_relation' ELSE event_type END"
)
_PRED_SQL = (
    "CASE WHEN event_id % 11 = 0 THEN 'no_relation' "
    f"WHEN event_id % 7 = 0 THEN {_SHIFT_CASE_SQL} ELSE event_type END"
)

_SCORER_BASE_SQL = f"""
  SELECT {_GOLD_SQL} AS gold, {_PRED_SQL} AS guess FROM events
"""


def _spark_scorer_base(spark, sf):
    return t(spark, sf, "events").selectExpr(
        f"{_GOLD_SQL} AS gold", f"{_PRED_SQL} AS guess"
    )


def _spark_scorer_counts(spark, sf):
    """correct/guessed/gold counters with the reference's null-class rules
    (ref:utils/scorer.py:33-44)."""
    base = _spark_scorer_base(spark, sf)
    gold_c = (
        base.filter(F.col("gold") != "no_relation")
        .groupBy(F.col("gold").alias("relation"))
        .agg(
            F.count(F.lit(1)).alias("gold_cnt"),
            F.sum(
                F.when(
                    (F.col("guess") == F.col("gold"))
                    & (F.col("guess") != "no_relation"),
                    1,
                ).otherwise(0)
            ).alias("correct_cnt"),
        )
    )
    guess_c = (
        base.filter(F.col("guess") != "no_relation")
        .groupBy(F.col("guess").alias("relation"))
        .agg(F.count(F.lit(1)).alias("guessed_cnt"))
    )
    return gold_c.join(guess_c, "relation", "left").select(
        "relation",
        F.col("correct_cnt").cast("long").alias("correct_cnt"),
        F.coalesce("guessed_cnt", F.lit(0)).cast("long").alias("guessed_cnt"),
        F.col("gold_cnt").cast("long").alias("gold_cnt"),
    )


_SCORER_COUNTS_SQL = f"""
  WITH base AS ({_SCORER_BASE_SQL}),
  gold_c AS (
    SELECT gold AS relation,
           COUNT(*) AS gold_cnt,
           SUM(CASE WHEN guess = gold AND guess <> 'no_relation'
               THEN 1 ELSE 0 END) AS correct_cnt
    FROM base WHERE gold <> 'no_relation' GROUP BY gold
  ),
  guess_c AS (
    SELECT guess AS relation, COUNT(*) AS guessed_cnt
    FROM base WHERE guess <> 'no_relation' GROUP BY guess
  )
  SELECT relation,
         CAST(correct_cnt AS BIGINT) AS correct_cnt,
         CAST(COALESCE(guessed_cnt, 0) AS BIGINT) AS guessed_cnt,
         CAST(gold_cnt AS BIGINT) AS gold_cnt
  FROM gold_c LEFT JOIN guess_c USING (relation)
"""


register(
    "scorer_per_relation",
    f"""
    WITH counts AS ({_SCORER_COUNTS_SQL})
    SELECT relation, correct_cnt, guessed_cnt, gold_cnt,
      ROUND(CASE WHEN guessed_cnt > 0
        THEN CAST(correct_cnt AS DOUBLE) / guessed_cnt ELSE 1.0 END, 6) AS prec,
      ROUND(CASE WHEN gold_cnt > 0
        THEN CAST(correct_cnt AS DOUBLE) / gold_cnt ELSE 0.0 END, 6) AS recall
    FROM counts
    """,
)(
    lambda spark, sf: _spark_scorer_counts(spark, sf).select(
        "relation", "correct_cnt", "guessed_cnt", "gold_cnt",
        F.round(
            F.when(
                F.col("guessed_cnt") > 0,
                F.col("correct_cnt").cast("double") / F.col("guessed_cnt"),
            ).otherwise(F.lit(1.0)),
            6,
        ).alias("prec"),
        F.round(
            F.when(
                F.col("gold_cnt") > 0,
                F.col("correct_cnt").cast("double") / F.col("gold_cnt"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("recall"),
    )
)


register(
    "scorer_micro",  # A6 (ref:utils/scorer.py:88-96)
    f"""
    WITH counts AS ({_SCORER_COUNTS_SQL}),
    sums AS (
      SELECT CAST(SUM(correct_cnt) AS BIGINT) AS c,
             CAST(SUM(guessed_cnt_u) AS BIGINT) AS g,
             CAST(SUM(gold_cnt) AS BIGINT) AS o
      FROM (
        SELECT correct_cnt, gold_cnt, 0 AS guessed_cnt_u FROM counts
        UNION ALL
        -- guessed counts must be summed over ALL guessed relations, not
        -- only those present in gold
        SELECT 0, 0, guessed_cnt FROM (
          WITH base AS ({_SCORER_BASE_SQL})
          SELECT COUNT(*) AS guessed_cnt FROM base
          WHERE guess <> 'no_relation'
        )
      )
    )
    SELECT c AS correct_cnt, g AS guessed_cnt, o AS gold_cnt,
      ROUND(CASE WHEN g > 0 THEN CAST(c AS DOUBLE) / g ELSE 1.0 END, 6)
        AS prec_micro,
      ROUND(CASE WHEN o > 0 THEN CAST(c AS DOUBLE) / o ELSE 0.0 END, 6)
        AS recall_micro
    FROM sums
    """,
)(
    lambda spark, sf: (
        lambda base: base.agg(
            F.sum(
                F.when(
                    (F.col("gold") != "no_relation")
                    & (F.col("guess") == F.col("gold")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("correct_cnt"),
            F.sum(
                F.when(F.col("guess") != "no_relation", 1).otherwise(0)
            ).cast("long").alias("guessed_cnt"),
            F.sum(
                F.when(F.col("gold") != "no_relation", 1).otherwise(0)
            ).cast("long").alias("gold_cnt"),
        ).select(
            "correct_cnt", "guessed_cnt", "gold_cnt",
            F.round(
                F.when(
                    F.col("guessed_cnt") > 0,
                    F.col("correct_cnt").cast("double") / F.col("guessed_cnt"),
                ).otherwise(F.lit(1.0)),
                6,
            ).alias("prec_micro"),
            F.round(
                F.when(
                    F.col("gold_cnt") > 0,
                    F.col("correct_cnt").cast("double") / F.col("gold_cnt"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("recall_micro"),
        )
    )(_spark_scorer_base(spark, sf))
)


# ===========================================================================
# §7 Ensemble majority vote (SURVEY A7/J5, ref:ensemble.py:54-63) from three
# deterministic pseudo-models; tie-break (votes desc, label asc)
# ===========================================================================

def _pred_k_sql(k: int) -> str:
    return (
        f"CASE WHEN event_id % {7 + k} = 0 THEN {_SHIFT_CASE_SQL} "
        "ELSE event_type END"
    )


register(
    "ensemble_majority_vote",
    f"""
    WITH preds AS (
      {" UNION ALL ".join(
        f"SELECT event_id, {_pred_k_sql(k)} AS pred FROM events"
        for k in range(3)
      )}
    )
    SELECT event_id, pred AS voted FROM (
      SELECT event_id, pred,
             ROW_NUMBER() OVER (PARTITION BY event_id
               ORDER BY COUNT(*) DESC, pred) AS rn
      FROM preds GROUP BY event_id, pred
    ) WHERE rn = 1
    """,
)(
    lambda spark, sf: (
        lambda ev: ev.selectExpr("event_id", f"{_pred_k_sql(0)} AS pred")
        .unionByName(ev.selectExpr("event_id", f"{_pred_k_sql(1)} AS pred"))
        .unionByName(ev.selectExpr("event_id", f"{_pred_k_sql(2)} AS pred"))
        .groupBy("event_id", "pred")
        .agg(F.count(F.lit(1)).alias("votes"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_id").orderBy(
                    F.desc("votes"), F.asc("pred")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("event_id", F.col("pred").alias("voted"))
    )(t(spark, sf, "events"))
)


# ===========================================================================
# §8 Event-time operators: sessionization + tumbling windows
# ===========================================================================

register(
    "sessionize_users",  # gap-based sessionization (30 min)
    """
    WITH ordered AS (
      SELECT user_id, CAST(epoch(ts) AS BIGINT) AS sec,
             LAG(CAST(epoch(ts) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
      FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
    FROM ordered GROUP BY user_id
    """,
)(
    lambda spark, sf: t(spark, sf, "events")
    .select(
        "user_id", "event_id",
        F.unix_timestamp("ts").alias("sec"), F.col("ts"),
    )
    .withColumn(
        "prev_sec",
        F.lag("sec").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ),
    )
    .groupBy("user_id")
    .agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(
                F.col("prev_sec").isNull()
                | (F.col("sec") - F.col("prev_sec") > 1800),
                1,
            ).otherwise(0)
        ).cast("long").alias("n_sessions"),
    )
)


register(
    "tumbling_hourly_counts",  # windowed aggregation (streaming batch analog)
    """
    SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events GROUP BY 1, 2
    """,
)(
    lambda spark, sf: t(spark, sf, "events")
    .groupBy(
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour_bucket"),
        "event_type",
    )
    .agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long").alias("value_cents"),
    )
)


# ===========================================================================
# §9 Preprocessing operators over testdata (P2, P7-P9 SQL-checkable forms)
# ===========================================================================

register(
    "binned_offsets",  # P9 on generic ints derived from lineitem
    f"""
    SELECT v, {POS.log2_bin_sql('v')} AS binned, COUNT(*) AS cnt
    FROM (SELECT CAST(l_partkey % 200 - 100 AS INTEGER) AS v FROM lineitem)
    GROUP BY v
    """,
)(
    lambda spark, sf: t(spark, sf, "lineitem")
    .select((F.col("l_partkey") % 200 - 100).cast("int").alias("v"))
    .groupBy("v")
    .agg(F.count(F.lit(1)).alias("cnt"))
    .select("v", POS.log2_bin(F.col("v")).alias("binned"), "cnt")
)


register(
    "span_positions",  # P8: relative-position sequences, exploded
    f"""
    WITH spans AS (
      SELECT p_partkey,
             CAST(p_partkey % 4 AS INTEGER) AS s,
             CAST(p_partkey % 4 + p_partkey % 3 AS INTEGER) AS e,
             CAST(8 + p_partkey % 5 AS INTEGER) AS l
      FROM part WHERE p_partkey < 100
    ),
    seqs AS (
      SELECT p_partkey,
             {POS.get_positions_duckdb('s', 'e', 'l')} AS posv
      FROM spans
    )
    SELECT p_partkey,
           generate_subscripts(posv, 1) - 1 AS idx,
           unnest(posv) AS relpos,
           unnest({POS.bin_positions_duckdb('posv')}) AS binned
    FROM seqs
    """,
)(
    lambda spark, sf: t(spark, sf, "part")
    .filter(F.col("p_partkey") < 100)
    .select(
        "p_partkey",
        (F.col("p_partkey") % 4).cast("int").alias("s"),
        (F.col("p_partkey") % 4 + F.col("p_partkey") % 3).cast("int").alias("e"),
        (F.lit(8) + F.col("p_partkey") % 5).cast("int").alias("l"),
    )
    .select(
        "p_partkey",
        POS.get_positions(F.col("s"), F.col("e"), F.col("l")).alias("posv"),
    )
    .select(
        "p_partkey",
        F.posexplode("posv").alias("idx", "relpos"),
        POS.bin_positions(F.col("posv")).alias("binned_arr"),
    )
    .select(
        "p_partkey", "idx", "relpos",
        F.col("binned_arr")[F.col("idx")].alias("binned"),
    )
)


register(
    "masked_token_stream",  # P2 entity masking, exploded per token
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
      WHERE doc_id < 200 AND len(string_split(text, ' ')) >= 8
    ),
    masked AS (
      SELECT doc_id,
             list_transform(l, (x, i) ->
               CASE WHEN i - 1 BETWEEN 4 AND 5 THEN 'OBJ-TITLE'
                    WHEN i - 1 BETWEEN 1 AND 2 THEN 'SUBJ-PERSON'
                    ELSE x END) AS m
      FROM toks
    )
    SELECT doc_id, generate_subscripts(m, 1) - 1 AS idx, unnest(m) AS token
    FROM masked
    """,
)(
    lambda spark, sf: (
        lambda docs: docs.filter(
            (F.col("doc_id") < 200) & (F.size(F.split("text", " ")) >= 8)
        )
        .select("doc_id", F.split("text", " ").alias("l"))
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    "l",
                    lambda x, i: F.when(
                        (i >= 4) & (i <= 5), F.lit("OBJ-TITLE")
                    )
                    .when((i >= 1) & (i <= 2), F.lit("SUBJ-PERSON"))
                    .otherwise(x),
                )
            ).alias("idx", "token"),
        )
    )(t(spark, sf, "documents"))
)


register(
    "glove_bracket_normalize",  # P12 (ref:utils/vocab.py:46-55) demo over a
    # derived token stream: normalize bracket forms appearing in documents
    """
    SELECT token,
           CASE token WHEN '-LRB-' THEN '(' WHEN '-RRB-' THEN ')'
                      WHEN '-LSB-' THEN '[' WHEN '-RSB-' THEN ']'
                      WHEN '-LCB-' THEN '{' WHEN '-RCB-' THEN '}'
                      ELSE token END AS normalized,
           COUNT(*) AS cnt
    FROM (
      SELECT CASE WHEN doc_id % 5 = 0 THEN '-LRB-'
                  WHEN doc_id % 5 = 1 THEN '-RSB-'
                  ELSE (string_split(text, ' '))[1] END AS token
      FROM documents
    )
    GROUP BY token
    """,
)(
    lambda spark, sf: t(spark, sf, "documents")
    .selectExpr(
        "CASE WHEN doc_id % 5 = 0 THEN '-LRB-' "
        "WHEN doc_id % 5 = 1 THEN '-RSB-' "
        "ELSE split(text, ' ')[0] END AS token"
    )
    .groupBy("token")
    .agg(F.count(F.lit(1)).alias("cnt"))
    .selectExpr(
        "token",
        "CASE token WHEN '-LRB-' THEN '(' WHEN '-RRB-' THEN ')' "
        "WHEN '-LSB-' THEN '[' WHEN '-RSB-' THEN ']' "
        "WHEN '-LCB-' THEN '{' WHEN '-RCB-' THEN '}' ELSE token END "
        "AS normalized",
        "cnt",
    )
)


# ===========================================================================
# §10 Grouping-set / distinct-agg extensions (no reference counterpart;
# standard warehouse surface a replacement engine must offer)
# ===========================================================================

register(
    "rollup_order_counts",
    f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)(
    lambda spark, sf: t(spark, sf, "lineitem")
    .rollup("l_returnflag", "l_linestatus")
    .agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
    )
)


register(
    "cube_event_stats",
    """
    SELECT event_type, CAST(user_id % 10 AS BIGINT) AS user_bucket,
           COUNT(*) AS cnt
    FROM events
    GROUP BY CUBE (event_type, CAST(user_id % 10 AS BIGINT))
    """,
)(
    lambda spark, sf: t(spark, sf, "events")
    .select(
        "event_type", (F.col("user_id") % 10).cast("long").alias("user_bucket")
    )
    .cube("event_type", "user_bucket")
    .agg(F.count(F.lit(1)).alias("cnt"))
)


register(
    "distinct_users_per_type",  # distinct aggregation (entity cardinality)
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS distinct_users,
           COUNT(*) AS events
    FROM events GROUP BY event_type
    """,
)(
    lambda spark, sf: t(spark, sf, "events")
    .groupBy("event_type")
    .agg(
        F.count_distinct(F.col("user_id")).alias("distinct_users"),
        F.count(F.lit(1)).alias("events"),
    )
)


register(
    "set_ops_customers",  # intersect / except surface
    """
    SELECT c_custkey FROM (
      SELECT o_custkey AS c_custkey FROM orders
      WHERE o_orderpriority = '1-URGENT'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    )
    """,
)(
    lambda spark, sf: (
        lambda orders: orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .intersect(
            orders.filter(F.col("o_orderpriority") == "5-LOW").select(
                F.col("o_custkey").alias("c_custkey")
            )
        )
        .exceptAll(
            orders.filter(F.col("o_totalprice") > 400000).select(
                F.col("o_custkey").alias("c_custkey")
            )
        ).distinct()
    )(t(spark, sf, "orders"))
)


register(
    "embedding_near_dup_pairs",  # embedding-cosine near-dup (dedup family):
    # LSH-bucket blocking -> exact quantized cosine within buckets.  The
    # synthetic embeddings have no >=0.9-cosine pairs, so (like
    # dedup_exact) the query self-plants exact copies of every 50th vector
    # under vec_id + 1,000,000 — identically in both engines — proving the
    # blocked-join + verify path on NON-empty output (each planted copy
    # must bucket with and match ONLY its source at cosine 1.0).
    f"""
    WITH emb_planted AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings
      WHERE vec_id % 50 = 0
    ),
    q AS (
      SELECT vec_id,
             {_DUCK_QUANT} AS v,
             CAST({" + ".join(
        f"(CASE WHEN CAST(list_sum(list_transform(range(1, {_DIM} + 1), "
        f"i -> ({_DUCK_QUANT})[i] * ({_duck_plane_literal(k)})[i])) AS BIGINT) >= 0 "
        f"THEN {1 << k} ELSE 0 END)"
        for k in range(_N_PLANES)
    )} AS BIGINT) AS bucket
      FROM emb_planted
    ),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        CAST(list_sum(list_transform(range(1, len(a.v) + 1),
             i -> a.v[i] * b.v[i])) AS BIGINT) AS dot,
        CAST(list_sum(list_transform(a.v, x -> x * x)) AS BIGINT) AS aa,
        CAST(list_sum(list_transform(b.v, x -> x * x)) AS BIGINT) AS bb
      FROM q a JOIN q b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b,
           ROUND(CAST(dot AS DOUBLE) /
                 (sqrt(CAST(aa AS DOUBLE)) * sqrt(CAST(bb AS DOUBLE))), 6)
             AS cosine
    FROM pairs
    WHERE aa > 0 AND bb > 0
      AND CAST(dot AS DOUBLE) / (sqrt(CAST(aa AS DOUBLE)) * sqrt(CAST(bb AS DOUBLE))) >= 0.9
    """,
)(
    lambda spark, sf: (
        lambda q: q.alias("a")
        .join(
            q.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            _spark_int_dot(F.col("a.v"), F.col("b.v")).alias("dot"),
            _spark_int_dot(F.col("a.v"), F.col("a.v")).alias("aa"),
            _spark_int_dot(F.col("b.v"), F.col("b.v")).alias("bb"),
        )
        .filter((F.col("aa") > 0) & (F.col("bb") > 0))
        .withColumn(
            "cosine_raw",
            F.col("dot").cast("double")
            / (F.sqrt(F.col("aa").cast("double")) * F.sqrt(F.col("bb").cast("double"))),
        )
        .filter(F.col("cosine_raw") >= 0.9)
        .select(
            "vec_a", "vec_b", F.round("cosine_raw", 6).alias("cosine")
        )
    )(
        # persist the quantize+bucket projection so it runs once, not once
        # per self-join side (the LSH-bands persist pattern; plan-keyed
        # cache, so repeated query builds reuse one entry)
        (
            lambda emb: emb.unionAll(
                emb.filter(F.col("vec_id") % 50 == 0).select(
                    (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
                )
            )
        )(t(spark, sf, "embeddings").select("vec_id", "embedding")).select(
            "vec_id",
            _spark_quantize(F.col("embedding")).alias("v"),
            sum(
                [
                    F.when(
                        _spark_int_dot(
                            _spark_quantize(F.col("embedding")),
                            F.array(*[F.lit(x).cast("long") for x in _PLANES[k]]),
                        )
                        >= 0,
                        F.lit(1 << k),
                    ).otherwise(F.lit(0))
                    for k in range(_N_PLANES)
                ],
                F.lit(0),
            ).cast("long").alias("bucket"),
        ).persist()
    )
)


register(
    "price_quantiles",  # exact interpolated percentiles (stats surface)
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)(
    lambda spark, sf: t(spark, sf, "lineitem")
    .groupBy("l_returnflag")
    .agg(
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )
)


# ===========================================================================
# §6 Round-2 additions: BPE-ish token counting, winnowing fingerprints,
# IVF similarity search
# ===========================================================================

# BPE-style pre-tokenizer (GPT-2-shaped, minus the RE2-unsupported
# lookahead): contraction suffixes, space-prefixed letter runs, digit
# runs, punctuation runs.  Same regex text runs in Java regex and RE2.
_BPE_PAT = r"'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+"
_WORD_PAT = r" ?[A-Za-z]+"
_NUM_PAT = r" ?[0-9]+"


def _duck_count(pat: str) -> str:
    escaped = pat.replace("'", "''")
    return f"len(regexp_extract_all(text, '{escaped}'))"


register(
    "bpe_token_stats",  # BPE-ish regex token counting (LLM-pipeline op)
    f"""
    SELECT doc_id,
           {_duck_count(_BPE_PAT)} AS n_bpe_tokens,
           {_duck_count(_WORD_PAT)} AS n_word_pieces,
           {_duck_count(_NUM_PAT)} AS n_number_pieces,
           ROUND(CAST(length(text) AS DOUBLE) /
                 GREATEST({_duck_count(_BPE_PAT)}, 1), 6) AS chars_per_token
    FROM documents
    """,
)(
    lambda spark, sf: t(spark, sf, "documents").select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_BPE_PAT), F.lit(0))).alias(
            "n_bpe_tokens"
        ),
        F.size(F.regexp_extract_all("text", F.lit(_WORD_PAT), F.lit(0))).alias(
            "n_word_pieces"
        ),
        F.size(F.regexp_extract_all("text", F.lit(_NUM_PAT), F.lit(0))).alias(
            "n_number_pieces"
        ),
        F.round(
            F.length("text").cast("double")
            / F.greatest(
                F.size(F.regexp_extract_all("text", F.lit(_BPE_PAT), F.lit(0))),
                F.lit(1),
            ),
            6,
        ).alias("chars_per_token"),
    )
)


# Winnowing document fingerprints (Schleimer et al., SIGMOD 2003): hash
# every char k-gram, then keep the minimum hash of every length-w window
# of consecutive k-gram hashes; the distinct minima are the fingerprints.
# Guarantees: any shared substring of length >= k + w - 1 produces at
# least one shared fingerprint — the standard plagiarism/near-dup sketch.
_WINNOW_K = 8
_WINNOW_W = 4

_STABLE_HASH_DUCK = "CAST(('0x' || substr(md5({x}), 2, 15)) AS BIGINT)"


def _stable_hash_spark(col):
    return F.conv(F.substring(F.md5(col), 2, 15), 16, 10).cast("long")


def _spark_winnow(spark, sf):
    text = F.col("text")
    kgram_hashes = F.transform(
        F.sequence(F.lit(1), F.length(text) - _WINNOW_K + 1),
        lambda i: _stable_hash_spark(text.substr(i, F.lit(_WINNOW_K))),
    )
    df = (
        t(spark, sf, "documents")
        .filter(F.length("text") >= _WINNOW_K)
        .select("doc_id", kgram_hashes.alias("H"))
    )
    fps = F.when(
        F.size("H") >= _WINNOW_W,
        F.transform(
            F.sequence(F.lit(0), F.size("H") - _WINNOW_W),
            lambda i: F.array_min(F.slice("H", i + 1, _WINNOW_W)),
        ),
    ).otherwise(F.array(F.array_min("H")))
    return (
        df.select("doc_id", F.explode(F.array_distinct(fps)).alias("fingerprint"))
        .distinct()
    )


register(
    "winnowing_fingerprints",  # rolling-hash document fingerprinting
    f"""
    WITH h AS (
      SELECT doc_id,
             list_transform(
               range(1, length(text) - {_WINNOW_K} + 2),
               i -> {_STABLE_HASH_DUCK.format(
                 x=f"substr(text, CAST(i AS INT), {_WINNOW_K})")}) AS H
      FROM documents WHERE length(text) >= {_WINNOW_K}
    ),
    w AS (
      SELECT doc_id,
             CASE WHEN len(H) >= {_WINNOW_W}
                  THEN list_transform(
                    range(len(H) - {_WINNOW_W} + 1),
                    i -> list_aggregate(H[i+1:i+{_WINNOW_W}], 'min'))
                  ELSE [list_aggregate(H, 'min')] END AS fps
      FROM h
    )
    SELECT DISTINCT doc_id, fingerprint
    FROM (SELECT doc_id, unnest(fps) AS fingerprint FROM w)
    """,
)(_spark_winnow)


# IVF similarity search: coarse-quantize candidates into _IVF_CELLS
# centroid cells (centroids = the first _IVF_CELLS vectors — deterministic
# stand-in for a trained k-means codebook), probe the _IVF_NPROBE nearest
# cells per query, exact top-k inside the probed cells only.  The scale
# shape of FAISS-style IVF: the expensive exact scoring touches
# ~nprobe/cells of the corpus instead of all of it.
_IVF_CELLS = 4
_IVF_NPROBE = 2


def _spark_cos(a, b):
    dot = _spark_int_dot(F.col(a), F.col(b))
    na = _spark_int_dot(F.col(a), F.col(a))
    nb = _spark_int_dot(F.col(b), F.col(b))
    return F.when(
        (na > 0) & (nb > 0),
        F.round(
            dot.cast("double")
            / (F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double"))),
            9,
        ),
    )


def _spark_ann_ivf(spark, sf):
    emb = t(spark, sf, "embeddings").select(
        "vec_id", _spark_quantize(F.col("embedding")).alias("v")
    )
    cent = emb.filter(F.col("vec_id") < _IVF_CELLS).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("cv")
    )
    sims = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id", "v", "cell", _spark_cos("v", "cv").alias("csim")
    ).filter(F.col("csim").isNotNull())  # zero-norm guard, mirrors oracle
    w = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cell"))
    ranked = sims.withColumn("crank", F.row_number().over(w))
    assign = ranked.filter(F.col("crank") == 1).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv2"), "cell"
    )
    probes = ranked.filter(
        (F.col("crank") <= _IVF_NPROBE) & (F.col("vec_id") < _N_QUERIES)
    ).select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"), "cell")
    scored = (
        probes.join(assign, "cell")
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid", _spark_cos("qv", "cv2").alias("sim"))
        .filter(F.col("sim").isNotNull())
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= _TOP_K)
        .select("qid", "cid", "rank")
    )


_DUCK_COS = (
    "ROUND(CAST(CAST(list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> {a}[i] * {b}[i])) AS BIGINT) AS DOUBLE) / "
    "(sqrt(CAST(CAST(list_sum(list_transform({a}, x -> x * x)) AS BIGINT) AS DOUBLE)) * "
    "sqrt(CAST(CAST(list_sum(list_transform({b}, x -> x * x)) AS BIGINT) AS DOUBLE))), 9)"
)

register(
    "ann_ivf_topk",  # IVF coarse-quantized ANN (FAISS-shape scale path)
    f"""
    WITH e AS (SELECT vec_id, {_DUCK_QUANT} AS v FROM embeddings),
    cent AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < {_IVF_CELLS}),
    sims AS (
      SELECT e.vec_id, e.v, cent.cell,
             {_DUCK_COS.format(a="e.v", b="cent.cv")} AS csim
      FROM e, cent
      WHERE CAST(list_sum(list_transform(e.v, x -> x * x)) AS BIGINT) > 0
        AND CAST(list_sum(list_transform(cent.cv, x -> x * x)) AS BIGINT) > 0
    ),
    ranked AS (
      SELECT vec_id, v, cell,
             ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY csim DESC, cell) AS crank
      FROM sims
    ),
    assign AS (
      SELECT vec_id AS cid, v AS cv2, cell FROM ranked WHERE crank = 1
    ),
    probes AS (
      SELECT vec_id AS qid, v AS qv, cell FROM ranked
      WHERE crank <= {_IVF_NPROBE} AND vec_id < {_N_QUERIES}
    ),
    scored AS (
      SELECT p.qid, a.cid, {_DUCK_COS.format(a="p.qv", b="a.cv2")} AS sim
      FROM probes p JOIN assign a ON a.cell = p.cell
      WHERE p.qid <> a.cid
        AND CAST(list_sum(list_transform(p.qv, x -> x * x)) AS BIGINT) > 0
        AND CAST(list_sum(list_transform(a.cv2, x -> x * x)) AS BIGINT) > 0
    )
    SELECT qid, cid, rank FROM (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank
      FROM scored
    ) WHERE rank <= {_TOP_K}
    """,
)(_spark_ann_ivf)


def _spark_rare_token_ratio(spark, sf):
    # corpus-level token frequencies (one partial-agg groupBy), broadcast
    # back onto the exploded tokens, exact-integer ratio per doc — the
    # frequency-based quality filter of LLM data pipelines with no
    # cross-engine float risk (ints + one correctly-rounded division)
    toks = t(spark, sf, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("corpus_cnt"))
    return (
        toks.join(F.broadcast(freq), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("corpus_cnt") <= 2, 1).otherwise(0)
            ).cast("long").alias("n_rare"),
        )
        .select(
            "doc_id", "n_tokens", "n_rare",
            F.round(
                F.col("n_rare").cast("double") / F.col("n_tokens"), 6
            ).alias("rare_ratio"),
        )
    )


register(
    "rare_token_ratio",  # corpus-frequency quality filter (LLM-pipeline op)
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    freq AS (
      SELECT tok, count(*) AS corpus_cnt FROM toks GROUP BY tok
    )
    SELECT t.doc_id, count(*) AS n_tokens,
           CAST(SUM(CASE WHEN f.corpus_cnt <= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_rare,
           ROUND(CAST(SUM(CASE WHEN f.corpus_cnt <= 2 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS rare_ratio
    FROM toks t JOIN freq f ON f.tok = t.tok
    GROUP BY t.doc_id
    """,
)(_spark_rare_token_ratio)


# ===========================================================================
# §7 Round-4 LLM-pipeline extensions: cross-doc n-gram duplication,
# benchmark decontamination, unigram-LM scoring
# ===========================================================================

_NGRAM_N = 5


def _ngram_col(toks):
    """Distinct word n-grams of a (materialized) token-array column.
    ``toks`` must be a plain column reference, not a computed expression:
    a computed expr referenced inside the transform lambda re-evaluates
    per element (the O(len^2) pitfall documented in functions/minhash.py)."""
    n = _NGRAM_N
    # NB: guard short docs explicitly — Spark's sequence(1, 0) yields a
    # DESCENDING [1, 0], not an empty array (DuckDB's range(1, 1) is empty)
    return F.array_distinct(
        F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + k) for k in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )


def _spark_dup_ngram_spans(spark, sf):
    """Cross-document duplicated n-gram detection (the signal behind
    exact-substring dedup a la Lee et al. 2022 'Deduplicating Training
    Data Makes Language Models Better'): for every doc, how many of its
    distinct 5-grams also appear in at least one OTHER document.  The
    scale shape is explode -> distinct -> count-per-ngram -> semi join —
    all shuffle-partitioned by ngram, never all-pairs."""
    docs = t(spark, sf, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    pairs = (
        docs.select("doc_id", F.explode(_ngram_col(F.col("toks"))).alias("g"))
        .filter(F.col("g") != "")
    )
    dup = (
        pairs.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g")
    )
    per_doc = pairs.join(dup, "g", "left_semi").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_ngrams")
    )
    totals = pairs.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_ngrams")
    )
    return totals.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_ngrams",
        F.coalesce("n_dup_ngrams", F.lit(0)).cast("long").alias("n_dup_ngrams"),
        F.round(
            F.coalesce("n_dup_ngrams", F.lit(0)).cast("double")
            / F.col("n_ngrams"),
            6,
        ).alias("dup_ngram_ratio"),
    )


register(
    "dup_ngram_spans",  # cross-doc duplicated 5-grams (substring-dedup signal)
    f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    g AS (
      SELECT DISTINCT doc_id, gram FROM (
        SELECT doc_id,
               unnest(list_transform(
                 range(1, greatest(len(l) - {_NGRAM_N - 1}, 0) + 1),
                 i -> array_to_string(l[i:i+{_NGRAM_N - 1}], ' ')
               )) AS gram
        FROM d
      ) WHERE gram <> ''
    ),
    dup AS (
      SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
    )
    SELECT g.doc_id,
           COUNT(*) AS n_ngrams,
           CAST(SUM(CASE WHEN dup.gram IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_ngrams,
           ROUND(CAST(SUM(CASE WHEN dup.gram IS NOT NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS dup_ngram_ratio
    FROM g LEFT JOIN dup ON dup.gram = g.gram
    GROUP BY g.doc_id
    """,
)(_spark_dup_ngram_spans)


def _spark_decontamination_overlap(spark, sf):
    """Benchmark decontamination check: treat every 50th doc as the
    held-out 'benchmark' set and measure, per benchmark doc, what
    fraction of its distinct 5-grams leak into the REST of the corpus
    (the train/test-overlap scan an LLM data pipeline runs before
    training).  Bucketed by ngram — never a doc x doc join."""
    docs = t(spark, sf, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    grams = docs.select(
        "doc_id", F.explode(_ngram_col(F.col("toks"))).alias("g")
    ).filter(F.col("g") != "")
    bench = grams.filter(F.col("doc_id") % 50 == 0)
    corpus = grams.filter(F.col("doc_id") % 50 != 0).select("g").distinct()
    leaked = bench.join(corpus, "g", "left_semi").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_leaked")
    )
    return (
        bench.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_ngrams"))
        .join(leaked, "doc_id", "left")
        .select(
            "doc_id",
            "n_ngrams",
            F.coalesce("n_leaked", F.lit(0)).cast("long").alias("n_leaked"),
            F.round(
                F.coalesce("n_leaked", F.lit(0)).cast("double")
                / F.col("n_ngrams"),
                6,
            ).alias("contamination_ratio"),
        )
    )


register(
    "decontamination_overlap",  # benchmark-vs-corpus n-gram leakage
    f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    g AS (
      SELECT DISTINCT doc_id, gram FROM (
        SELECT doc_id,
               unnest(list_transform(
                 range(1, greatest(len(l) - {_NGRAM_N - 1}, 0) + 1),
                 i -> array_to_string(l[i:i+{_NGRAM_N - 1}], ' ')
               )) AS gram
        FROM d
      ) WHERE gram <> ''
    ),
    corpus AS (
      SELECT DISTINCT gram FROM g WHERE doc_id % 50 <> 0
    )
    SELECT g.doc_id,
           COUNT(*) AS n_ngrams,
           CAST(SUM(CASE WHEN c.gram IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_leaked,
           ROUND(CAST(SUM(CASE WHEN c.gram IS NOT NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS contamination_ratio
    FROM g LEFT JOIN corpus c ON c.gram = g.gram
    WHERE g.doc_id % 50 = 0
    GROUP BY g.doc_id
    """,
)(_spark_decontamination_overlap)


def _spark_unigram_logprob(spark, sf):
    """Unigram-LM document scoring (the cheapest 'perplexity' quality
    signal): fit unigram probabilities on the whole corpus in one
    aggregation, then score every document by its mean token
    log-probability.  The frequency table is vocabulary-sized ->
    broadcast join against the exploded token stream; per-token logs are
    quantized to 6 decimals BEFORE the DECIMAL sum so the reduction is
    order-independent and engine-exact (module header rules)."""
    toks = t(spark, sf, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt")).first()[0]
    lp = F.round(
        F.log(F.col("cnt").cast("double") / F.lit(float(total))), 6
    ).cast("decimal(18,6)")
    scored = toks.join(F.broadcast(freq.withColumn("lp", lp)), "tok")
    # report the exact DECIMAL sum (not the mean: an average can land on
    # a half-way 6-decimal boundary where the engines' decimal-vs-double
    # division rounds apart); consumers divide by n_tokens themselves
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("lp").cast("double").alias("sum_logprob"),
    )


register(
    "unigram_logprob",  # unigram-LM quality scoring (cheap perplexity)
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    t2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
    freq AS (SELECT tok, COUNT(*) AS cnt FROM t2 GROUP BY tok),
    tot AS (SELECT SUM(cnt) AS total FROM freq),
    lp AS (
      SELECT tok,
             CAST(ROUND(ln(CAST(cnt AS DOUBLE) / (SELECT CAST(total AS DOUBLE) FROM tot)), 6)
                  AS DECIMAL(18,6)) AS lp
      FROM freq
    )
    SELECT t2.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(lp.lp) AS DOUBLE) AS sum_logprob
    FROM t2 JOIN lp ON lp.tok = t2.tok
    GROUP BY t2.doc_id
    """,
)(_spark_unigram_logprob)


# ===========================================================================
# §8 Web-corpus compliance + structure: PII redaction, line-level boilerplate
# ===========================================================================

# The testdata word-salad carries no natural PII or repeated lines, so both
# queries plant deterministic positives from doc_id arithmetic (same idiom
# as dedup_exact) — every engine sees the identical planted corpus and the
# redaction/removal itself is what is under cross-engine test.

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def _spark_pii_redaction(spark, sf):
    """PII scrub over web text (emails / phone numbers / IPv4) — the
    compliance stage every crawl-derived training corpus runs before
    release.  Counts matches per class on the planted text, then chains
    three regexp_replace passes (email -> phone -> ip) and fingerprints
    the redacted output so the oracle verifies byte-identical redaction,
    not just identical counts.  All-narrow column expressions — no
    shuffle, no UDF; scales as a pure map stage.  DuckDB dialect notes:
    its regexp_replace is first-match-only without the 'g' flag (the
    oracle passes it), and list len() is cast to BIGINT to match
    Spark's size() after the cast."""
    did = F.col("doc_id")
    email = F.concat(
        F.lit(" contact alice."),
        did.cast("string"),
        F.lit("@example-mail.com"),
    )
    phone = F.concat(
        F.lit(" call 415-555-"),
        F.lpad((did % 10000).cast("string"), 4, "0"),
    )
    ip = F.concat(
        F.lit(" from 10."),
        (did % 200).cast("string"),
        F.lit("."),
        ((did * 7) % 200).cast("string"),
        F.lit("."),
        (did % 250).cast("string"),
    )
    planted = t(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(did % 3 == 0, email).otherwise(F.lit("")),
            F.when(did % 4 == 0, phone).otherwise(F.lit("")),
            F.when(did % 5 == 0, ip).otherwise(F.lit("")),
        ).alias("pii_text"),
    )

    def n_hits(pat):
        return F.size(
            F.regexp_extract_all("pii_text", F.lit(pat), 0)
        ).cast("bigint")

    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("pii_text", _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE,
            "<PHONE>",
        ),
        _PII_IP,
        "<IP>",
    )
    return planted.select(
        "doc_id",
        n_hits(_PII_EMAIL).alias("n_emails"),
        n_hits(_PII_PHONE).alias("n_phones"),
        n_hits(_PII_IP).alias("n_ips"),
        F.md5(redacted).alias("redacted_fp"),
    )


register(
    "pii_redaction",  # email/phone/IP scrub, byte-exact cross-engine
    f"""
    WITH planted AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 3 = 0
                  THEN ' contact alice.' || CAST(doc_id AS VARCHAR)
                       || '@example-mail.com' ELSE '' END
             || CASE WHEN doc_id % 4 = 0
                  THEN ' call 415-555-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE '' END
             || CASE WHEN doc_id % 5 = 0
                  THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR) || '.'
                       || CAST(doc_id * 7 % 200 AS VARCHAR) || '.'
                       || CAST(doc_id % 250 AS VARCHAR) ELSE '' END
             AS pii_text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(pii_text, '{_PII_EMAIL}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(pii_text, '{_PII_PHONE}')) AS BIGINT)
             AS n_phones,
           CAST(len(regexp_extract_all(pii_text, '{_PII_IP}')) AS BIGINT)
             AS n_ips,
           md5(regexp_replace(
                 regexp_replace(
                   regexp_replace(pii_text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                   '{_PII_PHONE}', '<PHONE>', 'g'),
                 '{_PII_IP}', '<IP>', 'g')) AS redacted_fp
    FROM planted
    """,
)(_spark_pii_redaction)


_BP_HEADER = "cookie notice this site uses cookies to improve your experience"
_BP_FOOTER = "copyright 2024 example corp all rights reserved"
_BP_DF_THRESHOLD = 20


def _spark_boilerplate_lines(spark, sf):
    """CCNet-style line-level boilerplate removal: hash every line of the
    corpus, count the number of DISTINCT documents each exact line
    appears in, and drop lines whose document frequency crosses a
    threshold (cookie banners, nav bars, copyright footers survive the
    per-document dedup because every page carries them once).  Planted
    positive path: a header line on every 4th doc and a footer line on
    every 5th (df ~125 and ~100 >> threshold _BP_DF_THRESHOLD); each
    document's own body line is globally unique (df 1).

    Scale shape: one groupBy(line) for document frequency; the
    boilerplate set (df >= T) is tiny — broadcast back against the line
    stream, so the only wide stage is the DF aggregation.  At real
    crawl scale the line key is md5(line) and the DISTINCT doc count is
    a (doc_id, line) pre-distinct — same plan shape."""
    docs = t(spark, sf, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    lines = (
        docs.filter(did % 4 == 0)
        .select("doc_id", F.lit(_BP_HEADER).alias("line"))
        .unionAll(docs.select("doc_id", F.col("text").alias("line")))
        .unionAll(
            docs.filter(did % 5 == 0).select(
                "doc_id", F.lit(_BP_FOOTER).alias("line")
            )
        )
    )
    docfreq = lines.groupBy("line").agg(
        F.countDistinct("doc_id").alias("df")
    )
    boiler = docfreq.filter(
        F.col("df") >= _BP_DF_THRESHOLD
    ).select("line", F.lit(1).alias("bp"))
    flagged = lines.join(F.broadcast(boiler), "line", "left")
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(F.col("bp").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_boilerplate"),
        F.sum(F.when(F.col("bp").isNull(), F.length("line")).otherwise(0))
        .cast("bigint")
        .alias("kept_chars"),
    )


register(
    "boilerplate_lines",  # line-level corpus dedup (CCNet-style)
    f"""
    WITH lines AS (
      SELECT doc_id, '{_BP_HEADER}' AS line FROM documents WHERE doc_id % 4 = 0
      UNION ALL
      SELECT doc_id, text AS line FROM documents
      UNION ALL
      SELECT doc_id, '{_BP_FOOTER}' AS line FROM documents WHERE doc_id % 5 = 0
    ),
    docfreq AS (
      SELECT line, COUNT(DISTINCT doc_id) AS df FROM lines GROUP BY line
    ),
    boiler AS (
      SELECT line FROM docfreq WHERE df >= {_BP_DF_THRESHOLD}
    )
    SELECT l.doc_id,
           COUNT(*) AS n_lines,
           CAST(SUM(CASE WHEN b.line IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boilerplate,
           CAST(SUM(CASE WHEN b.line IS NULL THEN length(l.line) ELSE 0 END)
                AS BIGINT) AS kept_chars
    FROM lines l LEFT JOIN boiler b ON b.line = l.line
    GROUP BY l.doc_id
    """,
)(_spark_boilerplate_lines)


def _spark_temperature_mixing(spark, sf):
    """Temperature-based multilingual mixture rebalancing (the mT5 /
    XLM-R alpha-sampling recipe): per-language sampling rates
    proportional to T_l^alpha so low-resource languages are up-weighted
    relative to their raw token share, realized as deterministic
    hash-based per-doc selection against a half-corpus token budget.
    alpha is fixed at 0.5 because sqrt is IEEE-correctly-rounded (pow is
    not — a libm pow could disagree between engines in the last bit);
    each per-language sqrt is ROUND(,6)-quantized to DECIMAL before the
    order-independent total, and every later step is a single
    correctly-rounded double op + ROUND (module header rules).

    Scale shape: one groupBy(lang) aggregation (a handful of rows), the
    per-language rate table broadcast back against the doc stream —
    the same two-stage shape as boilerplate_lines."""
    ntok = F.size(
        F.filter(F.split("text", " "), lambda x: x != "")
    ).cast("bigint")
    docs = t(spark, sf, "documents").select(
        "doc_id", "lang", ntok.alias("n")
    )
    per_lang = docs.groupBy("lang").agg(
        F.sum("n").cast("bigint").alias("n_tokens"),
    )
    sq = F.round(F.sqrt(F.col("n_tokens")), 6).cast("decimal(18,6)")
    sized = per_lang.withColumn("sq", sq)
    tot = sized.agg(
        F.sum("sq").alias("sq_total"),
        F.sum("n_tokens").cast("bigint").alias("tok_total"),
    )
    rated = sized.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_tokens",
        F.round(
            F.col("sq").cast("double") / F.col("sq_total").cast("double"),
            6,
        ).alias("target_share"),
        F.expr("tok_total DIV 2").alias("budget"),
    ).withColumn(
        "keep_rate",
        F.round(
            F.least(
                F.lit(1.0),
                F.col("target_share") * F.col("budget") / F.col("n_tokens"),
            ),
            6,
        ),
    )
    u = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit("mix"), "doc_id")), 1, 8),
        16, 10,
    ).cast("double") / F.lit(float(1 << 32))
    kept = (
        docs.join(
            F.broadcast(rated.select("lang", "keep_rate")), "lang"
        )
        .filter(u < F.col("keep_rate"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n").cast("bigint").alias("n_tokens_kept"),
        )
    )
    return rated.join(kept, "lang", "left").select(
        "lang",
        "n_tokens",
        "target_share",
        "keep_rate",
        F.coalesce("n_docs_kept", F.lit(0)).cast("bigint").alias(
            "n_docs_kept"
        ),
        F.coalesce("n_tokens_kept", F.lit(0)).cast("bigint").alias(
            "n_tokens_kept"
        ),
    )


register(
    "temperature_mixing",  # mT5-style alpha-sampling rebalance (alpha=0.5)
    f"""
    WITH docs AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS BIGINT) AS n
      FROM documents
    ),
    per_lang AS (
      SELECT lang, CAST(SUM(n) AS BIGINT) AS n_tokens FROM docs GROUP BY lang
    ),
    sized AS (
      SELECT lang, n_tokens,
             CAST(ROUND(sqrt(n_tokens), 6) AS DECIMAL(18,6)) AS sq
      FROM per_lang
    ),
    tot AS (
      SELECT SUM(sq) AS sq_total, CAST(SUM(n_tokens) AS BIGINT) AS tok_total
      FROM sized
    ),
    rated AS (
      SELECT lang, n_tokens,
             ROUND(CAST(sq AS DOUBLE) / CAST(sq_total AS DOUBLE), 6)
               AS target_share,
             tok_total // 2 AS budget
      FROM sized, tot
    ),
    rated2 AS (
      SELECT lang, n_tokens, target_share,
             ROUND(LEAST(1.0, target_share * budget / n_tokens), 6)
               AS keep_rate
      FROM rated
    ),
    kept AS (
      SELECT d.lang,
             COUNT(*) AS n_docs_kept,
             CAST(SUM(d.n) AS BIGINT) AS n_tokens_kept
      FROM docs d JOIN rated2 r ON r.lang = d.lang
      WHERE CAST(('0x' || substr(md5('mix|' || CAST(d.doc_id AS VARCHAR)),
                                 1, 8)) AS BIGINT) / {float(1 << 32)}
            < r.keep_rate
      GROUP BY d.lang
    )
    SELECT r.lang, r.n_tokens, r.target_share, r.keep_rate,
           CAST(COALESCE(k.n_docs_kept, 0) AS BIGINT) AS n_docs_kept,
           CAST(COALESCE(k.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept
    FROM rated2 r LEFT JOIN kept k ON k.lang = r.lang
    """,
)(_spark_temperature_mixing)


def _spark_decontamination_bloom(spark, sf):
    """Bloom-accelerated decontamination — identical semantics to
    ``decontamination_overlap`` (it registers the SAME DuckDB oracle),
    restructured the way a 100-TB run must be: the benchmark side's
    distinct 5-grams build a 16-KiB Bloom bitmap (functions/bloom.py, all
    JVM column arithmetic), the CORPUS side is scanned with the
    membership test as a narrow filter, and only the surviving ~0.1%
    of grams reach the distinct + semi-join.  Bloom filters have no
    false negatives, so the exact semi-join on the survivors returns
    precisely the unfiltered answer while the full corpus gram stream
    never shuffles.  tests/test_bloom.py asserts the composition
    equals the exact query AND that the pre-filter actually filters."""
    from ..functions import bloom as BL

    m_bits, k = 1 << 17, 5
    docs = t(spark, sf, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    grams = docs.select(
        "doc_id", F.explode(_ngram_col(F.col("toks"))).alias("g")
    ).filter(F.col("g") != "")
    # the benchmark gram frame feeds THREE actions (bloom build, the
    # n_ngrams aggregate, the leak semi-join): persist it once, release
    # after the eager materialization below
    bench = grams.filter(F.col("doc_id") % 50 == 0).persist()
    bitmap = BL.bloom_build(
        bench.select("g").distinct(), "g", m_bits, k
    )
    corpus_cand = (
        grams.filter(F.col("doc_id") % 50 != 0)
        .filter(BL.bloom_might_contain(F.col("g"), bitmap, m_bits, k))
        .select("g")
        .distinct()
    )
    leaked = bench.join(corpus_cand, "g", "left_semi").groupBy(
        "doc_id"
    ).agg(F.count(F.lit(1)).alias("n_leaked"))
    out = (
        bench.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_ngrams"))
        .join(leaked, "doc_id", "left")
        .select(
            "doc_id",
            "n_ngrams",
            F.coalesce("n_leaked", F.lit(0)).cast("long").alias("n_leaked"),
            F.round(
                F.coalesce("n_leaked", F.lit(0)).cast("double")
                / F.col("n_ngrams"),
                6,
            ).alias("contamination_ratio"),
        )
        # benchmark-doc-sized result: materialize eagerly, then release
        # the bench cache (long-lived-session hygiene, as in kg_sql's
        # _materialize_release)
        .localCheckpoint(eager=True)
    )
    bench.unpersist()
    return out


# same oracle as the exact query — the bloom pre-filter must be
# result-invisible (no false negatives + exact verify)
register(
    "decontamination_bloom",
    REGISTRY["decontamination_overlap"].oracle,
)(_spark_decontamination_bloom)


# ===========================================================================
# §8 Round-5 extension: SemDeDup (semantic dedup via embedding clustering)
# ===========================================================================

_SEMDEDUP_T = 0.999


def _spark_semdedup(spark, sf):
    """SemDeDup (Abbas et al. 2023, 'SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication'): cluster embeddings, then
    drop all-but-one member of every within-cluster near-duplicate group.
    Clustering bounds the quadratic pairwise term to cluster sizes — the
    property that makes semantic dedup feasible at corpus scale (the
    within-cell self-join shuffles on the cell key, never all-pairs).

    Determinism choices (so DuckDB agrees bit-for-bit): clusters are the
    IVF cell assignment already proven cross-engine (`ann_ivf_topk` —
    centroids = first _IVF_CELLS vectors, rounded-quantized cosine,
    (csim desc, cell) tie-break); the keeper of a duplicate group is the
    LOWEST vec_id (drop b iff some same-cell a < b has raw quantized
    cosine >= _SEMDEDUP_T; integer dot + IEEE sqrt/divide compare
    identically in both engines).  The synthetic embeddings hold no
    >=0.999 pairs, so the query self-plants exact copies of every 50th
    vector (the dedup_exact / embedding_near_dup_pairs pattern) —
    proving the drop path on non-empty output: each planted copy must
    cluster with and be dropped against exactly its source.
    """
    return _spark_semdedup_cells(spark, sf, _IVF_CELLS)


def _spark_semdedup_cells(spark, sf, n_cells: int):
    from ..operators import semdedup as SEM

    emb = t(spark, sf, "embeddings")
    planted = emb.select("vec_id", "embedding").unionAll(
        emb.filter(F.col("vec_id") % 50 == 0).select(
            (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
        )
    )
    # quantized vectors materialized once (battery hygiene: no cache
    # entry left behind); the library operator re-reads them for the
    # centroid take, the assignment pass and the final projection
    q = planted.select(
        "vec_id", _spark_quantize(F.col("embedding")).alias("v")
    ).localCheckpoint(eager=True)
    # delegation to the scale-true library operator (round 6): the
    # FIXTURES pin n_cells purely for cross-engine oracle determinism
    # — production callers omit n_cells (cells ∝ corpus size) and set
    # cell_cap so no cell is ever locally quadratic
    out = SEM.semdedup(
        q, "vec_id", "v",
        threshold=_SEMDEDUP_T, n_cells=n_cells, sim_round=9,
    )
    return out.select(
        "vec_id", F.col("cell").cast("long").alias("cell"), "dropped"
    )


def _semdedup_oracle(n_cells: int) -> str:
    """The DuckDB twin, parametric over the cell count — registered at
    two cell counts so the operator's cells-∝-corpus knob itself is
    oracle-checked cross-engine, not just the 4-cell fixture."""
    return f"""
    WITH emb_planted AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings
      WHERE vec_id % 50 = 0
    ),
    q AS (SELECT vec_id, {_DUCK_QUANT} AS v FROM emb_planted),
    cent AS (SELECT vec_id AS cell, v AS cv FROM q WHERE vec_id < {n_cells}),
    sims AS (
      SELECT q.vec_id, q.v, cent.cell,
             {_DUCK_COS.format(a="q.v", b="cent.cv")} AS csim
      FROM q, cent
      WHERE CAST(list_sum(list_transform(q.v, x -> x * x)) AS BIGINT) > 0
        AND CAST(list_sum(list_transform(cent.cv, x -> x * x)) AS BIGINT) > 0
    ),
    assign AS (
      SELECT vec_id, v, cell FROM (
        SELECT vec_id, v, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY csim DESC, cell) AS crank
        FROM sims
      ) WHERE crank = 1
    ),
    pairwise AS (
      SELECT b.vec_id,
        CAST(list_sum(list_transform(range(1, len(a.v) + 1),
             i -> a.v[i] * b.v[i])) AS BIGINT) AS dot,
        CAST(list_sum(list_transform(a.v, x -> x * x)) AS BIGINT) AS aa,
        CAST(list_sum(list_transform(b.v, x -> x * x)) AS BIGINT) AS bb
      FROM assign a JOIN assign b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
    ),
    dropped AS (
      SELECT DISTINCT vec_id FROM pairwise
      WHERE aa > 0 AND bb > 0
        AND CAST(dot AS DOUBLE) /
            (sqrt(CAST(aa AS DOUBLE)) * sqrt(CAST(bb AS DOUBLE)))
            >= {_SEMDEDUP_T}
    )
    SELECT p.vec_id, s.cell,
           (d.vec_id IS NOT NULL) AS dropped
    FROM emb_planted p
    LEFT JOIN assign s ON s.vec_id = p.vec_id
    LEFT JOIN dropped d ON d.vec_id = p.vec_id
    """


register("semdedup_drops", _semdedup_oracle(_IVF_CELLS))(_spark_semdedup)

_SEMDEDUP_SCALED_CELLS = 8


def _spark_semdedup_scaled(spark, sf):
    """The same SemDeDup fixture at a DIFFERENT cell count: proves the
    r6 library operator's cell parameterization cross-engine (the drop
    set must be identical — planted exact copies co-assign under any
    cell count — while the cell labels differ)."""
    return _spark_semdedup_cells(spark, sf, _SEMDEDUP_SCALED_CELLS)


register(
    "semdedup_scaled_cells", _semdedup_oracle(_SEMDEDUP_SCALED_CELLS)
)(_spark_semdedup_scaled)


def _spark_semdedup_two_level(spark, sf):
    """The same SemDeDup fixture through the r7 TWO-LEVEL assignment
    (operators/semdedup.py::_assign_two_level): members broadcast-route
    to ceil(sqrt(n_cells)) coarse anchors, then rank only against the
    fine centroids of their coarse cell — the form that keeps the
    broadcast side O(sqrt(n_cells)) at web scale.  The DuckDB twin
    unrolls the coarse routing of centroids AND members plus the
    coarse-restricted fine ranking, so the approximate-at-boundaries
    assignment semantics themselves are oracle-checked cross-engine
    (drop set still == the planted copies: identical vectors take
    identical routes)."""
    from ..operators import semdedup as SEM

    emb = t(spark, sf, "embeddings")
    planted = emb.select("vec_id", "embedding").unionAll(
        emb.filter(F.col("vec_id") % 50 == 0).select(
            (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
        )
    )
    q = planted.select(
        "vec_id", _spark_quantize(F.col("embedding")).alias("v")
    ).localCheckpoint(eager=True)
    out = SEM.semdedup(
        q, "vec_id", "v",
        threshold=_SEMDEDUP_T, n_cells=_SEMDEDUP_SCALED_CELLS,
        sim_round=9, two_level=True,
    )
    return out.select(
        "vec_id", F.col("cell").cast("long").alias("cell"), "dropped"
    )


def _semdedup_two_level_oracle(n_cells: int, n_coarse: int) -> str:
    nz = "CAST(list_sum(list_transform({x}, e -> e * e)) AS BIGINT) > 0"
    return f"""
    WITH emb_planted AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings
      WHERE vec_id % 50 = 0
    ),
    q AS (SELECT vec_id, {_DUCK_QUANT} AS v FROM emb_planted),
    cent AS (SELECT vec_id AS cell, v AS cv FROM q WHERE vec_id < {n_cells}),
    coarse AS (SELECT vec_id AS ckey, v AS av FROM q
               WHERE vec_id < {n_coarse}),
    cent_route AS (
      SELECT cell, cv, ckey FROM (
        SELECT c.cell, c.cv, k.ckey,
               ROW_NUMBER() OVER (PARTITION BY c.cell
                 ORDER BY {_DUCK_COS.format(a="c.cv", b="k.av")} DESC,
                          k.ckey) AS rr
        FROM cent c, coarse k
        WHERE {nz.format(x="c.cv")} AND {nz.format(x="k.av")}
      ) WHERE rr = 1
    ),
    mem_route AS (
      SELECT vec_id, v, ckey FROM (
        SELECT q.vec_id, q.v, k.ckey,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY {_DUCK_COS.format(a="q.v", b="k.av")} DESC,
                          k.ckey) AS rr
        FROM q, coarse k
        WHERE {nz.format(x="q.v")} AND {nz.format(x="k.av")}
      ) WHERE rr = 1
    ),
    assign AS (
      SELECT vec_id, v, cell FROM (
        SELECT m.vec_id, m.v, c.cell,
               ROW_NUMBER() OVER (PARTITION BY m.vec_id
                 ORDER BY {_DUCK_COS.format(a="m.v", b="c.cv")} DESC,
                          c.cell) AS crank
        FROM mem_route m JOIN cent_route c ON c.ckey = m.ckey
      ) WHERE crank = 1
    ),
    pairwise AS (
      SELECT b.vec_id,
        CAST(list_sum(list_transform(range(1, len(a.v) + 1),
             i -> a.v[i] * b.v[i])) AS BIGINT) AS dot,
        CAST(list_sum(list_transform(a.v, x -> x * x)) AS BIGINT) AS aa,
        CAST(list_sum(list_transform(b.v, x -> x * x)) AS BIGINT) AS bb
      FROM assign a JOIN assign b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
    ),
    dropped AS (
      SELECT DISTINCT vec_id FROM pairwise
      WHERE aa > 0 AND bb > 0
        AND CAST(dot AS DOUBLE) /
            (sqrt(CAST(aa AS DOUBLE)) * sqrt(CAST(bb AS DOUBLE)))
            >= {_SEMDEDUP_T}
    )
    SELECT p.vec_id, s.cell,
           (d.vec_id IS NOT NULL) AS dropped
    FROM emb_planted p
    LEFT JOIN assign s ON s.vec_id = p.vec_id
    LEFT JOIN dropped d ON d.vec_id = p.vec_id
    """


register(
    "semdedup_two_level",
    _semdedup_two_level_oracle(_SEMDEDUP_SCALED_CELLS, 3),
)(_spark_semdedup_two_level)


_CC_ROUNDS = 6


def _spark_dup_clusters(spark, sf):
    """Duplicate-CLUSTER resolution: pairwise LSH candidates leave
    chain ambiguity (a~b, b~c: which survives?); the pipeline answer is
    connected components over the candidate graph with a lowest-id
    keeper per component — one representative per duplicate cluster,
    deterministic under any partitioning.  Reuses the engine's
    canonicalization components machinery
    (operators/canonicalize.connected_components: min-label propagation
    with label shortcutting, O(log d) rounds, localCheckpoint per round
    — the plan stays constant-depth at any corpus size).  The oracle
    unrolls plain min-label propagation to a fixpoint
    ({_CC_ROUNDS} materialized rounds >= any planted-cluster diameter;
    tests/test_graph.py checks the Spark result against an independent
    union-find as well)."""
    from ..operators import canonicalize as CANON

    pairs = _spark_minhash_pairs(spark, sf).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    labels = CANON.connected_components(pairs)
    return (
        t(spark, sf, "documents")
        .select("doc_id")
        .join(
            labels.select(
                F.col("node_id").alias("doc_id"), "component"
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn("keep", F.col("cluster_id") == F.col("doc_id"))
    )


def _dup_clusters_oracle() -> str:
    # each unrolled round = one neighbor-min propagation THEN one label
    # shortcut (component := component's component) — the same per-round
    # structure as the Spark side, so reach roughly DOUBLES per round:
    # _CC_ROUNDS=6 shortcutting rounds converge for any component whose
    # min-id node is within ~2^6 hops of every member (plain propagation
    # alone covered only diameter 6 — review r5)
    rounds = ""
    prev = "l0"
    for k in range(1, _CC_ROUNDS + 1):
        rounds += f""",
    p{k} AS MATERIALIZED (
      SELECT node_id, MIN(component) AS component FROM (
        SELECT node_id, component FROM {prev}
        UNION ALL
        SELECT s.dst AS node_id, l.component
        FROM sym s JOIN {prev} l ON l.node_id = s.src
      ) GROUP BY node_id
    ),
    l{k} AS MATERIALIZED (
      SELECT a.node_id, COALESCE(b.component, a.component) AS component
      FROM p{k} a LEFT JOIN p{k} b ON b.node_id = a.component
    )"""
        prev = f"l{k}"
    return f"""
    WITH {_DUCK_MH_CTES},
    cpairs AS (
      SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
      FROM mh_bands a JOIN mh_bands b
        ON a.band = b.band AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    sym AS (
      SELECT src, dst FROM cpairs
      UNION SELECT dst AS src, src AS dst FROM cpairs
    ),
    l0 AS MATERIALIZED (
      SELECT node_id, node_id AS component FROM (
        SELECT DISTINCT src AS node_id FROM sym
      )
    ){rounds},
    conv AS (
      -- convergence guard (ADVICE r5): if the last two rounds still
      -- differ, the {_CC_ROUNDS}-round unroll did not reach fixpoint
      -- (a component whose min-id node is >~2^{_CC_ROUNDS} hops from a
      -- member) and the oracle would silently diverge from Spark's
      -- fixpoint loop — fail LOUDLY instead
      SELECT CASE WHEN (
        SELECT count(*) FROM l{_CC_ROUNDS} a
        JOIN l{_CC_ROUNDS - 1} b ON b.node_id = a.node_id
        WHERE a.component <> b.component
      ) = 0 THEN 1
      ELSE error('dup_clusters oracle: min-label propagation not '
                 'converged after {_CC_ROUNDS} rounds') END AS ok
    )
    SELECT d.doc_id,
           COALESCE(l.component, d.doc_id) AS cluster_id,
           (COALESCE(l.component, d.doc_id) = d.doc_id) AS keep
    FROM documents d LEFT JOIN {prev} l ON l.node_id = d.doc_id
    WHERE (SELECT ok FROM conv) = 1
    """


register("dup_clusters", _dup_clusters_oracle())(_spark_dup_clusters)


# ===========================================================================
# §7 Cardinality sketches (HyperLogLog)
# ===========================================================================


def _spark_hll_distinct(spark, sf):
    """Corpus vocabulary cardinality via the from-scratch HLL sketch
    (functions/sketches.py) next to the exact COUNT(DISTINCT) for the
    error report.  At 100 TB only the sketch side survives: a map-side-
    combinable groupBy onto 1024 registers vs a full distinct shuffle;
    the exact twin is the small-scale honesty check, not the scale path."""
    from ..functions import sketches as SK

    toks = (
        t(spark, sf, "documents")
        .select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    est = SK.hll_estimate(SK.hll_registers(toks, "tok"))
    exact = toks.agg(F.count_distinct("tok").alias("exact_distinct"))
    ex_d = F.col("exact_distinct").cast("double")
    return est.crossJoin(exact).select(
        "m",
        "v_zero",
        "scaled_sum",
        "est_hll",
        "exact_distinct",
        F.round((F.col("est_hll") - ex_d) / ex_d * F.lit(100.0), 3).alias(
            "err_pct"
        ),
    )


def _hll_distinct_oracle() -> str:
    from ..functions import sketches as SK

    return f"""
    WITH toks AS (
      SELECT tok FROM (
        SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
      ) WHERE tok <> ''
    ),
    {SK.duck_hll_sql('toks', 'tok')},
    ex AS (SELECT COUNT(DISTINCT tok) AS exact_distinct FROM toks)
    SELECT m, v_zero, scaled_sum, est_hll, exact_distinct,
           ROUND((est_hll - CAST(exact_distinct AS DOUBLE))
                 / CAST(exact_distinct AS DOUBLE) * 100.0, 3) AS err_pct
    FROM hll_est, ex
    """


register("hll_distinct", _hll_distinct_oracle())(_spark_hll_distinct)


def _spark_cms_heavy_hitters(spark, sf):
    """Heavy-hitter counts via the count-min sketch next to the exact
    counts for the overcount report.  At 100 TB the sketch is the scale
    path (a bounded d*w counter grid built map-side); the exact twin and
    the deterministic top-20 candidate pick exist for the oracle gate."""
    from ..functions import sketches as SK

    toks = (
        t(spark, sf, "documents")
        .select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_cnt"))
    cand = exact.orderBy(F.col("exact_cnt").desc(), F.col("tok")).limit(20)
    est = SK.cms_estimate(SK.cms_sketch(toks, "tok"), cand.select("tok"), "tok")
    return cand.join(est, "tok").select(
        "tok",
        "exact_cnt",
        "est_cnt",
        (F.col("est_cnt") - F.col("exact_cnt")).alias("overcount"),
    )


def _cms_heavy_hitters_oracle() -> str:
    from ..functions import sketches as SK

    probes = "\n      UNION ALL\n".join(
        f"""      SELECT tok, exact_cnt, {j} AS j,
             {SK.duck_cms_probe('tok', j)} AS cell
      FROM cand"""
        for j in range(SK.CMS_D)
    )
    return f"""
    WITH toks AS (
      SELECT tok FROM (
        SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
      ) WHERE tok <> ''
    ),
    {SK.duck_cms_sql('toks', 'tok')},
    exact AS (
      SELECT tok, COUNT(*) AS exact_cnt FROM toks GROUP BY tok
    ),
    cand AS (
      SELECT tok, exact_cnt FROM exact
      ORDER BY exact_cnt DESC, tok LIMIT 20
    ),
    probes AS (
{probes}
    )
    SELECT p.tok, p.exact_cnt, MIN(g.cnt) AS est_cnt,
           MIN(g.cnt) - p.exact_cnt AS overcount
    FROM probes p
    JOIN cms_grid g ON g.j = p.j AND g.cell = p.cell
    GROUP BY p.tok, p.exact_cnt
    """


register("cms_heavy_hitters", _cms_heavy_hitters_oracle())(
    _spark_cms_heavy_hitters
)
