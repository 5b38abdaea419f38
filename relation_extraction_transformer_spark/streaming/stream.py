"""Structured Streaming operators: incremental page/event ingestion.

The reference is pure batch (SURVEY §2.7); these are the Spark-native
incremental forms of the same computations for continuously crawled pages:

- ``streaming_triples``: readStream over a pages directory -> the SAME
  candidate/inference plan (the plan is stream-batch agnostic because it
  is narrow until the inference UDF, which is stateless per row),
- ``windowed_event_counts``: watermarked tumbling-window aggregation over
  an events stream (late data bounded by the watermark),
- sinks via ``foreachBatch`` so each micro-batch reuses the resumable
  batch writer (checkpointed by Spark's streaming offset log).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import PipelineConfig, DEFAULT_PIPELINE
from ..plans import pipeline as PL

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def streaming_triples(
    spark: SparkSession,
    pages_dir: str,
    cfg: PipelineConfig = DEFAULT_PIPELINE,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """readStream(pages parquet dir) -> streaming triples DataFrame.

    The batch plan composes unchanged onto a streaming source because every
    stage before the sink is stateless (no global aggregation on the hot
    path) — exactly why the candidate pipeline was built narrow."""
    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )
    return PL.triples_plan(pages, spark, cfg=cfg, keep_probs=False)


def windowed_event_counts(
    spark: SparkSession,
    events_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type (the streaming
    form of the ``tumbling_hourly_counts`` batch query)."""
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "value_cents"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n", "value_cents",
        )
    )


def run_stream_to_parquet(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_path: str,
    once: bool = True,
):
    """Drive a streaming DataFrame into parquet with offset checkpointing;
    ``once=True`` processes all available input then stops (test/batch-
    catchup mode)."""
    # parquet sink supports append only; the watermark finalizes windows so
    # the windowed aggregation is append-compatible
    writer = (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .format("parquet")
        .option("path", out_path)
    )
    if once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination(300)
        return q
    return writer.start()


def streaming_hll_registers(
    spark: SparkSession, docs_dir: str, schema: str, text_col: str = "text"
) -> DataFrame:
    """Streaming distinct-token cardinality: the HyperLogLog register
    fold (functions/sketches.py) expressed as a STANDARD streaming
    aggregation — ``groupBy(bucket).agg(max(rho))`` over the tokenized
    stream.  No custom stateful operator needed: register state is
    BOUNDED at HLL_M rows (1024) no matter how many tokens stream
    through, which is exactly the sketch property that makes a
    complete-mode distinct-count scale-safe where the exact streaming
    ``COUNT(DISTINCT)`` (unbounded key state) is not.  The emitted
    register frame feeds ``sketches.hll_estimate`` / ``hll_merge``
    unchanged — a batch sketch and a streamed sketch of the same data
    are identical rows (tests pin this)."""
    from pyspark.sql import functions as F

    from ..functions import sketches as SK

    docs = spark.readStream.schema(schema).parquet(docs_dir)
    toks = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    return SK.hll_registers(toks, "tok")


def run_streaming_edge_fold(
    spark: SparkSession,
    pages_dir: str,
    state_dir: str,
    checkpoint_path: str,
    max_files_per_trigger: int = 8,
    once: bool = True,
):
    """Always-on KG maintenance: each micro-batch of crawled pages folds
    into the standing per-edge rollup state (operators/incremental.py)
    via ``foreachBatch`` — the streaming form of scripts/maintain_kg.py.

    Exactly-once state: the fold version is derived from the durable
    streaming ``batch_id``, so a batch re-delivered after a crash finds
    its version already committed and is skipped
    (``fold_pages_delta``'s replay check); Spark's offset checkpoint
    guarantees batch ids are stable across restarts.  State size is
    bounded per edge no matter how long the stream runs — the property
    that makes a 24/7 rollup viable where re-aggregating crawl history
    per trigger is not.

    The stream owns ``state_dir``: versions are ``batch_id + 1`` from a
    fresh bootstrap, so do not point it at a directory already advanced
    by the batch script (those versions would read as replays)."""
    from ..operators import incremental as INC

    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        INC.fold_pages_delta(
            spark, batch_df, state_dir, version=int(batch_id) + 1
        )

    writer = pages.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint_path
    )
    if once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination(300)
        return q
    return writer.start()


def run_streaming_canon_fold(
    spark: SparkSession,
    pages_dir: str,
    state_dir: str,
    checkpoint_path: str,
    max_files_per_trigger: int = 8,
    once: bool = True,
):
    """Always-on canonical-map maintenance: each micro-batch of crawled
    pages extracts its mention surfaces and folds them into the STANDING
    canonical-component map (operators/incremental_canon.py) — the
    streaming twin of ``maintain_kg.py --canon-state`` and the canon
    counterpart of :func:`run_streaming_edge_fold`.

    Exactly-once state: versions derive from the durable streaming
    ``batch_id``, so a re-delivered batch finds its version committed
    and is a no-op.  Stable ids hold across triggers: a micro-batch that
    touches no standing component leaves every existing canonical id
    byte-identical — the fold only ever relabels components the batch's
    mentions actually connect.  The standing band index makes per-batch
    work delta-sized (delta×delta + delta×standing candidate joins,
    reduced-graph CC), never a re-canonicalization of the world."""
    from pyspark.sql import functions as F

    from ..operators import incremental_canon as IC
    from ..operators import linking as LINK
    from ..plans import pipeline as PL

    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        triples = PL.triples_plan(batch_df, spark, keep_probs=False)
        mentions = (
            triples.select(F.col("subj").alias("surface"))
            .unionAll(triples.select(F.col("obj").alias("surface")))
            .select(
                LINK.normalize_surface(F.col("surface")).alias("name")
            )
            .distinct()
            .select(
                LINK.stable_id(F.col("name")).alias("node_id"), "name"
            )
        )
        IC.fold_mentions_delta(
            spark, mentions, state_dir, version=int(batch_id) + 1
        )

    writer = pages.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint_path
    )
    if once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination(300)
        return q
    return writer.start()
