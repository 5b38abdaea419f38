"""Checkpoint-resumable runs with per-partition lineage + metrics rows.

North-rule requirement with no reference counterpart (closest analogue:
the lemma-pickle cache, ref:data/loader.py:75-85 — a whole-dataset cache;
ours is per-bucket and idempotent).

Mechanism:

- work is split into ``n_buckets`` deterministic url-hash buckets
  (``pmod(xxhash64(url), n)``); the production pages table is expected to
  be stored bucketed/partitioned by the same key so the per-group filter
  prunes at the source instead of rescanning,
- buckets are processed in groups; each group's triples are written to
  ``out/triples/bucket=<b>/`` and a manifest row (bucket, rows_out,
  wall_ms, finished_ts) is appended ONLY after the group commits,
- on restart, completed buckets are read from the manifest and skipped —
  an idempotent resume with no partial-output risk (parquet dir per
  bucket is overwritten atomically per group),
- stage-level metrics (pages/sentences/candidates/triples counts) are
  captured with ``DataFrame.observe`` — zero extra actions — and appended
  to ``out/_metrics``.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Observation
from pyspark.sql import functions as F

from ..config import PipelineConfig, DEFAULT_PIPELINE
from . import pipeline as PL


@dataclass
class RunReport:
    run_id: str
    buckets_done: list[int]
    buckets_skipped: list[int]
    rows_out: int


def _manifest_path(out_path: str) -> str:
    return f"{out_path}/_manifest"


def completed_buckets(spark: SparkSession, out_path: str) -> set[int]:
    try:
        return {
            r.bucket
            for r in spark.read.parquet(_manifest_path(out_path)).collect()
        }
    except Exception:
        return set()


def write_bucketed_pages(
    pages: DataFrame, path: str, n_buckets: int = 16
) -> None:
    """Materialize pages partitioned by the resume bucket key (the
    production layout: each resume group then prunes to its own files)."""
    pages.withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
    ).write.mode("overwrite").partitionBy("bucket").parquet(path)


def materialize_triples_resumable(
    spark: SparkSession,
    pages: DataFrame,
    out_path: str,
    run_id: str,
    n_buckets: int = 16,
    buckets_per_group: int = 4,
    cfg: PipelineConfig = DEFAULT_PIPELINE,
) -> RunReport:
    done = completed_buckets(spark, out_path)
    pending = [b for b in range(n_buckets) if b not in done]

    if "bucket" in pages.columns:
        # the input table is already partitioned by the bucket key (the
        # production layout written by write_bucketed_pages): the per-group
        # filter below becomes a PARTITION-PRUNING predicate — each group
        # reads only its own files instead of rescanning the table
        bucketed_pages = pages
    else:
        bucketed_pages = pages.withColumn(
            "bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
        )

    rows_total = 0
    done_now: list[int] = []
    for i in range(0, len(pending), buckets_per_group):
        group = pending[i : i + buckets_per_group]
        t0 = time.perf_counter()

        obs = Observation(f"triples_{run_id}_{group[0]}")
        group_pages = bucketed_pages.filter(F.col("bucket").isin(group))
        triples = PL.triples_plan(
            group_pages.drop("bucket"), spark, cfg=cfg, keep_probs=False
        ).withColumn(
            "bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
        ).observe(
            obs, F.count(F.lit(1)).alias("rows_out")
        )

        (
            triples.write.mode("overwrite")
            .partitionBy("bucket")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(f"{out_path}/triples")
        )
        wall_ms = int((time.perf_counter() - t0) * 1000)
        rows_out = int(obs.get["rows_out"])
        rows_total += rows_out

        # lineage rows: one per bucket, appended only after the commit
        manifest_rows = [
            (run_id, b, rows_out, wall_ms, int(time.time())) for b in group
        ]
        spark.createDataFrame(
            manifest_rows,
            "run_id string, bucket int, group_rows_out long, wall_ms long, "
            "finished_ts long",
        ).write.mode("append").parquet(_manifest_path(out_path))

        spark.createDataFrame(
            [(run_id, "triples", ",".join(map(str, group)), rows_out, wall_ms)],
            "run_id string, stage string, buckets string, rows_out long, "
            "wall_ms long",
        ).write.mode("append").parquet(f"{out_path}/_metrics")
        done_now.extend(group)

    return RunReport(
        run_id=run_id,
        buckets_done=done_now,
        buckets_skipped=sorted(done),
        rows_out=rows_total,
    )


def observed_pipeline_metrics(
    spark: SparkSession, pages: DataFrame, cfg: PipelineConfig = DEFAULT_PIPELINE
) -> dict[str, int]:
    """One-action stage-count instrumentation of the flagship plan using
    ``observe`` (no extra jobs): pages/sentences/candidates in, triples out.
    """
    from ..operators import ner as NER
    from ..sources import pages as PG

    obs_pages = Observation("pages")
    obs_sent = Observation("sentences")
    obs_cand = Observation("candidates")

    arts = PL.build_artifacts(spark, cfg)
    extracted = PG.extract_text(pages).observe(
        obs_pages, F.count(F.lit(1)).alias("n")
    ).filter(F.col("lang") == "en")
    sentences = NER.split_sentences(extracted, text_col="extracted_text").observe(
        obs_sent, F.count(F.lit(1)).alias("n")
    )
    tokenized = NER.tokenize(sentences)
    kept = NER.detect_mentions(tokenized)
    tagged = NER.ner_tags_from_mentions(kept)
    from ..operators import candidates as CAND
    from ..operators import preprocess as PRE
    from ..operators import inference as INF

    pairs = CAND.generate_pairs(tagged, cfg.max_pairs_per_sentence)
    feats = PRE.preprocess_candidates(pairs, lower=cfg.model.lower).observe(
        obs_cand, F.count(F.lit(1)).alias("n")
    )
    slim = feats.select(
        "url", "sent_id", "pair_id", "masked_tokens", "pos_ids", "ner_ids",
        "subj_positions", "obj_positions",
    )
    predicted = INF.predict_relations(
        slim, arts.params_bc, cfg.model, vocab_bc=arts.vocab_bc, keep_probs=False
    )
    n_triples = INF.triples_from_predictions(predicted).count()

    return {
        "pages": int(obs_pages.get["n"]),
        "sentences": int(obs_sent.get["n"]),
        "candidates": int(obs_cand.get["n"]),
        "triples": n_triples,
    }
