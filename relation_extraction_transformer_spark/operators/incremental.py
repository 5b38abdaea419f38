"""Incremental KG edge-rollup maintenance — mergeable per-edge state.

A 24/7 KG pipeline does not rebuild ``kg_edge_history`` from the full
crawl every day; it folds each new crawl delta into standing per-edge
state.  That only works if every field of the state is MERGEABLE — a
commutative, associative fold so that state(delta_1) ⊕ state(delta_2) ==
state(delta_1 ∪ delta_2) exactly, for any partitioning of the
observations into deltas:

- ``n_obs``             -> SUM        (deltas are disjoint observation sets)
- ``first_seen``        -> MIN
- ``last_seen``         -> MAX
- ``max_prob``          -> MAX
- distinct-url count    -> per-edge sparse HLL registers, merged by
  element-wise MAX (functions/sketches.py).  An exact COUNT(DISTINCT) is
  NOT mergeable from aggregates — you would have to keep every url ever
  seen per edge; the register state is bounded at min(urls, 1024) rows
  per edge and merge==rebuild holds BIT-exactly because max is
  associative, commutative and idempotent.

The reference pipeline has no incremental surface (it consumes a static
TACRED dump — ref ``data/loader.py:40``); this is the KG-construct
maintenance operation the north rule's always-on crawl implies.

Scale shape: building state from a delta is one url-keyed join
projection plus two map-side-combinable groupBys (stats on the edge key,
registers on (edge, bucket)); merging two states is a unionAll plus the
same two groupBys — the raw deltas are never re-read.  The report joins
stats with the per-edge estimate on the edge key (both sides already
hash-partitioned on it by their aggregations, so AQE plans a
shuffle-reuse join).
"""

from __future__ import annotations

import os
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import sketches as SK

EDGE_KEYS = ["subj", "pred", "obj"]


class EdgeState(NamedTuple):
    """Mergeable rollup state: per-edge stats + per-edge url registers."""

    # subj, pred, obj, n_obs, first_seen, last_seen, max_prob, score_dec
    stats: DataFrame
    regs: DataFrame  # subj, pred, obj, bucket, rho


# sums of per-delta DECIMAL(18,6) sums; 28,6 holds ~10^22 observations
_SCORE_DEC = "decimal(28,6)"


def edge_state(obs: DataFrame) -> EdgeState:
    """Fold one observation delta — rows of
    ``(subj, pred, obj, url, prob, ts)`` — into edge-rollup state.

    ``score_dec`` is the noisy-or fused belief (kg_sql's kg_fusion
    formula: -sum of ROUND(ln(1-p), 6) quantized to DECIMAL) — a plain
    sum, so fusion itself is incrementally maintainable; the DECIMAL
    type is pinned so merged and rebuilt states carry identical
    schemas."""
    nl = F.round(
        F.log(F.lit(1.0) - F.least(F.col("prob"), F.lit(0.999999))), 6
    ).cast("decimal(18,6)")
    stats = (
        obs.withColumn("nl", nl)
        .groupBy(*EDGE_KEYS)
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
            F.max("prob").alias("max_prob"),
            (-F.sum("nl")).cast(_SCORE_DEC).alias("score_dec"),
        )
    )
    regs = SK.hll_registers_by(obs, EDGE_KEYS, "url")
    return EdgeState(stats, regs)


def merge_edge_state(a: EdgeState, b: EdgeState) -> EdgeState:
    """state(d1) ⊕ state(d2): field-wise SUM/MIN/MAX on the stats,
    element-wise register MAX on the sketches.  Exact merge==rebuild for
    disjoint observation deltas; n_obs and score_dec are sums, so a
    RE-delivered (non-disjoint) delta inflates exactly those two — every
    other field is idempotent."""
    stats = (
        a.stats.unionAll(b.stats)
        .groupBy(*EDGE_KEYS)
        .agg(
            F.sum("n_obs").alias("n_obs"),
            F.min("first_seen").alias("first_seen"),
            F.max("last_seen").alias("last_seen"),
            F.max("max_prob").alias("max_prob"),
            F.sum("score_dec").cast(_SCORE_DEC).alias("score_dec"),
        )
    )
    regs = (
        a.regs.unionAll(b.regs)
        .groupBy(*EDGE_KEYS, "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    return EdgeState(stats, regs)


def conflicts_from_stats(stats: DataFrame, preds: tuple[str, ...]) -> DataFrame:
    """Functional-predicate conflict resolution over any frame carrying
    ``(subj, pred, obj, n_obs, score_dec)`` — the single implementation
    behind both the registered ``kg_conflicts`` query (fed by the
    full-corpus fusion aggregation) and the 24/7 path (fed by STANDING
    EdgeState.stats, so conflicts re-resolve after each fold-in without
    re-reading any raw crawl).  Partitioned window only — never a
    SinglePartition exchange."""
    from pyspark.sql import Window

    w = Window.partitionBy("subj", "pred").orderBy(
        F.col("score_dec").desc(), F.col("n_obs").desc(), F.col("obj").asc()
    )
    wp = Window.partitionBy("subj", "pred")
    return (
        stats.where(F.col("pred").isin(*preds))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("runner_dec", F.lead("score_dec", 1).over(w))
        .withColumn("n_candidates", F.count(F.lit(1)).over(wp))
        .withColumn("total_obs", F.sum("n_obs").over(wp))
        .where((F.col("rn") == 1) & (F.col("n_candidates") >= 2))
        .select(
            "subj", "pred",
            F.col("obj").alias("winner_obj"),
            F.col("n_obs").alias("winner_obs"),
            "n_candidates", "total_obs",
            F.col("score_dec").cast("double").alias("winner_score"),
            (F.col("score_dec") - F.col("runner_dec"))
            .cast("double").alias("margin"),
        )
    )


def write_edge_state(state: EdgeState, path: str, mode: str = "overwrite") -> None:
    """Persist standing state as two parquet datasets (``stats/`` and
    ``regs/``) — the durable handoff between daily fold-in jobs.  Both
    frames are edge-keyed aggregates, orders of magnitude smaller than
    the raw crawl; writing them partitioned-as-aggregated keeps the next
    fold's merge a local groupBy after the union."""
    state.stats.write.mode(mode).parquet(os.path.join(path, "stats"))
    state.regs.write.mode(mode).parquet(os.path.join(path, "regs"))


def read_edge_state(spark: SparkSession, path: str) -> EdgeState:
    """Load persisted state written by :func:`write_edge_state`."""
    return EdgeState(
        stats=spark.read.parquet(os.path.join(path, "stats")),
        regs=spark.read.parquet(os.path.join(path, "regs")),
    )


def latest_version(state_dir: str) -> int:
    """Current state version per the ``LATEST`` marker (0 = no state)."""
    marker = os.path.join(state_dir, "LATEST")
    if not os.path.exists(marker):
        return 0
    return int(open(marker).read().strip())


def committed_versions(
    state_dir: str, datasets: tuple[str, ...] = ("stats", "regs")
) -> list[int]:
    """Every version whose datasets ALL carry ``_SUCCESS`` markers,
    ascending.  This is the durable truth about what was folded; the
    ``LATEST`` marker is only a convenience pointer that may lag one
    behind after a crash between the state write and the flip.
    ``datasets`` names the per-version parquet subdirectories (edge
    state: stats+regs; canonical-map state: nodes+bands)."""
    out = []
    if not os.path.isdir(state_dir):
        return out
    for name in os.listdir(state_dir):
        if not (name.startswith("v") and name[1:].isdigit()):
            continue
        if all(
            os.path.exists(os.path.join(state_dir, name, d, "_SUCCESS"))
            for d in datasets
        ):
            out.append(int(name[1:]))
    return sorted(out)


def _flip_latest(state_dir: str, version: int) -> None:
    """Atomically point ``LATEST`` at ``version`` (write-tmp + rename).
    ``os.replace`` is atomic on POSIX filesystems; an object store
    deployment would condition this on a compare-and-swap or a catalog
    transaction instead — the marker is advisory either way, because
    readers can always recover the durable truth from
    :func:`committed_versions`."""
    tmp = os.path.join(state_dir, "LATEST.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.replace(tmp, os.path.join(state_dir, "LATEST"))


def vacuum_state(
    state_dir: str,
    keep_last_k: int,
    datasets: tuple[str, ...] = ("stats", "regs"),
) -> list[int]:
    """Retention for the 24/7 loop: delete committed versions older than
    the newest ``keep_last_k``, never touching the version ``LATEST``
    points at, the maximum committed version, or any UNcommitted
    directory (a concurrent writer may be mid-commit there).  Returns
    the versions removed.  Without this, a daily fold accumulates state
    versions forever (each is edge-keyed aggregate data — small next to
    the crawl, but unbounded over years)."""
    import shutil

    if keep_last_k < 1:
        raise ValueError("keep_last_k must be >= 1")
    committed = committed_versions(state_dir, datasets)
    keep = set(committed[-keep_last_k:])
    keep.add(latest_version(state_dir))
    removed = []
    for v in committed:
        if v in keep:
            continue
        shutil.rmtree(os.path.join(state_dir, f"v{v}"))
        removed.append(v)
    return removed


def fold_pages_delta(
    spark: SparkSession,
    pages: DataFrame,
    state_dir: str,
    version: int | None = None,
) -> dict:
    """Fold one crawl delta of pages into the standing state under
    ``state_dir``: extract triples (the audited narrow batch plan), fold
    into delta state, merge with the persisted standing version, write
    ``v<version>`` and flip the ``LATEST`` marker.

    Versioning makes the fold replay-safe: a caller that derives
    ``version`` from a durable sequence (e.g. a Structured Streaming
    ``batch_id``) gets exactly-once state even when the framework
    re-delivers a batch after a crash — an already-written version is
    skipped, and LATEST only ever moves forward.  Left at ``None`` (the
    batch-job path), the version is one past the max COMMITTED version
    (falling back to LATEST), so a crash between the state write and
    the LATEST flip can never make a later run mistake its fresh delta
    for a replay.
    """
    from ..plans import pipeline as PL

    cur = latest_version(state_dir)
    if version is None:
        # Derive the next version from the DURABLE truth (max committed
        # v* dir), not the LATEST pointer: after a crash between
        # write_edge_state and the flip, a committed v(cur+1) exists
        # that LATEST does not name.  Using LATEST+1 would alias
        # TODAY'S different delta onto the crashed run's _SUCCESS
        # markers, classify it 'replayed', and silently drop the new
        # data while flipping LATEST (ADVICE r6).  A committed-but-
        # unflipped version is valid already-folded state — today's
        # delta folds on top of it.  (Only the batch path needs this;
        # the streaming path ties ``version`` to the batch_id, so a
        # replay really is the same delta.)
        committed = committed_versions(state_dir)
        cur = max(cur, committed[-1] if committed else 0)
        version = cur + 1
    new_dir = os.path.join(state_dir, f"v{version}")
    # a version counts as written only when BOTH datasets committed
    replayed = all(
        os.path.exists(os.path.join(new_dir, d, "_SUCCESS"))
        for d in ("stats", "regs")
    )
    if not replayed:
        if version <= cur:
            # an unwritten version at-or-below LATEST is a misuse (e.g.
            # a fresh stream pointed at a batch-advanced state dir):
            # folding it would merge against a LATER state.  Replays of
            # committed versions are handled above; reject the rest.
            raise ValueError(
                f"version {version} <= LATEST {cur} but v{version} was "
                f"never committed; use a fresh state_dir for this source"
            )
        triples = PL.triples_plan(pages, spark, keep_probs=False)
        obs = triples.select("url", "subj", "pred", "obj", "prob").join(
            pages.select(
                "url",
                F.unix_timestamp("warc_ts").cast("bigint").alias("ts"),
            ),
            "url",
        )
        # write_edge_state below is TWO actions (stats, regs), and both
        # datasets derive from obs — without a materialization the full
        # delta extraction (the Arrow inference pipeline, the dominant
        # fold cost) runs once per dataset.  Checkpoint the edge-keyed
        # observation rows once; both aggregations then read the
        # delta-sized checkpoint (r8: halves the extract share of the
        # fold wall, measured in OPTIMIZATION_r08.md).
        obs = obs.localCheckpoint(eager=True)
        delta = edge_state(obs)
        if cur > 0:
            standing = read_edge_state(
                spark, os.path.join(state_dir, f"v{cur}")
            )
            delta = merge_edge_state(standing, delta)
        write_edge_state(delta, new_dir)
    if version > cur:
        _flip_latest(state_dir, version)
    return {
        "state_version": version,
        "bootstrap": cur == 0,
        "replayed": replayed,
    }


def edge_report(state: EdgeState) -> DataFrame:
    """Human-facing rollup: stats + the per-edge distinct-url estimate
    from the register state.  Per-edge url counts are tiny relative to
    the 1024 registers, so the estimate sits in the near-exact
    linear-counting regime."""
    est = SK.hll_estimate_by(state.regs, EDGE_KEYS)
    return (
        state.stats.join(est, EDGE_KEYS)
        .select(
            *EDGE_KEYS,
            "n_obs",
            "first_seen",
            "last_seen",
            F.round(F.col("max_prob"), 6).alias("max_prob"),
            F.col("score_dec").cast("double").alias("fused_score"),
            F.col("est_hll").alias("est_urls"),
        )
    )
