"""Streaming KG maintenance: foreachBatch fold-in over micro-batches
must land on exactly the single-pass batch rebuild, and a re-delivered
batch must be a no-op (exactly-once via durable batch-id versions)."""

import os

from pyspark.sql import functions as F

from relation_extraction_transformer_spark.operators import incremental as INC
from relation_extraction_transformer_spark.plans import pipeline as PL
from relation_extraction_transformer_spark.streaming import stream as ST

PAGES = "/root/repo/artifacts/kg_pages.parquet"


def _obs(spark, pages):
    triples = PL.triples_plan(pages, spark, keep_probs=False)
    return triples.select("url", "subj", "pred", "obj", "prob").join(
        pages.select(
            "url", F.unix_timestamp("warc_ts").cast("bigint").alias("ts")
        ),
        "url",
    )


def test_streamed_fold_equals_batch_rebuild_and_replay_is_noop(
    spark, tmp_path
):
    pages = spark.read.parquet(PAGES)
    pages_dir = str(tmp_path / "pages")
    pages.repartition(4).write.parquet(pages_dir)
    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir)

    ST.run_streaming_edge_fold(
        spark, pages_dir, state_dir,
        checkpoint_path=str(tmp_path / "ckpt"),
        max_files_per_trigger=2,  # forces >= 2 micro-batches
    )
    n_versions = INC.latest_version(state_dir)
    assert n_versions >= 2, "expected multiple micro-batches"

    final = INC.read_edge_state(spark, f"{state_dir}/v{n_versions}")
    streamed = sorted(map(tuple, INC.edge_report(final).collect()))
    rebuilt = sorted(
        map(tuple, INC.edge_report(INC.edge_state(_obs(spark, pages))).collect())
    )
    assert streamed == rebuilt

    # crash-replay of the last batch: version already committed -> no-op
    summary = INC.fold_pages_delta(
        spark, pages, state_dir, version=n_versions
    )
    assert summary["replayed"] is True
    after = INC.read_edge_state(spark, f"{state_dir}/v{n_versions}")
    assert sorted(map(tuple, INC.edge_report(after).collect())) == streamed


def test_streamed_canon_fold_equals_batch_rebuild_and_replay_is_noop(
    spark, tmp_path
):
    """Streaming canonical-map maintenance: folding micro-batches of
    pages must land on EXACTLY the single-pass batch canonicalization
    of the full corpus's mention surfaces, and a re-delivered batch is
    a committed-version no-op."""
    import os as _os

    from pyspark.sql import functions as F

    from relation_extraction_transformer_spark.operators import (
        incremental_canon as IC,
    )
    from relation_extraction_transformer_spark.operators import (
        linking as LINK,
    )

    pages = spark.read.parquet(PAGES)
    pages_dir = str(tmp_path / "pages")
    pages.repartition(4).write.parquet(pages_dir)
    state_dir = str(tmp_path / "canon")
    os.makedirs(state_dir)

    ST.run_streaming_canon_fold(
        spark, pages_dir, state_dir,
        checkpoint_path=str(tmp_path / "ckpt"),
        max_files_per_trigger=2,  # forces >= 2 micro-batches
    )
    n_versions = INC.latest_version(state_dir)
    assert n_versions >= 2, "expected multiple micro-batches"

    nodes, _ = IC.read_canon_state(spark, f"{state_dir}/v{n_versions}")
    streamed = {(r.node_id): (r.name, r.component) for r in nodes.collect()}

    triples = PL.triples_plan(pages, spark, keep_probs=False)
    mentions = (
        triples.select(F.col("subj").alias("surface"))
        .unionAll(triples.select(F.col("obj").alias("surface")))
        .select(LINK.normalize_surface(F.col("surface")).alias("name"))
        .distinct()
        .select(LINK.stable_id(F.col("name")).alias("node_id"), "name")
    )
    rebuilt_nodes, _ = IC.canon_state(mentions)
    rebuilt = {
        (r.node_id): (r.name, r.component)
        for r in rebuilt_nodes.collect()
    }
    assert streamed == rebuilt

    # crash-replay of the last batch: version already committed -> no-op
    s = IC.fold_mentions_delta(
        spark,
        mentions.limit(0),
        state_dir,
        version=n_versions,
    )
    assert s["replayed"] is True
    after, _ = IC.read_canon_state(spark, f"{state_dir}/v{n_versions}")
    assert {
        (r.node_id): (r.name, r.component) for r in after.collect()
    } == streamed
    assert _os.path.exists(os.path.join(state_dir, "LATEST"))


def test_unwritten_out_of_order_version_is_rejected(spark, tmp_path):
    """A fresh (never-committed) version at-or-below LATEST must raise —
    folding it would merge against a later state."""
    import pytest

    pages = spark.read.parquet(PAGES)
    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir)
    INC.fold_pages_delta(spark, pages, state_dir)  # v1
    INC.fold_pages_delta(spark, pages, state_dir)  # v2
    # simulate an uncommitted v1: remove it, then ask to fold v1 again
    import shutil

    shutil.rmtree(os.path.join(state_dir, "v1"))
    with pytest.raises(ValueError, match="never committed"):
        INC.fold_pages_delta(spark, pages, state_dir, version=1)


def test_crash_before_latest_flip_does_not_swallow_next_delta(
    spark, tmp_path
):
    """ADVICE r6: batch path, crash AFTER write_edge_state but BEFORE
    the LATEST flip.  The next run (a DIFFERENT pages delta) must fold
    on top of the committed-but-unflipped version — never classify
    itself as a replay and silently drop its data."""
    pages = spark.read.parquet(PAGES)
    urls = sorted(r.url for r in pages.select("url").distinct().collect())
    half = set(urls[: len(urls) // 2])
    d1 = pages.where(F.col("url").isin(half))
    d2 = pages.where(~F.col("url").isin(half))

    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir)
    INC.fold_pages_delta(spark, d1, state_dir)  # v1, LATEST=1
    INC.fold_pages_delta(spark, d2, state_dir)  # v2, LATEST=2
    # simulate the crash: v2 is committed but LATEST still says 1
    INC._flip_latest(state_dir, 1)
    v2_obs = (
        INC.read_edge_state(spark, f"{state_dir}/v2")
        .stats.agg(F.sum("n_obs")).collect()[0][0]
    )
    d2_obs = _obs(spark, d2).count()

    # the next run folds d2's pages AGAIN as a fresh delta (a distinct
    # delivery, so its observations must ADD — under the old LATEST+1
    # law this run would alias onto v2's _SUCCESS markers, classify
    # itself 'replayed', and silently drop the data)
    s = INC.fold_pages_delta(spark, d2, state_dir)
    assert s["state_version"] == 3, "must base on max committed, not LATEST"
    assert s["replayed"] is False
    assert INC.latest_version(state_dir) == 3
    v3_obs = (
        INC.read_edge_state(spark, f"{state_dir}/v3")
        .stats.agg(F.sum("n_obs")).collect()[0][0]
    )
    # exact integer law: the crashed fold's work (v2 = d1+d2) was kept
    # AND the new delta's observations landed on top
    assert v3_obs == v2_obs + d2_obs


def test_vacuum_prunes_old_versions_and_fold_still_equals_rebuild(
    spark, tmp_path
):
    """keep_last_k retention: old committed versions are deleted, the
    LATEST / max-committed versions survive, and the next fold after a
    vacuum still equals the full rebuild."""
    import pytest

    pages = spark.read.parquet(PAGES)
    urls = sorted(r.url for r in pages.select("url").distinct().collect())
    third = max(1, len(urls) // 3)
    parts = [
        pages.where(F.col("url").isin(set(urls[i * third: (i + 1) * third])))
        for i in range(2)
    ] + [pages.where(~F.col("url").isin(set(urls[: 2 * third])))]

    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir)
    for d in parts[:2]:
        INC.fold_pages_delta(spark, d, state_dir)
    removed = INC.vacuum_state(state_dir, keep_last_k=1)
    assert removed == [1]
    assert not os.path.exists(os.path.join(state_dir, "v1"))
    assert INC.committed_versions(state_dir) == [2]
    assert INC.latest_version(state_dir) == 2

    INC.fold_pages_delta(spark, parts[2], state_dir)  # folds onto v2
    # exact integer law: vacuuming v1 must not lose any folded
    # observation (v3 = all three deltas; probs regroup across batch
    # boundaries at ~1e-6, so counts are the precision-safe comparison)
    v3 = INC.read_edge_state(spark, f"{state_dir}/v3")
    got_obs = v3.stats.agg(F.sum("n_obs")).collect()[0][0]
    want_obs = _obs(spark, pages).count()
    assert got_obs == want_obs
    got_edges = v3.stats.count()
    want_edges = (
        INC.edge_state(_obs(spark, pages)).stats.count()
    )
    assert got_edges == want_edges
    with pytest.raises(ValueError, match="keep_last_k"):
        INC.vacuum_state(state_dir, keep_last_k=0)


def test_empty_delta_fold_is_a_version_bump_noop(spark, tmp_path):
    """A crawl day with zero new pages (routine for continuous
    triggers): the fold must commit a new version whose report is
    byte-identical to the previous one."""
    pages = spark.read.parquet(PAGES)
    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir)
    INC.fold_pages_delta(spark, pages, state_dir)
    before = sorted(
        map(
            tuple,
            INC.edge_report(
                INC.read_edge_state(spark, f"{state_dir}/v1")
            ).collect(),
        )
    )
    s = INC.fold_pages_delta(
        spark, pages.where(F.lit(False)), state_dir
    )
    assert s["state_version"] == 2 and not s["replayed"]
    after = sorted(
        map(
            tuple,
            INC.edge_report(
                INC.read_edge_state(spark, f"{state_dir}/v2")
            ).collect(),
        )
    )
    assert after == before
