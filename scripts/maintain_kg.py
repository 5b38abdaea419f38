#!/usr/bin/env python
"""24/7 KG maintenance: fold one crawl delta into the standing graph.

The daily job a production KG runs instead of a full rebuild:

    new pages delta  ->  extract triples (plans/pipeline.py)
                     ->  fold into mergeable per-edge state
                         (operators/incremental.py)
                     ->  merge with the persisted standing state
                     ->  persist the new state version
                     ->  re-emit the edge report + re-resolved
                         functional-predicate conflicts — both computed
                         OFF THE STATE, never re-reading old crawls

    spark-submit --py-files ret_spark.zip scripts/maintain_kg.py \
        --pages /path/to/todays_pages.parquet --state /path/to/kg_state

State versioning: each fold writes ``<state>/v<N+1>`` and then updates
``<state>/LATEST``; the job never overwrites the version it is lazily
reading (Spark cannot overwrite its own input), old versions remain for
rollback (prune them with ``--keep-last-k``), and a crash before
LATEST flips is harmless: the next run derives its version from the
max COMMITTED ``v*`` directory, so the committed-but-unflipped state
becomes the base it folds onto — never mistaken for a replay of the
new delta.

The stage logic lives in :func:`maintain` so tests drive it directly
(tests/test_maintain_kg.py proves a two-day simulation lands on exactly
the single-pass full rebuild — report AND conflicts).

Scale notes: the delta pipeline is the audited narrow extract plan; the
fold is two map-side-combinable groupBys; the merge unions two
edge-keyed aggregate frames (orders of magnitude smaller than crawls)
and re-aggregates; conflicts are one partitioned window over standing
stats.  Nothing in the loop scales with total crawl history except the
state itself, which is bounded per edge.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
os.environ.setdefault("OMP_NUM_THREADS", "1")


def maintain(
    spark,
    pages,
    state_dir: str,
    keep_last_k: int | None = None,
    canon_state_dir: str | None = None,
):
    """Fold one pages delta into the standing state at ``state_dir``.

    Returns ``(report, conflicts, summary)`` — the refreshed rollup and
    conflict DataFrames (both derived from the new state version) plus a
    JSON-able summary of the fold.  The fold/persist core lives in
    operators/incremental.py::fold_pages_delta (shared with the
    Structured Streaming path).

    ``canon_state_dir`` additionally folds the delta's entity-mention
    surfaces into the STANDING canonical-component map
    (operators/incremental_canon.py): canonical ids stay stable for
    entities the delta does not touch — the property a 24/7 KG needs
    that per-run batch canonicalization cannot give.
    """
    from pyspark.sql import functions as F

    from relation_extraction_transformer_spark.operators import (
        incremental as INC,
    )
    from relation_extraction_transformer_spark.operators import (
        incremental_canon as IC,
    )
    from relation_extraction_transformer_spark.operators import (
        linking as LINK,
    )
    from relation_extraction_transformer_spark.plans import kg_sql as KQ
    from relation_extraction_transformer_spark.plans import pipeline as PL

    summary = INC.fold_pages_delta(spark, pages, state_dir)

    if canon_state_dir is not None:
        # mention surfaces of the delta: node_id is the md5-derived
        # stable id of the NORMALIZED name — the deterministic-function-
        # of-name contract fold_mentions_delta requires
        triples = PL.triples_plan(pages, spark, keep_probs=False)
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
        cs = IC.fold_mentions_delta(spark, mentions, canon_state_dir)
        summary["canon"] = {
            "state_version": cs["state_version"],
            "new_nodes": cs["new_nodes"],
            "touched_components": cs["touched_components"],
        }
        if keep_last_k is not None:
            summary["canon"]["vacuumed"] = INC.vacuum_state(
                canon_state_dir, keep_last_k, IC.CANON_DATASETS
            )

    # everything user-facing comes off the persisted state — the raw
    # delta (and every older crawl) is out of the picture from here on
    state = INC.read_edge_state(
        spark, os.path.join(state_dir, f"v{summary['state_version']}")
    )
    report = INC.edge_report(state)
    conflicts = INC.conflicts_from_stats(state.stats, KQ.FUNCTIONAL_PREDS)
    summary = dict(
        summary,
        edges=state.stats.count(),
        conflicted_keys=conflicts.count(),
    )
    if keep_last_k is not None:
        # retention AFTER the fold + reads above: never deletes the
        # version just written (it is the max committed) nor the one
        # LATEST names
        summary["vacuumed"] = INC.vacuum_state(state_dir, keep_last_k)
    return report, conflicts, summary


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", required=True, help="pages delta parquet")
    ap.add_argument("--state", required=True, help="standing state dir")
    ap.add_argument("--report-out", default=None, help="optional parquet out")
    ap.add_argument(
        "--canon-state", default=None,
        help="optional standing canonical-map state dir: the delta's "
        "mention surfaces fold into stable canonical components",
    )
    ap.add_argument(
        "--keep-last-k", type=int, default=None,
        help="retention: delete committed state versions older than the "
        "newest K (never the one LATEST names); default keeps all",
    )
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("maintain_kg")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    try:
        pages = spark.read.parquet(args.pages)
        report, conflicts, summary = maintain(
            spark, pages, args.state, keep_last_k=args.keep_last_k,
            canon_state_dir=args.canon_state,
        )
        if args.report_out:
            report.write.mode("overwrite").parquet(
                os.path.join(args.report_out, "report")
            )
            conflicts.write.mode("overwrite").parquet(
                os.path.join(args.report_out, "conflicts")
            )
        print(json.dumps(summary))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
