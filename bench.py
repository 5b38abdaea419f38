#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Extra keys report the north-rule throughput figure (triples/sec for the
flagship KG pipeline, median-of-5 on a 4x corpus), the parallelism used,
and — every run — the N -> 4N scaling evidence: the same KG job in
affinity-bound subprocesses at TWO core-count pairs (2 -> 8, the
local[2]-vs-local[8] form BASELINE.md names as the sandbox analog of the
two-cluster-size criterion, plus 8 -> 32 with a same-run NumPy
host-ceiling control), all raw walls published (protocol in BENCH.md).
Both pairs run on one shared scaling corpus (8x the headline corpus);
SPARK_GRAFT_SCALING=1 upgrades it to 16x for the long-form measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# flagship corpus size scales with the sf of the testdata dir
_SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
N_PAGES = max(200, int(40000 * _SF))

# Flagship + scaling measurements run on a 4x corpus: round 2's 4k-page
# corpus was overhead-dominated (~4 s job, +-30% wall variance — the
# driver recorded a phantom 1.53x "regression" that was pure protocol
# noise).  16k pages at sf0.1 puts the job at ~15-20 s where the variance
# collapses; the headline figure is the MEDIAN of 5 timed runs after one
# warm-up (protocol in BENCH.md).
N_PAGES_KG = N_PAGES * 4

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "vocab_ranked",
    "dedup_exact",
    "minhash_candidate_pairs",
    "simhash_64",
    "ann_cosine_topk",
    "scorer_per_relation",
    "sessionize_users",
    # r6: connected-components duplicate-cluster resolution gets
    # round-over-round walls like the other iterative graph machinery
    "dup_clusters",
    # r6: HyperLogLog distinct-token sketch (incl. its exact-COUNT
    # honesty twin, which dominates the wall — the sketch half is the
    # map-side-combinable 1024-register groupBy)
    "hll_distinct",
]


def run_semdedup_bench(spark: SparkSession) -> dict:
    """Quantify the SemDeDup cell-count laws on the same quantized
    corpus: the r5 fixture shape (FIXED 4 cells — within-cell pairwise
    work is (N/4)^2, quadratic in corpus size), the r6 linear law
    (cells ∝ corpus: constant pairwise per cell but assignment cost
    N x n_cells = N^2/target), and the r7 default sqrt law
    (n_cells = ceil(sqrt N): assignment and pairwise balance at N^1.5 —
    VERDICT r6 #1).  The assignment-stage cost curve is the point:
    linear law does N^2/64 assignment sims here, sqrt law N^1.5."""
    from pyspark.sql import functions as F

    from relation_extraction_transformer_spark.operators import (
        semdedup as SEM,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 1000)
            .cast("long")
        ).alias("v"),
    ).localCheckpoint(eager=True)  # time the operator, not the scan

    def timed(**kw) -> float:
        t0 = time.perf_counter()
        SEM.semdedup(emb, "vec_id", "v", **kw).write.format(
            "noop"
        ).mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    fixed = timed(n_cells=4)
    scaled = timed(target_cell_size=64, cell_cap=256)
    sqrt_law = timed(cell_cap=256)  # r7 default: n_cells = ceil(sqrt N)

    # the COST CURVE (VERDICT r6 #1 done-criterion): the same two laws
    # at 4x the corpus.  Linear law's assignment stage is N^2/target
    # sims (16x when N quadruples); sqrt law's is N^1.5 (8x) — the
    # growth RATIO is the evidence, robust to host-window shifts
    big = emb
    for k in range(2):
        big = big.unionAll(
            big.select(
                (F.col("vec_id") + F.lit(10 ** (7 + k))).alias("vec_id"),
                "v",
            )
        )
    big = big.localCheckpoint(eager=True)

    def timed_big(**kw) -> float:
        t0 = time.perf_counter()
        SEM.semdedup(big, "vec_id", "v", **kw).write.format(
            "noop"
        ).mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    scaled4 = timed_big(target_cell_size=64, cell_cap=256)
    sqrt4 = timed_big(cell_cap=256)
    return {
        "fixed4_cells_sec": fixed,
        "scaled_cells_sec": scaled,
        "sqrt_law_cells_sec": sqrt_law,
        "speedup": round(fixed / scaled, 2),
        "speedup_sqrt_vs_fixed": round(fixed / sqrt_law, 2),
        "curve_4x": {
            "linear_law_sec": scaled4,
            "sqrt_law_sec": sqrt4,
            "linear_growth": round(scaled4 / scaled, 2),
            "sqrt_growth": round(sqrt4 / sqrt_law, 2),
        },
    }


def make_spark(cores: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"ret-spark-bench-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.session.timeZone", "UTC")
        # keep stdout/stderr clean: a consumer that merges the two
        # streams must still find ONE parseable JSON line — carriage-
        # return progress bars can interleave mid-line at buffer
        # boundaries
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        # the synthetic page files are tiny; the default 128m split packs
        # them into exactly one task wave, so stragglers set the wall.
        # 2m splits give multiple waves (what real 128MB-file inputs get
        # naturally at scale).  This is a PAGES-corpus setting: the
        # warehouse queries run with the standard 128m split (set per
        # section in main(); measured 2-3x faster on the TPC-H tables,
        # whose files are real-sized)
        .config("spark.sql.files.maxPartitionBytes", "2m")
        .config("spark.sql.files.openCostInBytes", "64k")
        # 16g, deliberately NOT most of the host's 128g: with a 48g heap
        # G1's young generation grows huge and individual collections
        # showed up as multi-second stragglers (8-core walls 28.9-51.7s
        # across invocations; with 16g the same job repeats at
        # 33.5-34.8s).  The bench data never approaches 16g.
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


# not source-keyed like the triples/dict caches below: page GENERATION is
# frozen by the byte-determinism invariant (same (seed, n) -> identical
# pages, tests/test_end_to_end.py) — a generator change breaks those
# tests loudly before it could silently stale a bench corpus
PAGES_PATH = f"/tmp/ret_bench_pages_sf{_SF}"
PAGES_PATH_KG = f"/tmp/ret_bench_pages_kg_sf{_SF}"


def ensure_pages(spark: SparkSession, n_pages: int, path: str) -> float:
    """Materialize a synthetic page corpus once (the fixture analog of
    the production Iceberg pages table).  Returns generation seconds
    (0.0 when cached)."""
    from relation_extraction_transformer_spark.sources import pages as PG

    marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(marker):
        return 0.0
    t0 = time.perf_counter()
    PG.synthetic_pages(spark, n_pages, seed=42, partitions=CPUS * 2).write.mode(
        "overwrite"
    ).parquet(path)
    return time.perf_counter() - t0


def run_kg_pipeline(spark: SparkSession, path: str) -> tuple[float, int]:
    """Flagship pages-scan -> triples; returns (wall sec, n_triples).
    Reads the materialized parquet so the measured path is scan ->
    extract -> NER -> pairs -> inference (the 100 TB shape)."""
    from relation_extraction_transformer_spark.plans import pipeline as PL

    t0 = time.perf_counter()
    pages = spark.read.parquet(path)
    n = PL.triples_plan(pages, spark, keep_probs=False).count()
    return time.perf_counter() - t0, n


def _kg_run_subprocess() -> None:
    """Hidden mode for the affinity-bound scaling measurement: run the KG
    job at the requested core count — one warm-up then TWO timed runs
    (this host shows sporadic ~25% straggler outliers, see kg_runs_sec)
    — and print ALL raw timed walls on one line so the parent can
    publish them."""
    cores = int(os.environ["SPARK_GRAFT_KG_RUN"])
    path = os.environ["SPARK_GRAFT_KG_PATH"]
    # warm-up may use a smaller corpus (JIT + python-worker spawn is what
    # it buys; at 2 cores a full-size warm run would triple the wall)
    warm_path = os.environ.get("SPARK_GRAFT_KG_WARM", path)
    spark = make_spark(cores)
    spark.sparkContext.setLogLevel("ERROR")
    run_kg_pipeline(spark, warm_path)  # warm
    walls = []
    n = 0
    for _ in range(2):
        sec, n = run_kg_pipeline(spark, path)
        walls.append(round(sec, 3))
    spark.stop()
    print(f"KGRUN {','.join(str(w) for w in walls)} {n}")


def _ceiling_worker(reps: int) -> float:
    """One unit of the hardware-ceiling control: fp32 GEMM+tanh loop, the
    same arithmetic shape as the inference kernel's hot path."""
    import numpy as _np

    a = _np.random.default_rng(0).standard_normal((2000, 360)).astype(_np.float32)
    b = _np.random.default_rng(1).standard_normal((360, 360)).astype(_np.float32)
    t0 = time.perf_counter()
    for _ in range(reps):
        a = _np.tanh(a @ b)
    return time.perf_counter() - t0


def numpy_ceiling_control(small: int, large: int, reps: int = 120) -> dict:
    """Pure-NumPy (Spark-free) scaling control, measured fresh every run:
    ``small`` vs ``large`` independent python processes each running the
    same fp32 GEMM+tanh loop.  On a single-socket host, per-core
    throughput drops at full occupancy (frequency scaling + shared memory
    bandwidth) — a limit a multi-node cluster does not have, since each
    node keeps its own memory bus.  The ratio of the measured pipeline
    efficiency to THIS control's efficiency is the Spark-attributable
    scaling loss."""
    import multiprocessing as mp

    def throughput(n_procs: int) -> float:
        with mp.Pool(n_procs) as pool:
            t0 = time.perf_counter()
            pool.map(_ceiling_worker, [reps] * n_procs)
            wall = time.perf_counter() - t0
        return n_procs * reps / wall

    thr_small = throughput(small)
    thr_large = throughput(large)
    return {
        "procs_small": small,
        "procs_large": large,
        "units_per_sec_small": round(thr_small, 1),
        "units_per_sec_large": round(thr_large, 1),
        "efficiency": round(thr_large / thr_small / (large / small), 3),
    }


def _source_key(*modules) -> str:
    """Cache-buster for /tmp bench materializations that outlive rounds:
    a digest of the producing modules' source, so editing the pipeline
    (or the dictionary aggregation) invalidates the cached parquet
    instead of silently timing stale data (review r5)."""
    import hashlib
    import inspect

    h = hashlib.md5()
    for m in modules:
        h.update(inspect.getsource(m).encode())
    return h.hexdigest()[:10]


def triples_bench_path() -> str:
    from relation_extraction_transformer_spark.plans import pipeline as PL
    from relation_extraction_transformer_spark.sources import pages as PG

    return f"/tmp/ret_bench_triples_sf{_SF}_{_source_key(PL, PG)}"


def run_graph_bench(spark: SparkSession) -> dict[str, float]:
    """Time the iterative graph-analytics machinery (VERDICT r4 #6) over
    a corpus-sized triples frame — the same operators the registered
    kg_pagerank / kg_triangle_count queries run, pointed at the KG
    pipeline's own output over the 4x bench corpus instead of the tiny
    fixed artifact (which only measures fixed overhead).  Materialized
    once per sf; warm + best-of-2 per query like the headline section."""
    from relation_extraction_transformer_spark.plans import kg_sql as KQ
    from relation_extraction_transformer_spark.plans import pipeline as PL

    path = triples_bench_path()
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        pages = spark.read.parquet(PAGES_PATH_KG)
        PL.triples_plan(pages, spark, keep_probs=False).write.mode(
            "overwrite"
        ).parquet(path)
    triples = spark.read.parquet(path)

    def timed(fn) -> float:
        fn().write.format("noop").mode("overwrite").save()  # warm
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
        return round(min(walls), 3)

    return {
        "kg_pagerank": timed(
            lambda: KQ._kg_pagerank_spark(spark, SF_DIR, triples=triples)
        ),
        "kg_triangle_count": timed(
            lambda: KQ._kg_triangle_count_spark(
                spark, SF_DIR, triples=triples
            )
        ),
        # r6 additions: frontier-join BFS and wedge-enumeration link
        # prediction over the same corpus-sized triples
        "kg_khop": timed(
            lambda: KQ._kg_khop_spark(spark, SF_DIR, triples=triples)
        ),
        "kg_link_prediction": timed(
            lambda: KQ._kg_link_prediction_spark(
                spark, SF_DIR, triples=triples
            )
        ),
        # r7: the hub cap prunes wedges at their source (degree filter
        # BEFORE the self-join) — the A/B wall shows what capping the
        # Theta(sum deg^2) middle term buys on this corpus's skew
        "kg_link_prediction_cap32": timed(
            lambda: KQ._kg_link_prediction_spark(
                spark, SF_DIR, triples=triples, max_middle_degree=32
            )
        ),
        # r6: knowledge fusion (noisy-or belief per fact) and functional-
        # predicate conflict resolution over the same corpus-sized triples
        "kg_fusion": timed(
            lambda: KQ._kg_fusion_spark(spark, SF_DIR, triples=triples)
        ),
        "kg_conflicts": timed(
            lambda: KQ._kg_conflicts_spark(spark, SF_DIR, triples=triples)
        ),
        # r6: synchronous label-propagation communities (5 rounds) and
        # the N-Triples publish map over the distinct fact set
        "kg_communities": timed(
            lambda: KQ._kg_communities_spark(spark, SF_DIR, triples=triples)
        ),
        "kg_ntriples": timed(
            lambda: KQ._kg_ntriples_spark(spark, SF_DIR, triples=triples)
        ),
    }


def run_incremental_bench(spark: SparkSession) -> float:
    """Steady-state cost of the 24/7 maintenance loop: bootstrap the
    standing state from half the 4x pages corpus, then time the OTHER
    half's fold — extract + delta state + merge with standing + versioned
    persist + refreshed report — i.e. one full daily cycle
    (operators/incremental.py::fold_pages_delta).  The point of the
    number: the fold's wall tracks the DELTA size, not total history."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from relation_extraction_transformer_spark.operators import (
        incremental as INC,
    )

    pages = spark.read.parquet(PAGES_PATH_KG)
    parity = F.crc32("url") % 2
    day1, day2 = pages.where(parity == 0), pages.where(parity == 1)

    state_dir = tempfile.mkdtemp(prefix="ret_bench_state_")
    try:
        INC.fold_pages_delta(spark, day1, state_dir)  # bootstrap (warm)
        t0 = time.perf_counter()
        s = INC.fold_pages_delta(spark, day2, state_dir)
        INC.edge_report(
            INC.read_edge_state(spark, f"{state_dir}/v{s['state_version']}")
        ).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)


def run_incremental_canon_bench(spark: SparkSession) -> float:
    """Steady-state cost of maintaining the STANDING canonical map
    (r7, operators/incremental_canon.py): bootstrap components from half
    the corpus's mention surfaces, then time the other half's fold —
    anti-join vs known nodes, delta bands, delta×standing candidate
    join, reduced-graph CC, touched-component relabel, versioned
    persist.  The wall must track the DELTA, not the standing world."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from relation_extraction_transformer_spark.operators import (
        incremental_canon as IC,
    )
    from relation_extraction_transformer_spark.operators import (
        linking as LINK,
    )
    from relation_extraction_transformer_spark.plans import pipeline as PL

    pages = spark.read.parquet(PAGES_PATH_KG)

    def mentions(df):
        triples = PL.triples_plan(df, spark, keep_probs=False)
        return (
            triples.select(F.col("subj").alias("surface"))
            .unionAll(triples.select(F.col("obj").alias("surface")))
            .select(LINK.normalize_surface(F.col("surface")).alias("name"))
            .distinct()
            .select(LINK.stable_id(F.col("name")).alias("node_id"), "name")
        )

    parity = F.crc32("url") % 2
    m1 = mentions(pages.where(parity == 0)).localCheckpoint(eager=True)
    m2 = mentions(pages.where(parity == 1)).localCheckpoint(eager=True)
    state_dir = tempfile.mkdtemp(prefix="ret_bench_canon_")
    try:
        IC.fold_mentions_delta(spark, m1, state_dir)  # bootstrap (warm)
        t0 = time.perf_counter()
        IC.fold_mentions_delta(spark, m2, state_dir)
        return round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)


def run_html_extract_bench(spark: SparkSession) -> dict:
    """Throughput of the general real-HTML extractor (round 5:
    functions/html_text.py scanner in an Arrow pandas UDF) vs the JVM
    regexp fast path, same pages corpus, identical output column.  The
    UDF is the path crawled HTML takes at scale; its per-page cost and
    the Python-crossing tax are what this section makes visible
    round-over-round."""
    from relation_extraction_transformer_spark.sources import pages as PG

    pages = spark.read.parquet(PAGES_PATH_KG)
    n = pages.count()

    def timed(fn) -> float:
        fn().write.format("noop").mode("overwrite").save()  # warm
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
        return round(min(walls), 3)

    jvm = timed(
        lambda: PG.extract_text(pages).select("url", "extracted_text")
    )
    udf = timed(
        lambda: PG.extract_text_html(pages).select("url", "extracted_text")
    )
    return {
        "pages": n,
        "jvm_fast_path_sec": jvm,
        "arrow_udf_sec": udf,
        "pages_per_sec_jvm": round(n / jvm, 1),
        "pages_per_sec_udf": round(n / udf, 1),
        "udf_tax": round(udf / jvm, 2),
    }


def run_skew_join_bench(spark: SparkSession) -> dict:
    """AQE skew-join demonstration for the big-dictionary linking path
    (VERDICT r4 #7).

    operators/linking.link_surface(broadcast_dict=False) claims its
    sort-merge join is AQE-skew-splittable; this section proves it end
    to end: a planted mention stream with ONE surface form at ~30% mass
    is linked against a dictionary too big to broadcast, with
    ``spark.sql.adaptive.skewJoin.enabled`` false vs true (thresholds
    sized to the bench corpus the way a real job sizes them to its
    shuffle stats).  Broadcast paths are disabled for the section so the
    measured plan is the genuine sort-merge shape that exists at web
    scale; walls are warm + best-of-2 per variant, and the executed plan
    is checked for the runtime skew split."""
    from pyspark.sql import functions as F

    from relation_extraction_transformer_spark.operators import linking as LK

    n_dict = 200_000
    n_facts = max(400_000, int(20_000_000 * _SF))
    dictionary = spark.range(n_dict).select(
        F.concat(F.lit("alias "), F.col("id")).alias("alias_norm"),
        F.concat(F.lit("Entity "), F.col("id")).alias("canonical_name"),
        F.lit("ORG").alias("ner_type"),
        F.lit(0).alias("alias_rank"),
        F.col("id").alias("entity_id"),
    )
    # materialize the aggregated dictionary once (the production shape:
    # aggregate once, reuse across linking jobs).  Load-bearing for the
    # demonstration: OptimizeSkewedJoin requires raw shuffle stages
    # under both join children, so the inline-aggregated dict side
    # disqualifies the rule — see linking.aggregate_dictionary.
    dict_path = f"/tmp/ret_bench_dict_agg_{n_dict}_{_source_key(LK)}"
    if not os.path.exists(os.path.join(dict_path, "_SUCCESS")):
        LK.aggregate_dictionary(dictionary).write.mode("overwrite").parquet(
            dict_path
        )
    dict_agg = spark.read.parquet(dict_path)
    # ~30% of mentions hit alias 0; the rest spread uniformly
    fact_alias = F.when(
        F.pmod(F.xxhash64("id"), F.lit(10)) < 3, F.lit(0)
    ).otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_dict)))
    mentions = spark.range(n_facts).select(
        F.col("id").alias("mention_id"),
        F.concat(F.lit("alias "), fact_alias).alias("surface"),
        F.lit("ORG").alias("ner_type"),
    )

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    out: dict = {"facts": n_facts, "dict_aliases": n_dict}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        # thresholds sized to the corpus (exactly how a production job
        # sizes them to its shuffle stats): the hot partition holds ~30%
        # of the facts, so the detection threshold sits well below its
        # compressed bytes at any sf while staying above the median
        big = n_facts >= 1_000_000
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "1m" if big else "256k",
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "512k" if big else "128k",
        )
        for label, enabled in (("disabled", "false"), ("enabled", "true")):
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.enabled", enabled
            )

            def run():
                df = LK.link_surface(
                    mentions, dict_agg, "surface", "ner_type", "ent",
                    broadcast_dict=False, pre_aggregated=True,
                )
                # execute through the df's OWN QueryExecution so the
                # post-run plan (with AQE's runtime skew decision) is
                # inspectable — a .write would spawn a fresh one
                jqe = df._jdf.queryExecution()
                t0 = time.perf_counter()
                jqe.toRdd().count()
                return time.perf_counter() - t0, jqe

            run()  # warm
            walls = []
            jqe = None
            for _ in range(2):
                sec, jqe = run()
                walls.append(round(sec, 3))
            plan = jqe.executedPlan().toString()
            out[f"skew_join_{label}_sec"] = min(walls)
            out[f"skew_join_{label}_runs"] = walls
            out[f"plan_has_skew_split_{label}"] = "skew=true" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    out["speedup"] = round(
        out["skew_join_disabled_sec"] / out["skew_join_enabled_sec"], 2
    )
    return out


def run_skew_bench(spark: SparkSession) -> dict:
    """Skew regression for functions/skew.py:salted_repartition.

    The page corpus is Pareto-skewed by host (host0 ~ 38% of rows,
    sources/pages.py:54).  Keying the pre-inference repartition on host —
    what a per-host downstream consumer would do — sends the hot host to
    ONE task; salting fans it over n_salts tasks.  Both variants run the
    identical scan -> ... -> inference job; only the repartition differs,
    so the delta is pure straggler elimination."""
    from pyspark.sql import functions as F

    from relation_extraction_transformer_spark.functions import skew as SKEW
    from relation_extraction_transformer_spark.plans import pipeline as PL

    pages = spark.read.parquet(PAGES_PATH).withColumn(
        "host", SKEW.host_of(F.col("url"))
    )
    plain = pages.repartition(CPUS, F.col("host")).drop("host")
    salted = SKEW.salted_repartition(pages, ["host"], CPUS, n_salts=8).drop(
        "host"
    )

    def part_max(df) -> int:
        rows = [r.rows for r in SKEW.partition_size_stats(df).collect()]
        return max(rows) if rows else 0

    def run(df) -> tuple[float, int]:
        t0 = time.perf_counter()
        n = PL.triples_plan(df, spark, keep_probs=False).count()
        return time.perf_counter() - t0, n


    run(plain)  # warm
    plain_sec = min(run(plain)[0] for _ in range(2))
    salted_sec, n_triples = run(salted)
    salted_sec = min(salted_sec, run(salted)[0])
    return {
        "triples": n_triples,
        "plain_repartition_sec": round(plain_sec, 3),
        "salted_repartition_sec": round(salted_sec, 3),
        "speedup": round(plain_sec / salted_sec, 2),
        "max_partition_rows_plain": part_max(plain),
        "max_partition_rows_salted": part_max(salted),
    }


def main() -> None:
    if os.environ.get("SPARK_GRAFT_KG_RUN"):
        _kg_run_subprocess()
        return

    import __spark_entry__ as entry

    spark = make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    timings: dict[str, float] = {}

    # warm the JVM/parquet footer caches with one cheap action
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    # warehouse tables are normal-sized parquet: standard 128m splits
    # (the 2m pages-corpus setting over-splits them, measured 2-3x slower)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
    for name in HEADLINE:
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    semdedup = run_semdedup_bench(spark)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")  # pages next

    gen_sec = ensure_pages(spark, N_PAGES, PAGES_PATH)  # skew-bench corpus
    gen_sec += ensure_pages(spark, N_PAGES_KG, PAGES_PATH_KG)

    # flagship: warm once, then MEDIAN of 3 timed runs on the 4x corpus
    # (see N_PAGES_KG comment — the round-2 best-of-2-on-4k protocol was
    # noise-dominated); all three raw walls are reported for transparency
    run_kg_pipeline(spark, PAGES_PATH_KG)  # warm python workers/JIT once
    kg_runs = []
    n_triples = 0
    for _ in range(5):
        sec, n_triples = run_kg_pipeline(spark, PAGES_PATH_KG)
        kg_runs.append(round(sec, 3))
    kg_sec = sorted(kg_runs)[2]
    timings["kg_triples"] = round(kg_sec, 3)
    triples_per_sec = round(n_triples / kg_sec, 1)

    timings.update(run_graph_bench(spark))
    timings["incremental_fold"] = run_incremental_bench(spark)
    timings["incremental_canon_fold"] = run_incremental_canon_bench(spark)

    skew = run_skew_bench(spark)
    skew_join = run_skew_join_bench(spark)
    html_extract = run_html_extract_bench(spark)

    result = {
        "metric": "headline_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _SF,
        "cpus": CPUS,
        "kg_pages": N_PAGES_KG,
        "kg_triples": n_triples,
        "triples_per_sec": triples_per_sec,
        "kg_runs_sec": kg_runs,
        "pages_gen_sec": round(gen_sec, 3),
        "skew": skew,
        "skew_join": skew_join,
        "html_extract": html_extract,
        "semdedup": semdedup,
    }

    # N -> 4N scaling evidence, EVERY run (the north rule's two-cluster-
    # size criterion, evidenced in this single-host sandbox by the SAME
    # job at two affinity-bound core counts on the same corpus — each
    # measurement is a fresh subprocess with CPU affinity bound to
    # exactly that many cores, so "N cores" accounts for JVM task threads
    # AND python UDF workers together).
    #
    # Two pairs are measured and ALL raw walls published:
    #   2 -> 8  (PRIMARY, the local[2]-vs-local[8] form BASELINE.md names
    #            for the N->4N criterion): below the single-socket memory-
    #            bandwidth/turbo ceiling, so raw efficiency is the honest
    #            analog of adding executor NODES (each node keeps its own
    #            memory bus).  Runs on the shared scaling corpus (8x, or
    #            16x under SPARK_GRAFT_SCALING) so the 2-core wall is
    #            ~2 min and the fixed per-job serial seconds vanish.
    #   8 -> 32 (supplementary): saturates the socket; reported raw AND
    #            normalized by a same-run Spark-free NumPy control that
    #            measures what THIS host can scale ANY identical
    #            arithmetic at between those occupancies.
    #
    # Robustness: this host shows sporadic straggler outliers and
    # occasional SUSTAINED slow episodes (a subprocess 2.4x slow for all
    # its runs while the other side was normal — see BENCH.md).  Each
    # pair therefore takes interleaved large/small invocations with
    # best-of walls per side, and re-measures the pair SYMMETRICALLY
    # whenever its efficiency lands outside a plausibility band — low
    # (slow-episode on the large side) or high (slow-episode on the
    # small side inflating the figure).
    scaling_mult = 16 if os.environ.get("SPARK_GRAFT_SCALING") else 8
    scaling_pages = N_PAGES * scaling_mult
    scaling_path = f"{PAGES_PATH}_scaling{scaling_mult}x"
    if not os.path.exists(os.path.join(scaling_path, "_SUCCESS")):
        from relation_extraction_transformer_spark.sources import (
            pages as PG,
        )

        PG.synthetic_pages(
            spark, scaling_pages, seed=42, partitions=CPUS * 4
        ).write.mode("overwrite").parquet(scaling_path)
    spark.stop()

    import subprocess
    import sys as _sys

    def measure(
        cores: int, path: str, warm_path: str | None = None
    ) -> tuple[list[float], int]:
        env = dict(os.environ)
        env["SPARK_GRAFT_KG_RUN"] = str(cores)
        env["SPARK_GRAFT_KG_PATH"] = path
        if warm_path:
            env["SPARK_GRAFT_KG_WARM"] = warm_path
        env.pop("SPARK_GRAFT_SCALING", None)
        out = subprocess.run(
            [_sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=3600,
            preexec_fn=lambda: os.sched_setaffinity(0, set(range(cores))),
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("KGRUN")][-1]
        _, walls, n = line.split()
        return [float(w) for w in walls.split(",")], int(n)

    def scaling_pair(
        c_small: int,
        c_large: int,
        path: str,
        pages: int,
        band: tuple[float, float],
        max_attempts: int = 3,
        warm_path: str | None = None,
    ) -> dict:
        """One ATTEMPT = large-side invocation, NumPy ceiling control,
        small-side invocation — all inside one ~4-minute host window, so
        the per-attempt efficiency and its matched-window ceiling see the
        same host regime (this vCPU host shows tens-of-minutes steal
        episodes that can sit on one core-count's measurements; a single
        interleaved pair cannot outlast them, but the matched control
        detects them).

        The recorded figure is the POOLED best-of-all-walls efficiency:
        min over every timed wall of one side, across all attempts,
        divided by the same for the other side.  Steal noise on this
        host is strictly additive (the job is deterministic), so the
        minimum over k draws is the tightest available estimate of the
        noise-free wall on each side — and unlike "best attempt by raw
        efficiency", the pooled estimator cannot be inflated by one
        steal-slowed small-core draw (a 1.03 'superlinear' record
        observed in practice: slow 2-core window + clean 8-core window
        in the SAME attempt).  Attempts repeat while the pooled value is
        outside the plausibility band (symmetric: a slow LARGE side
        under-reads, a slow SMALL side over-reads); every attempt's
        walls and matched-window NumPy ceiling are published.  The
        ceiling used for normalization is the cleanest (highest) control
        across attempts, capped at 1.0 — the best available estimate of
        the hardware's own scaling limit."""
        attempts = []
        n = 0
        all_small: list[float] = []
        all_large: list[float] = []
        pooled = 0.0
        for _ in range(max_attempts):
            # a failed invocation (host OOM-kill, steal-regime timeout)
            # must cost one attempt, not the round's entire BENCH record
            try:
                w_large, n = measure(c_large, path, warm_path)
                ceiling = numpy_ceiling_control(c_small, c_large)
                w_small, _ = measure(c_small, path, warm_path)
            except Exception as exc:  # noqa: BLE001
                attempts.append({"error": f"{type(exc).__name__}: {exc}"})
                continue
            all_large += w_large
            all_small += w_small
            eff = round(
                (min(w_small) / min(w_large)) / (c_large / c_small), 3
            )
            attempts.append(
                {
                    "raw_walls_large_sec": w_large,
                    "raw_walls_small_sec": w_small,
                    "efficiency": eff,
                    "numpy_host_ceiling": ceiling,
                    "efficiency_vs_host_ceiling": round(
                        eff / ceiling["efficiency"], 3
                    ),
                }
            )
            pooled = round(
                (min(all_small) / min(all_large)) / (c_large / c_small), 3
            )
            if band[0] <= pooled <= band[1]:
                break
        if not all_small or not all_large:
            return {
                "pages": pages,
                "cores_small": c_small,
                "cores_large": c_large,
                "attempts": attempts,
                "efficiency": None,
                "error": "every scaling attempt failed",
            }
        best_ceiling = min(
            1.0,
            max(
                a["numpy_host_ceiling"]["efficiency"]
                for a in attempts
                if "numpy_host_ceiling" in a
            ),
        )
        return {
            "pages": pages,
            "triples": n,
            "cores_small": c_small,
            "cores_large": c_large,
            "attempts": attempts,
            "triples_per_sec_small": round(n / min(all_small), 1),
            "triples_per_sec_large": round(n / min(all_large), 1),
            "efficiency": pooled,
            "estimator": "pooled best-of-all-walls across attempts",
            "numpy_host_ceiling_best": best_ceiling,
            "efficiency_vs_host_ceiling": round(pooled / best_ceiling, 3),
        }

    # PRIMARY: local[2] -> local[8] on the LARGE (8x) corpus — at the
    # small sizes the per-job serial seconds (scan planning, python
    # worker spawn, ~2.3 s measured) Amdahl-dominate a 2-core run and
    # masquerade as poor scaling; on the big corpus they vanish, which
    # is the honest analog of the north rule's hour-long jobs at
    # 10^12-doc scale.  Warm-up uses the 1x corpus (JIT/worker-spawn is
    # what warming buys; a full-size warm run would triple the 2-core
    # invocation wall).  Plausibility band = the regime's clean-window
    # measurements (0.84-0.88 raw; see BENCH.md).
    pair_2_8 = scaling_pair(
        2, 8, scaling_path, scaling_pages, band=(0.8, 1.02),
        warm_path=PAGES_PATH,
    )
    # SUPPLEMENTARY: 8 -> 32 on the 8x corpus, raw + ceiling-normalized
    # (this range saturates the single socket, so the matched-window
    # NumPy ceiling carries the interpretation).
    pair_8_32 = scaling_pair(
        max(1, CPUS // 4), CPUS, scaling_path, scaling_pages,
        band=(0.5, 1.02), max_attempts=2,
    )

    # the in-record N->4N figure: raw 2->8 (BASELINE.md's named form)
    # plus its matched-window host-ceiling normalization; .get() so a
    # degraded pair (every attempt failed) still yields a record with
    # the error visible instead of crashing the whole bench
    result["scaling"] = {
        "efficiency": pair_2_8.get("efficiency"),
        "efficiency_vs_host_ceiling": pair_2_8.get(
            "efficiency_vs_host_ceiling"
        ),
        "cores_small": pair_2_8["cores_small"],
        "cores_large": pair_2_8["cores_large"],
        "triples_per_sec_small": pair_2_8.get("triples_per_sec_small"),
        "triples_per_sec_large": pair_2_8.get("triples_per_sec_large"),
        "pages": pair_2_8["pages"],
        "triples": pair_2_8.get("triples"),
        "pair_2_to_8": pair_2_8,
        "pair_8_to_32": pair_8_32,
    }

    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
