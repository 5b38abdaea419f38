#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Extra keys report the north-rule throughput figure (triples/sec for the
flagship KG pipeline) and the parallelism used.  Run with
SPARK_GRAFT_SCALING=1 to ALSO run the KG job at 1/4 of the cores and
report scaling efficiency (the sandbox evidence for the N -> 4N
executor-scaling criterion; see BENCH.md).
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
]


def make_spark(cores: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"ret-spark-bench-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        # the synthetic page files are tiny; the default 128m split packs
        # them into exactly one task wave, so stragglers set the wall.
        # 2m splits give multiple waves (what real 128MB-file inputs get
        # naturally at scale)
        .config("spark.sql.files.maxPartitionBytes", "2m")
        .config("spark.sql.files.openCostInBytes", "64k")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


PAGES_PATH = f"/tmp/ret_bench_pages_sf{_SF}"


def ensure_pages(spark: SparkSession, n_pages: int) -> float:
    """Materialize the synthetic page corpus once (the fixture analog of
    the production Iceberg pages table).  Returns generation seconds
    (0.0 when cached)."""
    from relation_extraction_transformer_spark.sources import pages as PG

    marker = os.path.join(PAGES_PATH, "_SUCCESS")
    if os.path.exists(marker):
        return 0.0
    t0 = time.perf_counter()
    PG.synthetic_pages(spark, n_pages, seed=42, partitions=CPUS * 2).write.mode(
        "overwrite"
    ).parquet(PAGES_PATH)
    return time.perf_counter() - t0


def run_kg_pipeline(spark: SparkSession) -> tuple[float, int]:
    """Flagship pages-scan -> triples; returns (wall sec, n_triples).
    Reads the materialized parquet so the measured path is scan ->
    extract -> NER -> pairs -> inference (the 100 TB shape)."""
    from relation_extraction_transformer_spark.plans import pipeline as PL

    t0 = time.perf_counter()
    pages = spark.read.parquet(PAGES_PATH)
    n = PL.triples_plan(pages, spark, keep_probs=False).count()
    return time.perf_counter() - t0, n


def _kg_run_subprocess() -> None:
    """Hidden mode for the affinity-bound scaling measurement: run the KG
    job (warm + best-of-2) at the requested core count, print one line."""
    global PAGES_PATH
    cores = int(os.environ["SPARK_GRAFT_KG_RUN"])
    PAGES_PATH = os.environ["SPARK_GRAFT_KG_PATH"]
    spark = make_spark(cores)
    spark.sparkContext.setLogLevel("ERROR")
    run_kg_pipeline(spark)  # warm
    best = None
    n = 0
    for _ in range(2):
        sec, n = run_kg_pipeline(spark)
        best = sec if best is None else min(best, sec)
    spark.stop()
    print(f"KGRUN {best:.3f} {n}")


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

    for name in HEADLINE:
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    gen_sec = ensure_pages(spark, N_PAGES)
    run_kg_pipeline(spark)  # warm python workers/JIT once
    kg_sec, n_triples = run_kg_pipeline(spark)
    kg_sec = min(kg_sec, run_kg_pipeline(spark)[0])  # best-of-2: local-mode
    # wall variance on a shared host is ~±30%; min is the honest capacity
    # figure (same protocol as the scaling subprocess runs)
    timings["kg_triples"] = round(kg_sec, 3)
    triples_per_sec = round(n_triples / kg_sec, 1)

    skew = run_skew_bench(spark)

    result = {
        "metric": "headline_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _SF,
        "cpus": CPUS,
        "kg_pages": N_PAGES,
        "kg_triples": n_triples,
        "triples_per_sec": triples_per_sec,
        "pages_gen_sec": round(gen_sec, 3),
        "skew": skew,
    }

    if os.environ.get("SPARK_GRAFT_SCALING"):
        # N -> 4N scaling evidence: the SAME job at CPUS/4 and CPUS cores on
        # the SAME (4x larger) corpus.  Each measurement runs in a fresh
        # subprocess with its CPU affinity bound to exactly that many cores,
        # so "N cores" accounts for JVM task threads AND python UDF workers
        # together (local-mode would otherwise let a local[N] job borrow
        # idle cores for its python workers).  See BENCH.md for the
        # pure-NumPy hardware-ceiling control experiment.
        scaling_path = PAGES_PATH + "_scaling"
        if not os.path.exists(os.path.join(scaling_path, "_SUCCESS")):
            from relation_extraction_transformer_spark.sources import (
                pages as PG,
            )

            PG.synthetic_pages(
                spark, N_PAGES * 16, seed=42, partitions=CPUS * 4
            ).write.mode("overwrite").parquet(scaling_path)
        spark.stop()

        import subprocess
        import sys as _sys

        def measure(cores: int) -> tuple[float, int]:
            env = dict(os.environ)
            env["SPARK_GRAFT_KG_RUN"] = str(cores)
            env["SPARK_GRAFT_KG_PATH"] = scaling_path
            env.pop("SPARK_GRAFT_SCALING", None)
            out = subprocess.run(
                [_sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=3600,
                preexec_fn=lambda: os.sched_setaffinity(0, set(range(cores))),
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("KGRUN")][-1]
            _, sec, n = line.split()
            return float(sec), int(n)

        small = max(1, CPUS // 4)
        kg_sec_large, n_scaling = measure(CPUS)
        kg_sec_small, _ = measure(small)
        tps_small = n_scaling / kg_sec_small
        tps_large = n_scaling / kg_sec_large
        result["scaling"] = {
            "pages": N_PAGES * 16,
            "triples": n_scaling,
            "cores_small": small,
            "cores_large": CPUS,
            "triples_per_sec_small": round(tps_small, 1),
            "triples_per_sec_large": round(tps_large, 1),
            "efficiency": round(tps_large / tps_small / (CPUS / small), 3),
        }
    else:
        spark.stop()

    print(json.dumps(result))


if __name__ == "__main__":
    main()
