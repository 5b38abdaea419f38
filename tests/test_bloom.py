"""Distributed Bloom filter (functions/bloom.py) properties."""

import pyspark.sql.functions as F

from relation_extraction_transformer_spark.functions import bloom as BL

M, K = 1 << 14, 5


def test_bloom_has_no_false_negatives(spark):
    """Every inserted key must test positive — the property the
    decontamination_bloom composition depends on for exactness."""
    keys = spark.range(2000).select(
        F.concat(F.lit("key-"), F.col("id").cast("string")).alias("g")
    )
    bitmap = BL.bloom_build(keys, "g", M, K)
    n_hit = keys.filter(
        BL.bloom_might_contain(F.col("g"), bitmap, M, K)
    ).count()
    assert n_hit == 2000


def test_bloom_false_positive_rate_within_theory(spark):
    """FPR on 20k disjoint probes stays within 3x the analytic
    (1 - e^{-kn/m})^k bound (n=2000, m=2^14, k=5 -> ~1.2%)."""
    import math

    keys = spark.range(2000).select(
        F.concat(F.lit("key-"), F.col("id").cast("string")).alias("g")
    )
    bitmap = BL.bloom_build(keys, "g", M, K)
    probes = spark.range(20_000).select(
        F.concat(F.lit("other-"), F.col("id").cast("string")).alias("g")
    )
    fp = probes.filter(
        BL.bloom_might_contain(F.col("g"), bitmap, M, K)
    ).count()
    bound = (1 - math.exp(-K * 2000 / M)) ** K
    assert fp / 20_000 <= 3 * bound, (fp, bound)


def test_bloom_probe_is_jvm_only(spark):
    """The membership test compiles to pure column arithmetic — no
    Python UDF, no shuffle added to a narrow scan."""
    keys = spark.range(100).select(F.col("id").cast("string").alias("g"))
    bitmap = BL.bloom_build(keys, "g", M, K)
    plan = (
        keys.filter(BL.bloom_might_contain(F.col("g"), bitmap, M, K))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan


def test_bloom_prefilter_composition_equals_exact_query(spark):
    """decontamination_bloom (bloom pre-filter + exact verify) returns
    exactly decontamination_overlap's rows, while the pre-filter passes
    a small fraction of the corpus gram stream."""
    from relation_extraction_transformer_spark.plans import sql_queries as Q

    sf = "/root/testdata/sf0.001"
    exact = Q.REGISTRY["decontamination_overlap"].spark(spark, sf)
    fast = Q.REGISTRY["decontamination_bloom"].spark(spark, sf)
    assert exact.exceptAll(fast).count() == 0
    assert fast.exceptAll(exact).count() == 0
