"""Incremental KG edge-rollup state: the merge laws that make a 24/7
fold-in pipeline exact — merge==rebuild under any disjoint split,
commutativity/associativity, idempotent sketch state — plus per-edge
distinct-url estimate accuracy in the linear-counting regime."""

import pytest
from pyspark.sql import functions as F

from relation_extraction_transformer_spark.operators import incremental as INC


def _obs_df(spark, n_edges=12, n_urls=40):
    """Synthetic observations: each (subj, pred, obj) edge observed from
    a deterministic subset of urls at spread-out timestamps."""
    rows = []
    for i in range(n_edges):
        edge = (f"s{i % 5}", f"p{i % 3}", f"o{i}")
        for j in range(1 + (i * 7) % 9):
            u = (i * 13 + j * 5) % n_urls
            rows.append(
                (*edge, f"https://h{u % 7}.example/{u}",
                 round(0.5 + ((i + j) % 50) / 100, 2),
                 1_700_000_000 + i * 3600 + j * 60)
            )
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, url string, "
        "prob double, ts long"
    )


def _report_rows(state):
    return sorted(map(tuple, INC.edge_report(state).collect()))


def _rebuilt(obs):
    return _report_rows(INC.edge_state(obs))


@pytest.mark.parametrize("split_col,mod", [("ts", 2), ("url", 3)])
def test_merge_equals_rebuild_for_any_disjoint_split(spark, split_col, mod):
    """state(d1) ⊕ ... ⊕ state(dk) == state(d1 ∪ ... ∪ dk), exactly,
    for splits keyed on different columns and k = 2 and 3."""
    obs = _obs_df(spark)
    full = _rebuilt(obs)
    parts = [
        INC.edge_state(obs.where(F.crc32(F.col(split_col).cast("string")) % mod == i))
        for i in range(mod)
    ]
    merged = parts[0]
    for p in parts[1:]:
        merged = INC.merge_edge_state(merged, p)
    assert _report_rows(merged) == full


def test_merge_is_commutative_and_associative(spark):
    obs = _obs_df(spark)
    pred = F.crc32(F.col("url")) % 3
    a, b, c = (INC.edge_state(obs.where(pred == i)) for i in range(3))
    ab_c = INC.merge_edge_state(INC.merge_edge_state(a, b), c)
    c_ba = INC.merge_edge_state(c, INC.merge_edge_state(b, a))
    assert _report_rows(ab_c) == _report_rows(c_ba)


def test_redelivered_delta_is_idempotent_except_sums(spark):
    """Folding the same delta twice must not move first/last_seen,
    max_prob, or any url register (max is idempotent); only the two sums
    over what are contractually disjoint deltas — n_obs and the fused
    score — double-count, and they double EXACTLY (DECIMAL sums)."""
    obs = _obs_df(spark)
    once = INC.edge_state(obs)
    twice = INC.merge_edge_state(once, INC.edge_state(obs))
    # report tuple: (*keys, n_obs, first, last, max_prob, fused, est)
    r1 = {t[:3]: t[3:] for t in _report_rows(once)}
    r2 = {t[:3]: t[3:] for t in _report_rows(twice)}
    assert r1.keys() == r2.keys()
    for k in r1:
        (n1, f1, l1, m1, s1, e1) = r1[k]
        (n2, f2, l2, m2, s2, e2) = r2[k]
        assert n2 == 2 * n1 and s2 == 2 * s1
        assert (f1, l1, m1, e1) == (f2, l2, m2, e2)
    regs_once = sorted(map(tuple, once.regs.collect()))
    regs_twice = sorted(map(tuple, twice.regs.collect()))
    assert regs_once == regs_twice


def test_est_urls_tracks_exact_distinct_in_lc_regime(spark):
    """Per-edge url counts are far below the 1024 registers, so the
    linear-counting estimate should sit within 5% (or 0.5 absolute) of
    the exact per-edge COUNT(DISTINCT url)."""
    obs = _obs_df(spark, n_edges=12, n_urls=40)
    report = {t[:3]: t[-1] for t in _rebuilt(obs)}
    exact = {
        (r.subj, r.pred, r.obj): r.d
        for r in obs.groupBy("subj", "pred", "obj")
        .agg(F.countDistinct("url").alias("d"))
        .collect()
    }
    assert report.keys() == exact.keys()
    for k, est in report.items():
        assert abs(est - exact[k]) <= max(0.5, 0.05 * exact[k]), (
            k, est, exact[k]
        )


def test_register_state_is_bounded_and_partition_invariant(spark):
    """Register rows per edge never exceed min(distinct urls, 1024), and
    the state frames are identical under repartitioning of the input."""
    obs = _obs_df(spark)
    st = INC.edge_state(obs)
    sizes = {
        (r.subj, r.pred, r.obj): r.n
        for r in st.regs.groupBy("subj", "pred", "obj")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    exact = {
        (r.subj, r.pred, r.obj): r.d
        for r in obs.groupBy("subj", "pred", "obj")
        .agg(F.countDistinct("url").alias("d"))
        .collect()
    }
    for k, n in sizes.items():
        assert n <= min(exact[k], 1024)
    st7 = INC.edge_state(obs.repartition(7))
    assert sorted(map(tuple, st7.regs.collect())) == sorted(
        map(tuple, st.regs.collect())
    )
    assert _report_rows(st7) == _report_rows(st)


def test_state_persists_and_folds_after_reload(spark, tmp_path):
    """The 24/7 loop: fold delta 0, persist to parquet, reload in a
    'later job', fold delta 1 into the reloaded state — report must
    equal the full rebuild exactly (merge==rebuild survives the disk
    round-trip, schema intact)."""
    obs = _obs_df(spark)
    d0 = obs.where(F.crc32(F.col("url")) % 2 == 0)
    d1 = obs.where(F.crc32(F.col("url")) % 2 == 1)
    INC.write_edge_state(INC.edge_state(d0), str(tmp_path / "state"))
    loaded = INC.read_edge_state(spark, str(tmp_path / "state"))
    # parquet round-trips relax nullability; names + types must survive
    fresh = INC.edge_state(d0)
    for got, want in ((loaded.stats, fresh.stats), (loaded.regs, fresh.regs)):
        assert [(f.name, f.dataType) for f in got.schema] == [
            (f.name, f.dataType) for f in want.schema
        ]
    merged = INC.merge_edge_state(loaded, INC.edge_state(d1))
    assert _report_rows(merged) == _rebuilt(obs)
