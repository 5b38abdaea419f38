"""TransE KG-embedding tests: finite-difference gradient gate,
distributed==local parity under arbitrary partitioning, training
convergence, and link-prediction ranking sanity."""

import numpy as np
import pytest

from relation_extraction_transformer_spark import optim as OPT
from relation_extraction_transformer_spark.operators import kg_embed as KE


def _toy_batch(seed=7, n=40, n_ent=12, n_rel=3, dim=5):
    rng = np.random.default_rng(seed)
    h = rng.integers(0, n_ent, n)
    r = rng.integers(0, n_rel, n)
    t = rng.integers(0, n_ent, n)
    hn = rng.integers(0, n_ent, n)
    tn = rng.integers(0, n_ent, n)
    ent = rng.normal(0, 0.5, (n_ent, dim))
    rel = rng.normal(0, 0.5, (n_rel, dim))
    return h, r, t, hn, tn, ent, rel


def test_gradients_match_finite_differences():
    h, r, t, hn, tn, ent, rel = _toy_batch()

    def loss(e, rl):
        pos = e[h] + rl[r] - e[t]
        neg = e[hn] + rl[r] - e[tn]
        v = KE.MARGIN + (pos * pos).sum(1) - (neg * neg).sum(1)
        return float(v[v > 0].sum())

    _, er, ev, rr, rv = KE.loss_and_grads(h, r, t, hn, tn, ent, rel)
    eg = np.zeros_like(ent)
    eg[er] = ev
    rg = np.zeros_like(rel)
    rg[rr] = rv
    eps = 1e-6
    rng = np.random.default_rng(3)
    for _ in range(20):
        i, j = rng.integers(0, ent.shape[0]), rng.integers(0, ent.shape[1])
        ep = ent.copy(); ep[i, j] += eps
        em = ent.copy(); em[i, j] -= eps
        fd = (loss(ep, rel) - loss(em, rel)) / (2 * eps)
        assert abs(fd - eg[i, j]) < 1e-5, (i, j, fd, eg[i, j])
    for _ in range(10):
        i, j = rng.integers(0, rel.shape[0]), rng.integers(0, rel.shape[1])
        rp = rel.copy(); rp[i, j] += eps
        rm = rel.copy(); rm[i, j] -= eps
        fd = (loss(ent, rp) - loss(ent, rm)) / (2 * eps)
        assert abs(fd - rg[i, j]) < 1e-5, (i, j, fd, rg[i, j])


def _edges_df(spark, triples):
    return spark.createDataFrame(
        triples, "src: string, rel: string, dst: string"
    )


_TRIPLES = [
    (f"e{i}", f"r{i % 3}", f"e{(i * 7 + 2) % 15}") for i in range(60)
]


@pytest.mark.parametrize("n_parts", [1, 5])
def test_distributed_step_equals_local(spark, n_parts):
    """transe_step over n partitions == the single-process oracle at
    rtol 1e-12, for several consecutive steps (optimizer state carried).
    Partition count must not matter: negatives are content-keyed."""
    edges = _edges_df(spark, _TRIPLES).repartition(n_parts)
    ent_ids, rel_ids = KE.build_id_maps(edges)
    id_triples = [
        (ent_ids[s], rel_ids[r], ent_ids[d]) for s, r, d in _TRIPLES
    ]
    id_edges = spark.createDataFrame(
        id_triples, "h: long, r: long, t: long"
    ).repartition(n_parts)

    p_dist = KE.init_params(len(ent_ids), len(rel_ids), dim=8)
    p_loc = {k: v.copy() for k, v in p_dist.items()}
    opt_d = OPT.get_optimizer("sgd", lr=0.05)
    opt_l = OPT.get_optimizer("sgd", lr=0.05)
    for step in range(3):
        ld = KE.transe_step(id_edges, p_dist, opt_d, step, len(id_triples))
        ll = KE.local_step(id_triples, p_loc, opt_l, step)
        assert ld == pytest.approx(ll, rel=1e-12)
    for k in p_dist:
        np.testing.assert_allclose(p_dist[k], p_loc[k], rtol=1e-12)


def test_fit_loss_decreases_and_ranks_true_tails(spark):
    """On a KG with planted structure the loss curve trends down and the
    trained model ranks the TRUE tail of held-in triples better than the
    median corrupted candidate (link-prediction sanity)."""
    edges = _edges_df(spark, _TRIPLES)
    params, ent_ids, rel_ids, curve = KE.fit(
        edges, dim=16, n_steps=12, lr=0.5, optimizer_name="sgd"
    )
    assert min(curve[-3:]) < curve[0]
    ent, rel = params["ent_emb"], params["rel_emb"]
    n_ent = ent.shape[0]
    ranks = []
    for s, r, d in _TRIPLES[:20]:
        h, rr, t = ent_ids[s], rel_ids[r], ent_ids[d]
        pred = ent[h] + rel[rr]
        d_all = ((pred[None, :] - ent) ** 2).sum(1)
        ranks.append(int((d_all < d_all[t]).sum()) + 1)
    assert np.mean(ranks) < 0.5 * n_ent, np.mean(ranks)


def test_fit_deterministic_across_runs(spark):
    edges = _edges_df(spark, _TRIPLES)
    _, _, _, c1 = KE.fit(edges, dim=8, n_steps=3, lr=0.1)
    _, _, _, c2 = KE.fit(edges.repartition(7), dim=8, n_steps=3, lr=0.1)
    assert c1 == pytest.approx(c2, rel=1e-12)


# ---------------------------------------------------------------------------
# Link-prediction ranking (MRR / Hits@k, raw + filtered)
# ---------------------------------------------------------------------------


def _rank_oracle(id_triples, ent, rel, kt, kh):
    """Independent per-triple loop: full squared distances (keeping the
    ||pred||^2 term rank_triples drops), strict-less rank, filtered by
    discounting known-true competitors."""
    rows = []
    for h, r, t in id_triples:
        for side in ("tail", "head"):
            pred = ent[h] + rel[r] if side == "tail" else ent[t] - rel[r]
            true = t if side == "tail" else h
            d = ((pred[None, :] - ent) ** 2).sum(1)
            raw = 1 + int((d < d[true]).sum())
            comp = kt.get((h, r)) if side == "tail" else kh.get((r, t))
            ahead = 0 if comp is None else int((d[comp] < d[true]).sum())
            rows.append((h, r, t, side, raw, raw - ahead))
    return sorted(rows)


def test_rank_triples_matches_bruteforce_oracle(spark):
    """Distributed ranks (both corruption sides, raw + filtered) equal
    the per-triple loop oracle exactly, and are invariant under
    repartitioning (no partition-dependent state)."""
    edges = _edges_df(spark, _TRIPLES)
    ent_ids, rel_ids = KE.build_id_maps(edges)
    params = KE.init_params(len(ent_ids), len(rel_ids), dim=6, seed=4)
    id_edges = KE.to_id_edges(edges, ent_ids, rel_ids)
    known = KE.build_known_maps(id_edges)
    expected = _rank_oracle(
        [tuple(r) for r in id_edges.collect()],
        params["ent_emb"], params["rel_emb"], *known,
    )
    got = sorted(map(tuple, KE.rank_triples(id_edges, params, known).collect()))
    assert got == expected
    got7 = sorted(
        map(
            tuple,
            KE.rank_triples(id_edges.repartition(7), params, known).collect(),
        )
    )
    assert got7 == expected


def test_distributed_filtered_ranking_equals_dict_path(spark):
    """rank_triples_filtered (join-side correction, no driver collect)
    must produce EXACTLY the dict-path ranks — raw and filtered, both
    sides — and be invariant under repartitioning of both the test and
    known edge frames."""
    edges = _edges_df(spark, _TRIPLES)
    ent_ids, rel_ids = KE.build_id_maps(edges)
    params = KE.init_params(len(ent_ids), len(rel_ids), dim=6, seed=4)
    id_edges = KE.to_id_edges(edges, ent_ids, rel_ids)
    known = KE.build_known_maps(id_edges)
    want = sorted(
        map(tuple, KE.rank_triples(id_edges, params, known).collect())
    )
    got = sorted(
        map(tuple, KE.rank_triples_filtered(id_edges, params).collect())
    )
    assert got == want
    got7 = sorted(
        map(
            tuple,
            KE.rank_triples_filtered(
                id_edges.repartition(7), params,
                known_edges=id_edges.repartition(3),
            ).collect(),
        )
    )
    assert got7 == want
    # end-to-end metric rows agree too
    m_dict = sorted(map(tuple, KE.evaluate_ranking(
        edges, params, ent_ids, rel_ids).collect()))
    m_dist = sorted(map(tuple, KE.evaluate_ranking(
        edges, params, ent_ids, rel_ids, distributed_filter=True
    ).collect()))
    assert m_dist == m_dict


def test_rank_triples_small_blocks_equal_one_block(spark):
    """The block_bytes memory bound must not change any rank: forcing
    one-row distance blocks reproduces the single-block result."""
    edges = _edges_df(spark, _TRIPLES[:20])
    ent_ids, rel_ids = KE.build_id_maps(edges)
    params = KE.init_params(len(ent_ids), len(rel_ids), dim=5, seed=9)
    id_edges = KE.to_id_edges(edges, ent_ids, rel_ids)
    known = KE.build_known_maps(id_edges)
    big = sorted(map(tuple, KE.rank_triples(id_edges, params, known).collect()))
    tiny = sorted(
        map(
            tuple,
            KE.rank_triples(id_edges, params, known, block_bytes=1).collect(),
        )
    )
    assert tiny == big


def test_filtered_rank_discounts_known_true_competitors(spark):
    """(a, r, b) and (a, r, c) both true with b scoring ahead of c:
    c's raw tail-rank counts b as an error (rank 2), the filtered rank
    does not (rank 1)."""
    edges = _edges_df(spark, [("a", "r", "b"), ("a", "r", "c")])
    ent_ids, rel_ids = KE.build_id_maps(edges)
    params = {
        "ent_emb": np.array([[0.0, 0.0], [10.0, 0.0], [11.0, 0.0]]),  # a, b, c
        "rel_emb": np.array([[10.0, 0.0]]),  # a+r lands on b; c next; a far
    }
    id_edges = KE.to_id_edges(edges, ent_ids, rel_ids)
    known = KE.build_known_maps(id_edges)
    rows = {
        (r.t, r.side): (r.rank_raw, r.rank_filtered)
        for r in KE.rank_triples(id_edges, params, known).collect()
    }
    c_id = ent_ids["c"]
    assert rows[(c_id, "tail")] == (2, 1)
    b_id = ent_ids["b"]
    assert rows[(b_id, "tail")] == (1, 1)


def test_perfect_embeddings_rank_one_everywhere(spark):
    """Chain KG whose embeddings satisfy E[t] = E[h] + R[r] exactly:
    every filtered rank is 1 on both sides, so MRR and Hits@1 are 1.0
    end to end through evaluate_ranking's metric aggregation."""
    chain = [(f"e{i}", "next", f"e{i + 1}") for i in range(5)]
    edges = _edges_df(spark, chain)
    ent_ids, rel_ids = KE.build_id_maps(edges)
    ent = np.array([[float(i), 0.0] for i in range(len(ent_ids))])
    params = {"ent_emb": ent, "rel_emb": np.array([[1.0, 0.0]])}
    metrics = {
        r.side: r
        for r in KE.evaluate_ranking(edges, params, ent_ids, rel_ids).collect()
    }
    for side in ("head", "tail"):
        m = metrics[side]
        assert m.n == 5
        assert m.mrr == 1.0 and m.hits1 == 1.0 and m.mean_rank == 1.0


def test_ranking_metrics_exact_values(spark):
    ranks = spark.createDataFrame(
        [(0, 0, 0, "tail", 1, 1), (0, 0, 1, "tail", 4, 2),
         (0, 0, 2, "tail", 20, 12)],
        "h long, r long, t long, side string, rank_raw long, rank_filtered long",
    )
    m = KE.ranking_metrics(ranks).collect()[0]
    assert m.n == 3
    assert m.mrr == pytest.approx(round((1 + 0.5 + 1 / 12) / 3, 6))
    assert m.hits1 == pytest.approx(round(1 / 3, 6))
    assert m.hits3 == pytest.approx(round(2 / 3, 6))
    assert m.hits10 == pytest.approx(round(2 / 3, 6))
    assert m.mean_rank == 5.0
    raw = KE.ranking_metrics(ranks, rank_col="rank_raw").collect()[0]
    assert raw.mean_rank == pytest.approx(round(25 / 3, 6))
