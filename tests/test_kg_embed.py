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
