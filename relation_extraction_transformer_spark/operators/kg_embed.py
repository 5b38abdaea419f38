"""TransE knowledge-graph embeddings, trained with distributed
synchronous gradients over the extracted edge list.

The reference pipeline stops at (subj, pred, obj) triples; this operator
closes the kg_construct loop by learning the Bordes et al. 2013 TransE
model — ``E[h] + R[r] ~ E[t]`` — over them, which is what powers the
link-prediction / KG-completion ranking downstream of construction (the
exact task kg_link_prediction's common-neighbor heuristic approximates
without training).

Training shape (same as operators/train.py, the repo's one distributed-
training pattern): parameters broadcast per step; each partition runs
ONE vectorized NumPy pass over its edges inside ``mapInPandas`` and
emits a single (n, loss_sum, sparse-grad blob) row; the driver sums
partition gradients (scatter-add on the embedding rows each partition
actually touched — a partition's blob is O(touched rows), never the full
table), applies an optimizer from optim.py, then re-projects entity
embeddings onto the unit ball (the TransE norm constraint).

Determinism / distribution invariants:

- negative sampling is keyed on md5(h|r|t|step) — a pure function of
  the triple and the step, so the corrupted sample is identical under
  ANY partitioning of the edges (tests pin distributed == local at
  rtol 1e-12);
- loss is the UN-normalized margin-ranking sum per partition; the
  driver divides by the global count, so fp summation order is the only
  distributed/local difference.

100-TB honesty: broadcast-params + driver-side optimizer is the
synchronous data-parallel shape and holds while the embedding table fits
an executor (~100M params in fp64 = 800 MB — a few million entities at
dim 64).  A billion-entity KG needs sharded parameter state (each
embedding partition co-located with the edges that touch it); that is a
parameter-server architecture Spark does not provide natively, and the
local-SGD variant in operators/train.py is the nearest in-repo step
toward it.  Distance is SQUARED L2 (smooth everywhere, so the
finite-difference gradient gate applies cleanly).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from .. import optim as OPT
from .. import weights as W

_OUT_SCHEMA = "n long, loss_sum double, blob binary"

MARGIN = 1.0


def build_id_maps(edges: DataFrame) -> tuple[dict, dict]:
    """entity -> id and relation -> id, contiguous, sorted for
    determinism.  Driver-side dicts — the same vocabulary-sized choice
    operators/vocab.py makes; the id spaces are metadata next to the
    edge list they index."""
    ents = sorted(
        r[0]
        for r in edges.select("src").union(edges.select("dst"))
        .distinct().collect()
    )
    rels = sorted(r[0] for r in edges.select("rel").distinct().collect())
    return {e: i for i, e in enumerate(ents)}, {r: i for i, r in enumerate(rels)}


def init_params(n_ent: int, n_rel: int, dim: int, seed: int = 13) -> dict:
    """Uniform(-6/sqrt(d), 6/sqrt(d)) init per the TransE paper;
    relations L2-normalized once, entities projected every step."""
    rng = np.random.default_rng(seed)
    b = 6.0 / np.sqrt(dim)
    ent = rng.uniform(-b, b, size=(n_ent, dim))
    rel = rng.uniform(-b, b, size=(n_rel, dim))
    rel /= np.linalg.norm(rel, axis=1, keepdims=True)
    return {"ent_emb": ent, "rel_emb": rel}


def _neg_entity(h: int, r: int, t: int, step: int, n_ent: int) -> tuple[int, bool]:
    """Deterministic corruption: md5 of the triple + step picks the
    replacement entity and whether head or tail is corrupted.  Pure
    function of content — partition-independent by construction."""
    dig = hashlib.md5(f"{h}|{r}|{t}|{step}".encode()).digest()
    corrupt_head = dig[0] & 1 == 1
    repl = int.from_bytes(dig[1:9], "big") % n_ent
    return repl, corrupt_head


def _batch_arrays(pdf: pd.DataFrame, step: int, n_ent: int):
    h = pdf["h"].to_numpy(np.int64)
    r = pdf["r"].to_numpy(np.int64)
    t = pdf["t"].to_numpy(np.int64)
    repl = np.empty_like(h)
    chead = np.empty(len(h), dtype=bool)
    for i in range(len(h)):
        repl[i], chead[i] = _neg_entity(h[i], r[i], t[i], step, n_ent)
    hn = np.where(chead, repl, h)
    tn = np.where(chead, t, repl)
    return h, r, t, hn, tn


def loss_and_grads(
    h, r, t, hn, tn, ent: np.ndarray, rel: np.ndarray, margin: float = MARGIN
):
    """Margin-ranking loss SUM over the batch + sparse gradients.

    L_i = max(0, margin + ||E[h]+R[r]-E[t]||^2 - ||E[h']+R[r]-E[t']||^2)

    Returns (loss_sum, ent_rows, ent_grads, rel_rows, rel_grads) with
    the row gradients already combined per distinct index (np.add.at)."""
    pos = ent[h] + rel[r] - ent[t]
    neg = ent[hn] + rel[r] - ent[tn]
    d_pos = (pos * pos).sum(axis=1)
    d_neg = (neg * neg).sum(axis=1)
    viol = margin + d_pos - d_neg
    active = viol > 0
    loss_sum = float(viol[active].sum())
    gp = 2.0 * pos[active]          # dL/d(pos diff)
    gn = -2.0 * neg[active]         # dL/d(neg diff)
    ent_grad = np.zeros_like(ent)
    rel_grad = np.zeros_like(rel)
    np.add.at(ent_grad, h[active], gp)
    np.add.at(ent_grad, t[active], -gp)
    np.add.at(ent_grad, hn[active], gn)
    np.add.at(ent_grad, tn[active], -gn)
    np.add.at(rel_grad, r[active], gp + gn)
    e_rows = np.nonzero(np.abs(ent_grad).sum(axis=1))[0]
    r_rows = np.nonzero(np.abs(rel_grad).sum(axis=1))[0]
    return loss_sum, e_rows, ent_grad[e_rows], r_rows, rel_grad[r_rows]


def gradient_rows(id_edges: DataFrame, params_bc, step: int) -> DataFrame:
    """(h, r, t) id-edges -> one sparse-gradient row per partition."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p = params_bc.value
        ent, rel = p["ent_emb"], p["rel_emb"]
        n_ent = ent.shape[0]
        eg: dict[int, np.ndarray] = {}
        rg: dict[int, np.ndarray] = {}
        n = 0
        loss_sum = 0.0
        for pdf in batches:
            if not len(pdf):
                continue
            h, r, t, hn, tn = _batch_arrays(pdf, step, n_ent)
            ls, er, ev, rr, rv = loss_and_grads(h, r, t, hn, tn, ent, rel)
            loss_sum += ls
            n += len(pdf)
            for i, row in enumerate(er):
                acc = eg.get(row)
                eg[row] = ev[i].copy() if acc is None else acc + ev[i]
            for i, row in enumerate(rr):
                acc = rg.get(row)
                rg[row] = rv[i].copy() if acc is None else acc + rv[i]
        if n == 0:
            return
        blob = W.to_bytes_fast(
            {
                "__e_rows__": np.array(sorted(eg), dtype=np.int64),
                "__e_vals__": np.stack([eg[k] for k in sorted(eg)])
                if eg else np.zeros((0, rel.shape[1])),
                "__r_rows__": np.array(sorted(rg), dtype=np.int64),
                "__r_vals__": np.stack([rg[k] for k in sorted(rg)])
                if rg else np.zeros((0, rel.shape[1])),
            }
        )
        yield pd.DataFrame(
            {"n": [n], "loss_sum": [loss_sum], "blob": [blob]}
        )

    return id_edges.mapInPandas(run, schema=_OUT_SCHEMA)


def _project_entities(params: dict) -> None:
    """TransE constraint: entity embeddings live on/inside the unit
    sphere; re-project rows whose norm exceeds 1 after the update."""
    ent = params["ent_emb"]
    norms = np.linalg.norm(ent, axis=1, keepdims=True)
    np.divide(ent, norms, out=ent, where=norms > 1.0)


def transe_step(
    id_edges: DataFrame,
    params: dict,
    optimizer: OPT.Optimizer,
    step: int,
    n_total: int,
) -> float:
    """One synchronous distributed update.  Mutates ``params``;
    returns the mean margin-ranking loss."""
    spark = id_edges.sparkSession
    params_bc = spark.sparkContext.broadcast(params)
    try:
        rows = gradient_rows(id_edges, params_bc, step).collect()
    finally:
        params_bc.unpersist()
    if not rows:
        raise ValueError("transe_step: empty edge input")
    ent_grad = np.zeros_like(params["ent_emb"])
    rel_grad = np.zeros_like(params["rel_emb"])
    loss_sum = 0.0
    for row in rows:
        loss_sum += row.loss_sum
        blob = W.from_bytes(bytes(row.blob))
        np.add.at(ent_grad, blob["__e_rows__"].astype(np.int64), blob["__e_vals__"])
        np.add.at(rel_grad, blob["__r_rows__"].astype(np.int64), blob["__r_vals__"])
    grads = {
        "ent_emb": ent_grad / n_total,
        "rel_emb": rel_grad / n_total,
    }
    optimizer.step(params, grads)
    _project_entities(params)
    return loss_sum / n_total


def local_step(
    edges: list[tuple[int, int, int]],
    params: dict,
    optimizer: OPT.Optimizer,
    step: int,
) -> float:
    """Single-process oracle of :func:`transe_step` — same math, no
    Spark; the distributed==local parity gate runs both."""
    h = np.array([e[0] for e in edges], dtype=np.int64)
    r = np.array([e[1] for e in edges], dtype=np.int64)
    t = np.array([e[2] for e in edges], dtype=np.int64)
    n_ent = params["ent_emb"].shape[0]
    repl = np.empty_like(h)
    chead = np.empty(len(h), dtype=bool)
    for i in range(len(h)):
        repl[i], chead[i] = _neg_entity(h[i], r[i], t[i], step, n_ent)
    hn = np.where(chead, repl, h)
    tn = np.where(chead, t, repl)
    ls, er, ev, rr, rv = loss_and_grads(
        h, r, t, hn, tn, params["ent_emb"], params["rel_emb"]
    )
    ent_grad = np.zeros_like(params["ent_emb"])
    rel_grad = np.zeros_like(params["rel_emb"])
    ent_grad[er] = ev
    rel_grad[rr] = rv
    grads = {"ent_emb": ent_grad / len(h), "rel_emb": rel_grad / len(h)}
    optimizer.step(params, grads)
    _project_entities(params)
    return ls / len(h)


def fit(
    edges: DataFrame,
    dim: int = 16,
    n_steps: int = 10,
    lr: float = 0.1,
    seed: int = 13,
    optimizer_name: str = "sgd",
) -> tuple[dict, dict, dict, list[float]]:
    """Train TransE over an (src, rel, dst) edge DataFrame.

    Returns (params, ent_ids, rel_ids, loss_curve).  The id-mapped edge
    frame is built once (two broadcast-joinable dict lookups via a
    mapInPandas projection) and cached across steps."""
    ent_ids, rel_ids = build_id_maps(edges)
    spark = edges.sparkSession
    e_bc = spark.sparkContext.broadcast(ent_ids)
    r_bc = spark.sparkContext.broadcast(rel_ids)

    def to_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        em, rm = e_bc.value, r_bc.value
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "h": pdf["src"].map(em).astype("int64"),
                    "r": pdf["rel"].map(rm).astype("int64"),
                    "t": pdf["dst"].map(em).astype("int64"),
                }
            )

    id_edges = edges.select("src", "rel", "dst").mapInPandas(
        to_ids, schema="h long, r long, t long"
    ).persist()
    n_total = id_edges.count()
    params = init_params(len(ent_ids), len(rel_ids), dim, seed=seed)
    opt = OPT.get_optimizer(optimizer_name, lr=lr)
    curve = [
        transe_step(id_edges, params, opt, step, n_total)
        for step in range(n_steps)
    ]
    id_edges.unpersist()
    e_bc.unpersist()
    r_bc.unpersist()
    return params, ent_ids, rel_ids, curve
