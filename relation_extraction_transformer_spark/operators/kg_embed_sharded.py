"""TransE training with SHARDED parameter state — the billion-entity
form operators/kg_embed.py's honesty note names as out of reach for its
broadcast-parameter design.

kg_embed.py broadcasts the full embedding table per step and applies the
optimizer on the driver: correct and fast while the table fits one
executor (~100M params), a hard wall past it.  Here the parameters ARE
DataFrames:

- ``ent``: (eid long, vec array<double>)   — one row per entity
- ``rel``: (rid long, vec array<double>)   — one row per relation

and one synchronous step is pure DataFrame algebra:

1. negative sampling per edge (the SAME md5-keyed pure function as the
   dense path — partition-independent by construction);
2. FOUR hash joins gather h/t/h'/t' entity vectors and one more the
   relation vector — at scale these joins are the design: edges and
   parameters co-partition on the id key, nothing is broadcast;
3. per-edge margin-ranking gradients as JVM array expressions
   (``zip_with``/``transform``/``aggregate`` — no Python in the loop);
4. gradient aggregation: contributions explode to (id, dim, g) rows,
   QUANTIZED to ``ROUND(g, 12)`` DECIMAL(38,12), and sum in one
   map-side-combinable groupBy — the fusion/unigram trick: decimal
   addition is associative-commutative, so the aggregate is BIT-EXACT
   under any partitioning (a double sum would be shuffle-order noise);
5. the SGD update + unit-ball projection are one join + array fold per
   parameter row (``F.aggregate`` folds arrays in fixed order, so the
   projection is deterministic too).

Cost shape per step: 5 hash joins on id keys + one groupBy over
(touched ids × dim) rows + one update join.  State per entity is one
row; optimizer state (momentum, Adagrad accumulators) shards the same
way as an extra vector column — this module implements plain SGD, the
reference form the parity gate checks against the dense path.

Exactness: quantizing per-edge contributions at 1e-12 before the sum
bounds the divergence from the dense float path at (#contributions x
0.5e-12) per coordinate — the parity test pins rtol 1e-9 against
``local_step`` and BIT-EXACT equality across repartitionings.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import kg_embed as KE

_QUANT = 12
_GDEC = f"decimal(38,{_QUANT})"


def params_to_frames(
    spark: SparkSession, params: dict, n_partitions: int = 8
) -> tuple[DataFrame, DataFrame]:
    """Dense init_params dict -> sharded (ent, rel) frames."""
    ent = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in
         enumerate(params["ent_emb"])],
        "eid long, vec array<double>",
    ).repartition(n_partitions, "eid")
    rel = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in
         enumerate(params["rel_emb"])],
        "rid long, vec array<double>",
    ).repartition(max(1, n_partitions // 4), "rid")
    return ent.localCheckpoint(eager=True), rel.localCheckpoint(eager=True)


def init_frames_distributed(
    ids: DataFrame, id_col: str, dim: int, seed: int = 13,
    project: bool = True,
) -> DataFrame:
    """Initialize embedding rows WITHOUT a driver-side table: each
    coordinate is a deterministic md5-derived uniform in
    [-6/√dim, 6/√dim] (the Bordes et al. init), computed as a JVM
    expression over the id frame — so a billion-entity bootstrap is one
    narrow map over the entity list, nothing materialized on the
    driver.  Deterministic and partition-independent (pure function of
    (id, coordinate, seed)); entity rows are unit-ball projected like
    the training constraint.  ``params_to_frames`` remains the
    dense-parity bootstrap for graphs small enough to compare against
    numpy init."""
    bound = 6.0 / float(dim) ** 0.5
    coord = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.col(id_col).cast("string"),
                            d.cast("string"),
                            F.lit(str(seed)),
                        )
                    ),
                    2, 13,
                ),
                16, 10,
            ).cast("double")
            / F.lit(float(1 << 52))  # 13 hex chars = 52 bits -> [0, 1)
            * F.lit(2.0 * bound)
            - F.lit(bound)
        ),
    )
    out = ids.select(F.col(id_col), coord.alias("vec"))
    if project:
        nrm = F.sqrt(_sq_norm(F.col("vec")))
        out = out.select(
            id_col,
            F.when(
                nrm > 1.0, F.transform("vec", lambda x: x / nrm)
            ).otherwise(F.col("vec")).alias("vec"),
        )
    return out.localCheckpoint(eager=True)


def frames_to_params(ent: DataFrame, rel: DataFrame) -> dict:
    """Collect sharded frames back to the dense dict (tests / graphs
    small enough for the broadcast path anyway)."""
    e = sorted((r.eid, r.vec) for r in ent.collect())
    r_ = sorted((r.rid, r.vec) for r in rel.collect())
    return {
        "ent_emb": np.array([v for _, v in e], dtype=np.float64),
        "rel_emb": np.array([v for _, v in r_], dtype=np.float64),
    }


def _with_negatives(id_edges: DataFrame, step: int, n_ent: int) -> DataFrame:
    """Append (hn, tn) — identical sampling to the dense path (same
    md5-keyed pure function, so dense and sharded steps see the same
    corruption under any partitioning)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            h, r, t, hn, tn = KE._batch_arrays(pdf, step, n_ent)
            yield pd.DataFrame(
                {"h": h, "r": r, "t": t, "hn": hn, "tn": tn}
            )

    return id_edges.mapInPandas(
        run, schema="h long, r long, t long, hn long, tn long"
    )


def _vsum(a, b):
    return F.zip_with(a, b, lambda x, y: x + y)


def _vsub(a, b):
    return F.zip_with(a, b, lambda x, y: x - y)


def _sq_norm(a):
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


def sharded_transe_step(
    ent: DataFrame,
    rel: DataFrame,
    id_edges: DataFrame,
    step: int,
    n_total: int,
    lr: float,
    margin: float = KE.MARGIN,
    n_ent: int | None = None,
) -> tuple[DataFrame, DataFrame, float]:
    """One synchronous plain-SGD TransE step over sharded state.
    Returns (ent', rel', mean_loss); the new frames are eagerly
    localCheckpoint-ed so plan depth stays constant across steps.
    Pass ``n_ent`` (the entity count, needed by negative sampling) to
    skip the per-step count job."""
    if n_ent is None:
        n_ent = ent.count()

    def evec(col):
        return ent.select(
            F.col("eid").alias(col), F.col("vec").alias(f"{col}_v")
        )

    edges = (
        _with_negatives(id_edges, step, n_ent)
        .join(evec("h"), "h")
        .join(evec("t"), "t")
        .join(evec("hn"), "hn")
        .join(evec("tn"), "tn")
        .join(
            rel.select(F.col("rid").alias("r"), F.col("vec").alias("r_v")),
            "r",
        )
    )
    pos = _vsub(_vsum(F.col("h_v"), F.col("r_v")), F.col("t_v"))
    neg = _vsub(_vsum(F.col("hn_v"), F.col("r_v")), F.col("tn_v"))
    scored = edges.select(
        "h", "r", "t", "hn", "tn",
        pos.alias("pos"), neg.alias("neg"),
        (F.lit(margin) + _sq_norm(pos) - _sq_norm(neg)).alias("viol"),
    )
    active = scored.filter(F.col("viol") > 0).localCheckpoint(eager=True)

    # mean loss, decimal-quantized so the distributed sum is exact
    loss_row = active.agg(
        F.sum(F.round(F.col("viol"), _QUANT).cast(_GDEC)).alias("s")
    ).collect()[0]
    loss_mean = float(loss_row.s or 0) / n_total

    gp = F.transform(F.col("pos"), lambda x: 2.0 * x)
    gn = F.transform(F.col("neg"), lambda x: -2.0 * x)
    neg_gp = F.transform(F.col("pos"), lambda x: -2.0 * x)
    neg_gn = F.transform(F.col("neg"), lambda x: 2.0 * x)
    gr = F.zip_with(gp, gn, lambda a, b: a + b)
    contrib = active.select(
        F.explode(
            F.array(
                F.struct(F.lit("e").alias("kind"),
                         F.col("h").alias("id"), gp.alias("g")),
                F.struct(F.lit("e").alias("kind"),
                         F.col("t").alias("id"), neg_gp.alias("g")),
                F.struct(F.lit("e").alias("kind"),
                         F.col("hn").alias("id"), gn.alias("g")),
                F.struct(F.lit("e").alias("kind"),
                         F.col("tn").alias("id"), neg_gn.alias("g")),
                F.struct(F.lit("r").alias("kind"),
                         F.col("r").alias("id"), gr.alias("g")),
            )
        ).alias("c")
    ).select("c.kind", "c.id", F.posexplode("c.g").alias("dim", "gval"))
    sums = (
        contrib.withColumn(
            "gq", F.round(F.col("gval"), _QUANT).cast(_GDEC)
        )
        .groupBy("kind", "id", "dim")
        .agg(F.sum("gq").alias("gsum"))
    )
    g_arr = (
        sums.groupBy("kind", "id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "gsum"))
            ).alias("s")
        )
        .select(
            "kind", "id",
            F.transform(
                "s", lambda st: st["gsum"].cast("double")
            ).alias("g"),
        )
    )
    scale = lr / n_total

    def _apply(frame, id_col, kind, project):
        g = g_arr.filter(F.col("kind") == kind).select(
            F.col("id").alias(id_col), "g"
        )
        upd = frame.join(g, id_col, "left").select(
            id_col,
            F.when(
                F.col("g").isNull(), F.col("vec")
            ).otherwise(
                F.zip_with(
                    "vec", "g", lambda v, x: v - F.lit(scale) * x
                )
            ).alias("vec"),
        )
        if project:
            nrm = F.sqrt(_sq_norm(F.col("vec")))
            upd = upd.select(
                id_col,
                F.when(
                    nrm > 1.0,
                    F.transform("vec", lambda x: x / nrm),
                ).otherwise(F.col("vec")).alias("vec"),
            )
        return upd.localCheckpoint(eager=True)

    ent_new = _apply(ent, "eid", "e", project=True)
    rel_new = _apply(rel, "rid", "r", project=False)
    active.unpersist()
    return ent_new, rel_new, loss_mean


def sharded_fit(
    edges: DataFrame,
    dim: int = 16,
    n_steps: int = 10,
    lr: float = 0.1,
    seed: int = 13,
    n_partitions: int = 8,
    distributed_init: bool = False,
) -> tuple[DataFrame, DataFrame, dict, dict, list[float]]:
    """Train TransE end-to-end with sharded state.  Returns
    (ent_frame, rel_frame, ent_ids, rel_ids, loss_curve).
    ``distributed_init=True`` bootstraps the embedding frames with
    :func:`init_frames_distributed` (no driver-sized table anywhere in
    the loop — the full billion-entity shape); the default numpy init
    matches the dense module for parity tests."""
    spark = edges.sparkSession
    ent_ids, rel_ids = KE.build_id_maps(edges)
    id_edges = KE.to_id_edges(edges, ent_ids, rel_ids).localCheckpoint(
        eager=True
    )
    n_total = id_edges.count()
    if distributed_init:
        ent = init_frames_distributed(
            spark.range(len(ent_ids)).select(F.col("id").alias("eid")),
            "eid", dim, seed=seed, project=True,
        )
        rel = init_frames_distributed(
            spark.range(len(rel_ids)).select(F.col("id").alias("rid")),
            "rid", dim, seed=seed + 1, project=False,
        )
    else:
        params = KE.init_params(len(ent_ids), len(rel_ids), dim, seed=seed)
        ent, rel = params_to_frames(spark, params, n_partitions)
    curve = []
    for step in range(n_steps):
        ent, rel, loss = sharded_transe_step(
            ent, rel, id_edges, step, n_total, lr,
            n_ent=len(ent_ids),
        )
        curve.append(loss)
    return ent, rel, ent_ids, rel_ids, curve
