#!/usr/bin/env python
"""Vocabulary + embedding preparation — the engine's form of
ref:prepare_vocab.py.

A reference user runs ``python prepare_vocab.py dataset/tacred
dataset/vocab --glove_dir dataset/glove``; the equivalent here:

    PYTHONPATH=. python scripts/prepare_vocab.py \
        --data dataset/tacred/train.json [more.json ...] \
        --glove dataset/glove/glove.840B.300d.txt --dim 300 \
        --out /tmp/vocab_out [--min-freq 0]

- corpus token frequencies as one partial-aggregating groupBy (A1)
- threshold + frequency-ranked ids with a token tie-break so ids are
  partition-count independent (A2/O4; the reference relies on CPython
  sort stability)
- GloVe scan + vocab semi-join + embedding matrix with a deterministic
  per-token fallback vector (S2, J1/J2); OOV stats (A3)
- writes ``vocab.txt`` (one token per line, id order), ``embedding.npz``
  and ``stats.json``

Without --glove, every vector is the deterministic hash fallback (the
sandbox ships no GloVe file); with the real file the same code path
produces the reference's vocab/matrix shapes.
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", nargs="+", help="TACRED-format json file(s)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic examples instead of --data")
    ap.add_argument("--glove", help="GloVe text file (token v1 v2 ...)")
    ap.add_argument("--dim", type=int, default=300)
    ap.add_argument("--min-freq", type=int, default=0)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import numpy as np
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName("ret-prepare-vocab")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from relation_extraction_transformer_spark import constants as C
    from relation_extraction_transformer_spark.operators import vocab as V
    from relation_extraction_transformer_spark.sources import tacred as TJ

    os.makedirs(args.out, exist_ok=True)
    if args.synthetic:
        path = os.path.join(args.out, "synthetic_train.json")
        TJ.write_synthetic_tacred_json(path, n=args.synthetic, seed=7)
        args.data = [path]

    docs = None
    for p in args.data:
        ex = TJ.read_tacred_json(spark, p).select(
            F.concat_ws(" ", F.col("token")).alias("text")
        )
        docs = ex if docs is None else docs.unionByName(ex)

    counts = V.token_counts(docs)
    ranked = V.ranked_vocab(counts, threshold=args.min_freq).cache()

    if args.glove:
        glove = V.read_glove(spark, args.glove, args.dim)
    else:
        # empty GloVe -> every vector takes the deterministic fallback
        glove = spark.createDataFrame(
            [], "token string, vector array<double>"
        )
    emb = V.build_embedding_matrix(ranked, glove, args.dim)
    stats = V.oov_stats(ranked, glove).first().asDict()

    tokens = [r.token for r in ranked.orderBy("token_id").collect()]
    with open(os.path.join(args.out, "vocab.txt"), "w") as f:
        for t in list(C.VOCAB_PREFIX) + tokens:
            f.write(t + "\n")
    np.savez_compressed(os.path.join(args.out, "embedding.npz"), emb=emb)
    with open(os.path.join(args.out, "stats.json"), "w") as f:
        json.dump(
            {"vocab_size": len(C.VOCAB_PREFIX) + len(tokens),
             "dim": args.dim, **stats}, f,
        )
    print(
        f"vocab: {len(C.VOCAB_PREFIX) + len(tokens)} tokens, "
        f"embedding {emb.shape} -> {args.out}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
