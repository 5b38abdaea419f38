"""Training-side data operators (SURVEY O1, O2, P10).

Inference never uses these (the reference applies them only when
``evaluation=False``); they exist so a training-data pipeline built on
this engine has the same data-side surface as the reference's loader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import constants as C


def seeded_shuffle(df: DataFrame, seed: int, key_cols: list[str]) -> DataFrame:
    """O1 (ref:data/loader.py:53-56): deterministic global shuffle.

    ``rand(seed)`` is partition-layout dependent in Spark, so we order by a
    seeded HASH of the row key instead — same permutation on any cluster
    size (the distributed-correct form of the reference's seeded
    random.shuffle)."""
    return df.orderBy(
        F.xxhash64(F.concat_ws("\x1f", F.lit(str(seed)), *key_cols))
    )


def word_dropout(ids: F.Column, rate: float, seed: int, row_key: F.Column):
    """P10 (ref:data/loader.py:328-332): replace non-UNK ids with UNK_ID
    with probability ``rate``.

    Deterministic variant: the coin is a hash of (seed, row key, position,
    id) mapped to [0,1) — reproducible across retries/partitions, unlike
    per-element rand() (a retried task would otherwise redrop differently).
    """
    return F.transform(
        ids,
        lambda x, i: F.when(
            (x != C.UNK_ID)
            & (
                F.pmod(
                    F.xxhash64(F.lit(seed), row_key, i, x), F.lit(1_000_000)
                )
                < int(rate * 1_000_000)
            ),
            F.lit(C.UNK_ID),
        ).otherwise(x),
    )


def length_sorted(df: DataFrame, tokens_col: str = "masked_tokens",
                  partitions: int | None = None) -> DataFrame:
    """O2 (ref:data/loader.py:249-251,319-325): cluster rows by sentence
    length so each Arrow batch holds few distinct lengths (bigger
    same-length GEMM stacks in the inference UDF).  Correctness-neutral:
    results are batch-composition invariant; this only changes efficiency.
    """
    n = F.size(tokens_col)
    if partitions:
        return df.repartitionByRange(partitions, n)
    return df.sortWithinPartitions(n)


def word_dropout_tokens(tokens_col, rate: float, seed: int, row_key):
    """P10 over token STRINGS (pre-vocab form): replace non-UNK tokens by
    the UNK token with probability ``rate`` — equivalent to the reference's
    id-level dropout (ref:data/loader.py:328-332) because UNK_TOKEN maps to
    UNK_ID.  Same deterministic coin as :func:`word_dropout`, so a retried
    task redrops identically; the training loop passes seed=epoch to
    resample each epoch like the reference's per-epoch batch rebuild."""
    return F.transform(
        tokens_col,
        lambda x, i: F.when(
            (x != C.UNK_TOKEN)
            & (
                F.pmod(
                    F.xxhash64(F.lit(seed), row_key, i, x), F.lit(1_000_000)
                )
                < int(rate * 1_000_000)
            ),
            F.lit(C.UNK_TOKEN),
        ).otherwise(x),
    )
