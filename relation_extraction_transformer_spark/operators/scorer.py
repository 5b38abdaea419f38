"""TACRED scorer as Spark aggregations (SURVEY A4-A6).

Exact semantics of ref:utils/scorer.py:22-118 with the null-class rules:

- gold == guess == no_relation       -> ignored entirely
- gold = NR, guess != NR             -> counts against guessed only
- gold != NR, guess = NR             -> counts against gold only
- both != NR                         -> guessed+gold, correct if equal
- per-relation precision = 1.0 when guessed == 0 (ref line 58-60)
- per-relation recall    = 0.0 when gold == 0    (ref line 61-63)
- per-relation rows iterate gold relations (ref line 49)

Order-independent (groupBy, not positional zip): the example key travels
with the prediction, replacing ref:utils/scorer.py:29-31's positional
alignment (J4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import constants as C

NR = C.NO_RELATION


def _f1(p, r):
    return F.when(p + r > 0, 2.0 * p * r / (p + r)).otherwise(F.lit(0.0))


def score_per_relation(pairs: DataFrame, gold_col: str = "gold",
                       pred_col: str = "guess") -> DataFrame:
    gold = F.col(gold_col)
    guess = F.col(pred_col)
    gold_c = (
        pairs.filter(gold != NR)
        .groupBy(gold.alias("relation"))
        .agg(
            F.count(F.lit(1)).alias("gold_cnt"),
            F.sum(
                F.when((guess == gold) & (guess != NR), 1).otherwise(0)
            ).cast("long").alias("correct_cnt"),
        )
    )
    guess_c = (
        pairs.filter(guess != NR)
        .groupBy(guess.alias("relation"))
        .agg(F.count(F.lit(1)).alias("guessed_cnt"))
    )
    j = gold_c.join(guess_c, "relation", "left").select(
        "relation",
        "correct_cnt",
        F.coalesce("guessed_cnt", F.lit(0)).cast("long").alias("guessed_cnt"),
        "gold_cnt",
    )
    prec = F.when(
        F.col("guessed_cnt") > 0,
        F.col("correct_cnt").cast("double") / F.col("guessed_cnt"),
    ).otherwise(F.lit(1.0))
    rec = F.when(
        F.col("gold_cnt") > 0,
        F.col("correct_cnt").cast("double") / F.col("gold_cnt"),
    ).otherwise(F.lit(0.0))
    return j.select(
        "relation", "correct_cnt", "guessed_cnt", "gold_cnt",
        prec.alias("prec"), rec.alias("recall"),
        _f1(prec, rec).alias("f1"),
    )


def score_micro(pairs: DataFrame, gold_col: str = "gold",
                pred_col: str = "guess") -> DataFrame:
    gold = F.col(gold_col)
    guess = F.col(pred_col)
    agg = pairs.agg(
        F.sum(F.when((gold != NR) & (guess == gold), 1).otherwise(0))
        .cast("long").alias("correct_cnt"),
        F.sum(F.when(guess != NR, 1).otherwise(0))
        .cast("long").alias("guessed_cnt"),
        F.sum(F.when(gold != NR, 1).otherwise(0))
        .cast("long").alias("gold_cnt"),
    )
    prec = F.when(
        F.col("guessed_cnt") > 0,
        F.col("correct_cnt").cast("double") / F.col("guessed_cnt"),
    ).otherwise(F.lit(1.0))
    rec = F.when(
        F.col("gold_cnt") > 0,
        F.col("correct_cnt").cast("double") / F.col("gold_cnt"),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "correct_cnt", "guessed_cnt", "gold_cnt",
        prec.alias("prec_micro"), rec.alias("recall_micro"),
        _f1(prec, rec).alias("f1_micro"),
    )
