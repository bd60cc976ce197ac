"""Distributed triple evaluation: micro P/R/F1 (reference A4 semantics).

The reference computes micro precision/recall/F1 by exact-match containment
of predicted triples in the gold list per sentence, summing pre/true/cor
counts across the epoch (reference lit_models/transformer.py:183-215).
Here both sides are DataFrames keyed by (conv_id, turn_idx, subj, pred,
obj); the counts reduce in ONE shuffle via a full outer join on distinct
keys (the reference's containment check is set semantics — duplicates on
either side count once, matching its `if pred in gold` loop over a list
scanned once per unique element).

`per_predicate_prf` is the A6 analogue: the same counts grouped by
predicate, for per-relation quality monitoring at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KEY = ["conv_id", "turn_idx", "subj", "pred", "obj"]


def _flagged(predicted: DataFrame, gold: DataFrame) -> DataFrame:
    p = predicted.select(*_KEY).distinct().withColumn("p", F.lit(1))
    g = gold.select(*_KEY).distinct().withColumn("g", F.lit(1))
    return p.join(g, _KEY, "full").na.fill(0, ["p", "g"])


def micro_prf(predicted: DataFrame, gold: DataFrame) -> dict:
    """Micro P/R/F1 over exact (conv, turn, subj, pred, obj) matches."""
    row = (
        _flagged(predicted, gold)
        .agg(
            F.sum("p").alias("pre_cnt"),
            F.sum("g").alias("true_cnt"),
            F.sum(F.col("p") * F.col("g")).alias("cor_cnt"),
        )
        .collect()[0]
    )
    pre, tru, cor = int(row.pre_cnt or 0), int(row.true_cnt or 0), int(row.cor_cnt or 0)
    p = cor / pre if pre else 0.0
    r = cor / tru if tru else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"pre_cnt": pre, "true_cnt": tru, "cor_cnt": cor,
            "precision": p, "recall": r, "f1": f1}


def per_predicate_prf(predicted: DataFrame, gold: DataFrame) -> DataFrame:
    """Per-predicate counts + P/R/F1 as a DataFrame (A6 analogue)."""
    counts = (
        _flagged(predicted, gold)
        .groupBy("pred")
        .agg(
            F.sum("p").cast("long").alias("pre_cnt"),
            F.sum("g").cast("long").alias("true_cnt"),
            F.sum(F.col("p") * F.col("g")).cast("long").alias("cor_cnt"),
        )
    )
    p = F.when(F.col("pre_cnt") > 0, F.col("cor_cnt") / F.col("pre_cnt")).otherwise(0.0)
    r = F.when(F.col("true_cnt") > 0, F.col("cor_cnt") / F.col("true_cnt")).otherwise(0.0)
    return (
        counts.withColumn("precision", p)
        .withColumn("recall", r)
        .withColumn(
            "f1",
            F.when(
                (F.col("precision") + F.col("recall")) > 0,
                2 * F.col("precision") * F.col("recall")
                / (F.col("precision") + F.col("recall")),
            ).otherwise(0.0),
        )
    )
