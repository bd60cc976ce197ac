"""Distributed triple evaluation: micro P/R/F1 (reference A4 semantics).

The reference computes micro precision/recall/F1 by exact-match containment
of predicted triples in the gold list per sentence, summing pre/true/cor
counts across the epoch (reference lit_models/transformer.py:192-215).
It counts WITH multiplicity: `pre += len(pre_triple)`, `true +=
len(true_triple)` (transformer.py:197-203), and `_cal`
(transformer.py:183-190) increments `cor` once per predicted item — so a
duplicated predicted triple whose key exists in gold contributes its full
multiplicity to both `pre` and `cor`. Replicated here in ONE shuffle: both
sides group to (key, count), a full outer join yields per-key (pc, gc),
then pre = Σpc, true = Σgc, cor = Σ pc·[gc > 0].

`per_predicate_prf` is the A6 analogue: the same counts grouped by
predicate, for per-relation quality monitoring at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KEY = ["conv_id", "turn_idx", "subj", "pred", "obj"]


def _flagged(predicted: DataFrame, gold: DataFrame) -> DataFrame:
    """Per-key multiplicity flags: p = predicted count, g = gold count,
    c = predicted count if the key exists in gold else 0 (the reference's
    once-per-predicted-duplicate `cor` accounting)."""
    p = predicted.groupBy(*_KEY).agg(F.count(F.lit(1)).alias("pc"))
    g = gold.groupBy(*_KEY).agg(F.count(F.lit(1)).alias("gc"))
    return (
        p.join(g, _KEY, "full")
        .na.fill(0, ["pc", "gc"])
        .select(
            *_KEY,
            F.col("pc").alias("p"),
            F.col("gc").alias("g"),
            F.when(F.col("gc") > 0, F.col("pc")).otherwise(F.lit(0)).alias("c"),
        )
    )


def micro_prf(predicted: DataFrame, gold: DataFrame) -> dict:
    """Micro P/R/F1 over exact (conv, turn, subj, pred, obj) matches,
    counted with multiplicity (reference transformer.py:197-203)."""
    row = (
        _flagged(predicted, gold)
        .agg(
            F.sum("p").alias("pre_cnt"),
            F.sum("g").alias("true_cnt"),
            F.sum("c").alias("cor_cnt"),
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
            F.sum("c").cast("long").alias("cor_cnt"),
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


def pairwise_clustering_prf(assignments: DataFrame) -> DataFrame:
    """Pairwise precision/recall/F1 of a clustering against gold clusters —
    the standard entity-resolution quality metric for the linking stage.

    `assignments`: one row per item with (item, pred_label, gold_label).
    A pair of items counts as predicted-linked when they share pred_label,
    truly-linked when they share gold_label.

    Computed from the (pred_label, gold_label) contingency table via
    n-choose-2 sums — three groupBy aggregations, NO pair enumeration, so
    the evaluation scales to any cluster size (a 10M-mention component
    contributes one count row, not 10^13 pairs). Returns one row:
    (pred_pairs, gold_pairs, both_pairs, precision, recall, f1).
    """
    c2 = lambda col: (F.col(col) * (F.col(col) - 1) / 2).cast("long")  # noqa: E731
    # coalesce: on empty input each sum is NULL, and the counts must be 0
    # (the rate columns already degrade to 0.0 through their guards)
    pair_sum = lambda alias: F.coalesce(F.sum(c2("n")), F.lit(0).cast("long")).alias(alias)  # noqa: E731
    cont = assignments.groupBy("pred_label", "gold_label").agg(
        F.count(F.lit(1)).alias("n")
    )
    both = cont.agg(pair_sum("both_pairs"))
    pred = (
        assignments.groupBy("pred_label")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(pair_sum("pred_pairs"))
    )
    gold = (
        assignments.groupBy("gold_label")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(pair_sum("gold_pairs"))
    )
    out = pred.crossJoin(gold).crossJoin(both)
    p = F.when(F.col("pred_pairs") > 0, F.col("both_pairs") / F.col("pred_pairs")).otherwise(0.0)
    r = F.when(F.col("gold_pairs") > 0, F.col("both_pairs") / F.col("gold_pairs")).otherwise(0.0)
    return (
        out.withColumn("precision", p)
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


def threshold_sweep(scores: DataFrame, thresholds: list[float]) -> DataFrame:
    """Micro P/R/F1 at each decision threshold — the tuning curve for the
    reference's fixed sigmoid cut (model.py:227 hard-codes 0.5; a real
    deployment sweeps it against held-out gold).

    `scores`: one row per decision unit with (score double, is_gold 0/1).
    Single-pass: |thresholds| conditional sums inside ONE aggregate — a
    partially-aggregated reduction with no shuffle growth and no
    row x threshold blow-up — then `stack` unpivots the wide row to one
    row per threshold: (threshold, pre_cnt, true_cnt, cor_cnt,
    precision, recall, f1).
    """
    gold = F.col("is_gold").cast("long")
    zero = F.lit(0).cast("long")
    aggs = [F.coalesce(F.sum(gold), zero).alias("true_cnt")]
    for i, t in enumerate(thresholds):
        sel = (F.col("score") > F.lit(float(t))).cast("long")
        aggs.append(F.coalesce(F.sum(sel), zero).alias(f"pre_{i}"))
        aggs.append(F.coalesce(F.sum(sel * gold), zero).alias(f"cor_{i}"))
    wide = scores.agg(*aggs)
    stacked = ", ".join(
        f"{float(t)}D, pre_{i}, cor_{i}" for i, t in enumerate(thresholds)
    )
    long = wide.selectExpr(
        "true_cnt",
        f"stack({len(thresholds)}, {stacked}) AS (threshold, pre_cnt, cor_cnt)",
    )
    p = F.when(F.col("pre_cnt") > 0, F.col("cor_cnt") / F.col("pre_cnt")).otherwise(0.0)
    r = F.when(F.col("true_cnt") > 0, F.col("cor_cnt") / F.col("true_cnt")).otherwise(0.0)
    return (
        long.withColumn("precision", p)
        .withColumn("recall", r)
        .withColumn(
            "f1",
            F.when(
                (F.col("precision") + F.col("recall")) > 0,
                2 * F.col("precision") * F.col("recall")
                / (F.col("precision") + F.col("recall")),
            ).otherwise(0.0),
        )
        .select(
            "threshold", "pre_cnt", "true_cnt", "cor_cnt",
            "precision", "recall", "f1",
        )
    )
