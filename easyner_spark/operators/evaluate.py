"""Evaluation: span-tolerant P/R/F1 (SURVEY.md J4 + A5).

Reference: supplementary/experiment_scripts/evaluate_ner_pubtatorformat.py
  - TP: a predicted (start, end) matches gold for the same
    (doc, class) under any of the 9 offset combinations +-stride
    (:234-246 get_offsets, :301-364) — exactly the box
    |d_begin| <= stride AND |d_end| <= stride;
  - a prediction counts at most once (`break` at :326) -> left_semi;
  - FN symmetric from the gold side; FP = pred_count - TP (:368-377);
  - class-level P/R/F1 (:381-412), corpus-level macro (mean of class
    metrics), micro (from summed counts), weighted (gold-count
    weighted) (:418-498).

Spark shape: gold corpora are small -> broadcast; the band condition is
a non-equi predicate ON TOP of hash-joinable equi keys (url, class), so
Catalyst still executes a broadcast hash join on the equi part with the
band as a post-filter — no BroadcastNestedLoopJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _match_cond(pred, gold, keys: list[str], stride: int):
    cond = None
    for k in keys:
        c = pred[k] == gold[k]
        cond = c if cond is None else (cond & c)
    band = (F.abs(pred["begin"] - gold["begin"]) <= stride) & (
        F.abs(pred["end"] - gold["end"]) <= stride
    )
    return cond & band


def span_match_counts(
    pred: DataFrame,
    gold: DataFrame,
    keys: list[str] = ["url", "class"],
    stride: int = 1,
    by: list[str] = ["class"],
) -> DataFrame:
    """Per-`by` tp/fp/fn counts via two semi/anti broadcast joins."""
    p = pred.select(*keys, "begin", "end").alias("p")
    g = gold.select(*keys, "begin", "end").alias("g")
    cond = _match_cond(p, g, keys, stride)

    tp = (
        p.join(F.broadcast(g), cond, "left_semi")
        .groupBy(*by)
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    fp = (
        p.join(F.broadcast(g), cond, "left_anti")
        .groupBy(*by)
        .agg(F.count(F.lit(1)).alias("fp"))
    )
    fn = (
        g.join(F.broadcast(p), _match_cond(g, p, keys, stride), "left_anti")
        .groupBy(*by)
        .agg(F.count(F.lit(1)).alias("fn"))
    )
    base = pred.select(*by).union(gold.select(*by)).distinct()
    return (
        base.join(tp, by, "left")
        .join(fp, by, "left")
        .join(fn, by, "left")
        .na.fill(0, ["tp", "fp", "fn"])
    )


def prf(counts: DataFrame) -> DataFrame:
    """tp/fp/fn -> precision/recall/f1 (reference :381-412 semantics:
    0 denominators yield 0)."""
    p = F.when(F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(F.lit(0.0))
    r = F.when(F.col("tp") + F.col("fn") > 0, F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(F.lit(0.0))
    out = counts.withColumn("precision", p).withColumn("recall", r)
    return out.withColumn(
        "f1",
        F.when(
            F.col("precision") + F.col("recall") > 0,
            2 * F.col("precision") * F.col("recall") / (F.col("precision") + F.col("recall")),
        ).otherwise(F.lit(0.0)),
    )


def corpus_rollup(class_metrics: DataFrame, by: list[str] = []) -> DataFrame:
    """macro / micro / weighted corpus metrics from per-class rows
    (reference :418-498)."""
    gb = class_metrics.groupBy(*by) if by else class_metrics.groupBy()
    agg = gb.agg(
        F.avg("precision").alias("macro_precision"),
        F.avg("recall").alias("macro_recall"),
        F.avg("f1").alias("macro_f1"),
        F.sum("tp").alias("tp"),
        F.sum("fp").alias("fp"),
        F.sum("fn").alias("fn"),
        (F.sum((F.col("tp") + F.col("fn")) * F.col("precision")) / F.sum(F.col("tp") + F.col("fn"))).alias("weighted_precision"),
        (F.sum((F.col("tp") + F.col("fn")) * F.col("recall")) / F.sum(F.col("tp") + F.col("fn"))).alias("weighted_recall"),
        (F.sum((F.col("tp") + F.col("fn")) * F.col("f1")) / F.sum(F.col("tp") + F.col("fn"))).alias("weighted_f1"),
    )
    micro_p = F.col("tp") / (F.col("tp") + F.col("fp"))
    micro_r = F.col("tp") / (F.col("tp") + F.col("fn"))
    return (
        agg.withColumn("micro_precision", micro_p)
        .withColumn("micro_recall", micro_r)
        .withColumn("micro_f1", 2 * micro_p * micro_r / (micro_p + micro_r))
    )


def set_eval(pred: DataFrame, gold: DataFrame, keys: list[str]) -> dict:
    """Exact-set P/R for keyed tuples (the triple gate): TP = pred
    rows with a gold twin, counted once; driver-side scalars."""
    p = pred.select(*keys).alias("p")
    g = gold.select(*keys).alias("g")
    tp = p.join(F.broadcast(g), keys, "left_semi").count()
    n_pred = p.count()
    n_gold = g.count()
    precision = tp / n_pred if n_pred else 0.0
    recall = (
        g.join(F.broadcast(p), keys, "left_semi").count() / n_gold if n_gold else 0.0
    )
    return {"tp": tp, "n_pred": n_pred, "n_gold": n_gold, "precision": precision, "recall": recall}
