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


def cohens_kappa(
    pred: DataFrame,
    gold: DataFrame,
    keys: tuple[str, ...] = ("doc_id", "sent_idx", "tok_idx"),
    label_col: str = "label",
) -> DataFrame:
    """One row (n, agree, chance_prod_sum, kappa) — Cohen's kappa
    between two labelings of the same token stream: the chance-
    corrected agreement the raw-accuracy eval (J6) overstates when
    one class ('O') dominates, which in NER it always does.

    Exactness trick: the textbook form kappa = (p_o - p_e)/(1 - p_e)
    divides order-dependent float sums; multiplying through by N^2
    gives kappa = (N*agree - S) / (N^2 - S) with
    S = sum_k n_pred(k) * n_gold(k) — and S is an INTEGER sum, exact
    and order-independent in both engines, so kappa is one double
    division of two exact BIGINTs, round(·, 6). Rows present on only
    one side are excluded by the inner key join (both raters must
    rate an item, the kappa precondition).

    Scale: one key-equi join + three rollups, all partial-agg
    absorbed; 'O'-marginal hot keys never form a join key.
    """
    kl = list(keys)
    p = pred.select(*kl, F.col(label_col).alias("_pl"))
    g = gold.select(*kl, F.col(label_col).alias("_gl"))
    j = p.join(g, kl)
    tot = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(F.col("_pl") == F.col("_gl"), 1).otherwise(0)
        ).cast("long").alias("agree"),
    )
    mp = j.groupBy(F.col("_pl").alias("_l")).agg(
        F.count(F.lit(1)).cast("long").alias("np")
    )
    mg = j.groupBy(F.col("_gl").alias("_l")).agg(
        F.count(F.lit(1)).cast("long").alias("ng")
    )
    s = mp.join(mg, "_l").agg(
        F.coalesce(F.sum(F.col("np") * F.col("ng")), F.lit(0))
        .cast("long")
        .alias("chance_prod_sum")
    )
    den = (
        F.col("n").cast("double") * F.col("n").cast("double")
        - F.col("chance_prod_sum").cast("double")
    )
    num = (
        F.col("n").cast("double") * F.col("agree").cast("double")
        - F.col("chance_prod_sum").cast("double")
    )
    return tot.crossJoin(s).select(
        "n",
        "agree",
        "chance_prod_sum",
        F.when(den > 0, F.round(num / den, 6))
        .otherwise(F.lit(1.0))
        .alias("kappa"),
    )


def cohens_kappa_oracle_sql(
    pred_sql: str,
    gold_sql: str,
    keys: tuple[str, ...] = ("doc_id", "sent_idx", "tok_idx"),
) -> str:
    """DuckDB twin of :func:`cohens_kappa`; pred_sql/gold_sql yield
    (*keys, label). CTE CONTINUATION (leading ', ')."""
    kl = ", ".join(keys)
    on = " AND ".join(f"kp.{k} = kg.{k}" for k in keys)
    return f"""
, kp AS (SELECT {kl}, label AS pl FROM ({pred_sql})),
kg AS (SELECT {kl}, label AS gl FROM ({gold_sql})),
kj AS (SELECT kp.pl, kg.gl FROM kp JOIN kg ON {on}),
ktot AS (
  SELECT count(*)::BIGINT AS n,
         sum(CASE WHEN pl = gl THEN 1 ELSE 0 END)::BIGINT AS agree
  FROM kj
),
kmp AS (SELECT pl AS l, count(*)::BIGINT AS np FROM kj GROUP BY pl),
kmg AS (SELECT gl AS l, count(*)::BIGINT AS ng FROM kj GROUP BY gl),
ks AS (
  SELECT coalesce(sum(np * ng), 0)::BIGINT AS chance_prod_sum
  FROM kmp JOIN kmg USING (l)
)
SELECT n, agree, chance_prod_sum,
       CASE WHEN (n::DOUBLE * n::DOUBLE - chance_prod_sum::DOUBLE) > 0
            THEN round((n::DOUBLE * agree::DOUBLE
                        - chance_prod_sum::DOUBLE)
                       / (n::DOUBLE * n::DOUBLE
                          - chance_prod_sum::DOUBLE), 6)
            ELSE 1.0 END AS kappa
FROM ktot CROSS JOIN ks
"""
