"""Entity frequency rollup + top-k (SURVEY.md section 2.6 A1-A3, 2.8 O2-O3).

Reference: scripts/analysis.py:40-80 accumulates, per entity surface
string (cased, as matched), `total_count`, the distinct-article set,
the distinct-batch set and per-batch counts, then derives
articles_spanned / batches_spanned / freq_per_article / freq_per_batch
and sorts by total_count descending.

Spark shape: one groupBy — Catalyst compiles it to partial (map-side)
hash aggregation, a single shuffle on `mention`, and a final hash agg;
top-k (`plot` feed, scripts/analysis.py:89) becomes
TakeOrderedAndProject, never a global sort of the full rollup.

Scale notes (100 TB design point, SURVEY section 7.4):
  - `collect_set(url)` is unbounded at web scale -> gated behind
    `exact_sets` (test/compat profile only). Production keeps counts +
    optional top-k exemplar urls.
  - `countDistinct` is the reference-exact semantic; `approximate=True`
    swaps in HLL `approx_count_distinct` for dashboard-grade rollups.
  - reference tie order is dict-insertion order under pandas stable
    sort (scripts/analysis.py:72) — not reproducible distributed, so
    the engine pins the documented tie-break (desc count, asc mention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def entity_frequency(
    mentions: DataFrame,
    mention_col: str = "mention",
    doc_col: str = "url",
    batch_col: str | None = None,
    exact_sets: bool = False,
    approximate: bool = False,
) -> DataFrame:
    cd = F.approx_count_distinct if approximate else F.countDistinct
    aggs = [
        F.count(F.lit(1)).alias("total_count"),
        cd(doc_col).alias("articles_spanned"),
    ]
    if batch_col is not None:
        aggs.append(cd(batch_col).alias("batches_spanned"))
    if exact_sets:
        aggs.append(F.sort_array(F.collect_set(doc_col)).alias("articles_set"))
        if batch_col is not None:
            aggs.append(F.sort_array(F.collect_set(batch_col)).alias("batch_set"))

    out = mentions.groupBy(F.col(mention_col).alias("mention")).agg(*aggs)
    out = out.withColumn(
        "freq_per_article", F.col("total_count") / F.col("articles_spanned")
    )
    if batch_col is not None:
        out = out.withColumn(
            "freq_per_batch", F.col("total_count") / F.col("batches_spanned")
        )
    return out


def entity_frequency_skew_resistant(
    mentions: DataFrame,
    mention_col: str = "mention",
    doc_col: str = "url",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-immune exact rollup (north_rule 'salted repartitioning';
    SURVEY section 4.3.1).

    A single groupBy(mention) sends every row for a hot entity (think
    'human', 'covid' at web scale) to ONE reducer. Two-phase plan:

      phase 1: groupBy(mention, url, salt) partial counts — the salt
               splits even a (hot mention, hot url) pair across
               `salt_buckets` reducers; including `url` in the key
               makes phase 2's distinct-doc count a plain count;
      phase 2: groupBy(mention, url) combines salt shards (tiny);
      phase 3: groupBy(mention) sums counts + counts rows = exact
               total_count + articles_spanned.

    Output is identical to entity_frequency() (asserted in tests); the
    phases replace one skewed shuffle with three uniform ones — the
    right trade exactly when the key histogram is Zipf, which the
    host-skewed pages table guarantees.
    """
    salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt_buckets))
    phase1 = (
        mentions.select(F.col(mention_col).alias("mention"), F.col(doc_col).alias("url"))
        .withColumn("_salt", salt)
        .groupBy("mention", "url", "_salt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    phase2 = phase1.groupBy("mention", "url").agg(F.sum("c").alias("c"))
    out = phase2.groupBy("mention").agg(
        F.sum("c").alias("total_count"),
        F.count(F.lit(1)).alias("articles_spanned"),
    )
    return out.withColumn(
        "freq_per_article", F.col("total_count") / F.col("articles_spanned")
    )


def ranked(freq: DataFrame) -> DataFrame:
    """Deterministic ranking order (reference sort + pinned tie-break)."""
    return freq.orderBy(F.desc("total_count"), F.asc("mention"))


def top_n(freq: DataFrame, n: int = 50) -> DataFrame:
    """Top-n feed for the barchart (scripts/analysis.py:82-122) —
    compiles to TakeOrderedAndProject (no full sort)."""
    return ranked(freq).limit(n)


def term_frequency_per_doc(mentions: DataFrame) -> DataFrame:
    """Per-article term counts, desc (reference scripts/evals.py:36-50)."""
    return (
        mentions.groupBy("url", "mention")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("url", F.desc("cnt"), "mention")
    )
