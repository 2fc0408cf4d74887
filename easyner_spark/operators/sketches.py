"""Corpus-monitoring sketches: deterministic cardinality estimation
and fixed-bin histograms.

At 10^12 documents, `COUNT(DISTINCT url)` is a full shuffle of every
key; monitoring dashboards need cardinalities and distributions that
cost one scan and O(1) state. Spark's approx_count_distinct (HLL++) is
engine-private — its estimate can't be value-checked against another
engine — so this module ships the classic LINEAR COUNTING estimator
(Whang et al. 1990) on md5 buckets instead: deterministic, cross-
engine bit-stable, and exact-oracle-able end to end.

Scale shape: both operators aggregate to O(m) / O(bins) rows with full
map-side partial aggregation; nothing corpus-sized survives the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LC_BUCKETS = 1 << 16  # default m: <1% error up to ~m*ln(m) distincts


def _bucket32(col: Column, m: int) -> Column:
    """md5-derived bucket in [0, m) via the engine-wide shared 32-bit
    hash (sampling.md5_long32)."""
    from easyner_spark.operators.sampling import md5_long32

    return md5_long32(col) % F.lit(m)


def linear_count_distinct(
    df: DataFrame,
    col: str,
    m: int = LC_BUCKETS,
) -> DataFrame:
    """One row (hit_buckets, m, estimate): linear-counting cardinality
    of `col`. hit_buckets = COUNT(DISTINCT md5-bucket) — bounded by m,
    so the distinct-aggregate state is O(m) per partition, never
    O(corpus) — and estimate = round(-m * ln(1 - hit/m), 3) (the
    standard load-factor inversion; saturated sketches where hit == m
    report estimate = NULL — raise m). Deterministic: re-runs and
    other engines produce the IDENTICAL estimate, which is what makes
    the value oracle possible at all (HLL++ cannot promise that).
    Relative error <1% while n <~ m * ln(m); size m for the expected
    cardinality tier, not the corpus size."""
    if m < 2:
        raise ValueError(f"m must be >= 2: {m}")
    hits = df.select(_bucket32(F.col(col), m).alias("b")).agg(
        F.countDistinct("b").alias("hit_buckets")
    )
    frac = F.col("hit_buckets") / F.lit(float(m))
    est = F.when(
        F.col("hit_buckets") < F.lit(m),
        F.round(-F.lit(float(m)) * F.log(F.lit(1.0) - frac), 3),
    )
    return hits.select(
        "hit_buckets", F.lit(m).alias("m"), est.alias("estimate")
    )


def linear_count_oracle_sql(
    col: str,
    m: int = LC_BUCKETS,
    source: str = "documents",
) -> str:
    """DuckDB twin of :func:`linear_count_distinct`."""
    mi = int(m)
    return f"""
WITH b AS (
  SELECT ('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 8))::BIGINT % {mi} AS b
  FROM {source}
),
h AS (SELECT count(DISTINCT b)::BIGINT AS hit_buckets FROM b)
SELECT hit_buckets, {mi}::INT AS m,
       CASE WHEN hit_buckets < {mi}
            THEN round(-{mi}.0 * ln(1.0 - hit_buckets / {mi}.0), 3)
       END AS estimate
FROM h
"""


def histogram_fixed_bins(
    df: DataFrame,
    expr: Column | str,
    bin_width: int,
    n_bins: int,
) -> DataFrame:
    """(bin, lo, hi, n) — fixed-width histogram of an integer metric:
    bin = least(floor(x / w), n_bins - 1) (the last bin absorbs the
    tail; negative values clamp to bin 0). ONE partial-agg-absorbed
    aggregate over at most n_bins keys — the distribution monitor for
    quality/length/token columns at any corpus size. Empty bins are
    absent (same as the SQL GROUP BY). NULL metrics are EXCLUDED
    explicitly — Spark's least/greatest skip NULL operands, which
    would otherwise silently count NULL rows in the tail bin (and
    DuckDB's NULL-propagating least/greatest would disagree)."""
    if bin_width <= 0 or n_bins <= 0:
        raise ValueError(f"bin_width and n_bins must be positive: {bin_width}, {n_bins}")
    x = F.col(expr) if isinstance(expr, str) else expr
    df = df.where(x.isNotNull())
    b = F.greatest(
        F.lit(0),
        F.least(F.floor(x / F.lit(bin_width)), F.lit(n_bins - 1)),
    ).cast("int")
    return (
        df.select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.col("bin") * F.lit(bin_width)).cast("long").alias("lo"),
            ((F.col("bin") + 1) * F.lit(bin_width)).cast("long").alias("hi"),
            "n",
        )
    )


def histogram_oracle_sql(
    expr: str,
    bin_width: int,
    n_bins: int,
    source: str = "documents",
) -> str:
    """DuckDB twin of :func:`histogram_fixed_bins`; `expr` is a SQL
    expression producing the integer metric."""
    w, nb = int(bin_width), int(n_bins)
    return f"""
WITH b AS (
  SELECT greatest(0, least(CAST(floor(({expr}) / {w}) AS BIGINT), {nb - 1}))::INT AS bin
  FROM {source} WHERE ({expr}) IS NOT NULL
)
SELECT bin, (bin * {w})::BIGINT AS lo, ((bin + 1) * {w})::BIGINT AS hi,
       count(*)::BIGINT AS n
FROM b GROUP BY bin
"""
