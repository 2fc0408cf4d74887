"""Bucketed table layout: shuffle-free co-located joins (SURVEY §4 /
north_rule partitioning discipline).

At 100 TB the dominant repeated cost is re-shuffling the same fact
tables on the same keys job after job. Bucketing amortizes that: write
`sentences` and `mentions` bucketed (and sorted) by the join key once,
and every later equi-join/groupBy on that key reads co-located buckets
— SortMergeJoin with ZERO Exchange on either side (verified by plan
test). This is the parquet stand-in for Iceberg's `bucket(N, url)`
partition transform; the operator code is identical either way.

Bucket count: pick so one bucket of the biggest table fits an executor
core's working set (~128-512 MB post-compression); both sides of a
co-located join MUST use the same count and key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist df as a bucketed+sorted managed parquet table (the
    session catalog's warehouse dir; Iceberg swaps in transparently)."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — REQUIRED for bucket metadata (a path-based
    spark.read.parquet of the same files loses the bucket spec and
    reintroduces the shuffle)."""
    return spark.table(table)
