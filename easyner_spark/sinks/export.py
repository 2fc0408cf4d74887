"""Export sinks (SURVEY.md §2.2 K3/K6): TSV ranked list + counts.

Reference: scripts/analysis.py:150 writes the ranked entity table as a
single TSV (pandas to_csv sep='\\t'); scripts/pubmed_bulk.py:59-87
writes per-input-file article counts plus a globally sorted PMID list.

Cluster posture: a single-file TSV is a driver-adjacent compat export
(coalesce(1) — only for the small ranked rollup, never for fact
tables); the engine-native sink for anything big is partitioned
parquet via sinks.checkpoint.SnapshotTable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_tsv(df: DataFrame, path: str, single_file: bool = True) -> None:
    """TSV with header (reference scripts/analysis.py:150). single_file
    coalesces to one part — use ONLY for driver-scale aggregates."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("sep", "\t").option("header", "true").csv(path)


def batch_counts(df: DataFrame, batch_col: str = "batch_id") -> DataFrame:
    """Per-batch row counts + a grand-total row (reference
    scripts/pubmed_bulk.py:59-80: per-file counts then total)."""
    per = df.groupBy(F.col(batch_col).cast("string").alias("batch")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    total = df.agg(
        F.lit("__total__").alias("batch"), F.count(F.lit(1)).alias("n_docs")
    )
    return per.unionByName(total).orderBy("batch")


def sorted_id_list(df: DataFrame, id_col: str = "url", numeric: bool = False) -> DataFrame:
    """Globally sorted distinct id list (reference
    scripts/pubmed_bulk.py:85-86 sorts PMIDs numerically)."""
    ids = df.select(F.col(id_col).alias("id")).distinct()
    key = F.col("id").cast("long") if numeric else F.col("id")
    return ids.orderBy(key)


def write_corpus_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 64,
    id_col: str = "url",
    fmt: str = "parquet",
) -> DataFrame:
    """Training-corpus export: write `df` as `n_shards` deterministic
    shards under `path` (parquet or json = JSONL), shard =
    pmod(xxhash64(id), n_shards). Returns the (shard, n_docs) manifest
    DataFrame (also written to `path`/_manifest as one TSV).

    Why hashed shards and not coalesce(n): the shard of a document is
    a pure function of its id — re-running the export, exporting an
    incremental delta, or resuming after a failure lands every doc in
    the SAME shard, so downstream training jobs can consume shards
    independently and dedupe across exports by (shard, id). Rows are
    sorted by id within each shard for a deterministic file layout.
    One repartition on the uniform hash key — no skew by construction.
    """
    if fmt not in ("parquet", "json"):
        raise ValueError(f"fmt must be parquet or json, got {fmt!r}")
    sharded = df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int")
    )
    out = sharded.repartition(n_shards, "shard").sortWithinPartitions("shard", id_col)
    out.write.mode("overwrite").partitionBy("shard").format(fmt).save(path)
    manifest = (
        sharded.groupBy("shard").agg(F.count(F.lit(1)).alias("n_docs")).orderBy("shard")
    )
    write_tsv(manifest, f"{path}/_manifest")
    return manifest
