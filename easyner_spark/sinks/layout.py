"""Data layout for scan pruning: z-order clustering + a per-file
min/max manifest and a manifest-pruned reader.

At 100 TB the fastest scan is the one that never opens the file. Spark
prunes *partitions* (directory values) for free, but multi-dimensional
predicates over non-partition columns read every file unless the rows
are CLUSTERED so each file covers a small box of the value space —
Delta's OPTIMIZE ZORDER BY and Iceberg's sort-order + metadata
file-skipping. This module is that machinery, dependency-free:

  - :func:`zorder_key` — bit-interleaved space-filling-curve key over
    N quantized integer dimensions (pure JVM bit math, deterministic,
    DuckDB-twin-able via the shared expression generator).
  - :func:`write_clustered` — range-repartition on the cluster key,
    write, then build a per-file (min, max) manifest for the cluster
    columns (one metadata scan of the written files; a real catalog
    lifts these stats from parquet footers at commit time).
  - :func:`pruned_read` — intersect box predicates with the manifest,
    read ONLY surviving files, re-apply the residual filter (file
    stats are necessary, not sufficient).

Why z-order and not just ORDER BY x: a lexicographic layout answers
x-range predicates with few files but y-only predicates with ALL
files; bit interleaving gives every dimension partial locality, so a
box predicate on ANY subset of the cluster columns skips files.
Measured in tests/test_layout.py: on a 64x64 grid split into 16
files, a y-only box keeps 16/16 linear files but <= 8/16 z-ordered
files (and the x-box prunes both ways).

Reference parity: no analog (the reference reads whole JSON batch
dirs, scripts/util.py); north-star Iceberg-table layout stage.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_MANIFEST"


def _interleave_terms(cols: list[str], bits: int) -> list[str]:
    """Shared expression fragments: bit b of column c lands at
    position b * n_cols + c. Valid Spark SQL AND DuckDB SQL (both
    support <<, >>, & on BIGINT; the disjoint positions make + an
    exact OR), so the operator and its oracle are generated from the
    SAME loop and cannot drift."""
    n = len(cols)
    mask = (1 << bits) - 1
    terms = []
    for ci, c in enumerate(cols):
        for b in range(bits):
            terms.append(
                f"((((CAST({c} AS BIGINT) & {mask}) >> {b}) & 1)"
                f" << {b * n + ci})"
            )
    return terms


def zorder_key_sql(cols: list[str], bits: int = 16) -> str:
    """The z-key as a SQL expression string (Spark and DuckDB)."""
    if not cols:
        raise ValueError("need at least one cluster column")
    if bits < 1 or bits * len(cols) > 62:
        raise ValueError(f"bits * n_cols must fit a BIGINT: {bits}x{len(cols)}")
    return "(" + " + ".join(_interleave_terms(cols, bits)) + ")"


def zorder_key(cols: list[str], bits: int = 16) -> Column:
    """Z-order (Morton) key: round-robin bit interleave of the low
    `bits` bits of each non-negative integer column — disjoint bit
    positions, so the OR is a plain sum and the whole key is one
    codegen'd JVM expression (no UDF). Quantize/rank float or skewed
    columns upstream; the key only sees masked non-negative ints."""
    return F.expr(zorder_key_sql(cols, bits))


BLOOM_BUCKETS = 4096


def _bloom_bucket(col: Column, m: int) -> Column:
    """Membership bucket for the per-file Bloom manifest: the
    engine-wide md5 32-bit hash mod m (deterministic and
    cross-engine, like every hash in this repo)."""
    from easyner_spark.operators.sampling import md5_long32

    return md5_long32(col) % F.lit(m)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    n_files: int,
    layout: str = "zorder",
    bits: int = 10,
    bloom_cols: list[str] | None = None,
    bloom_buckets: int = BLOOM_BUCKETS,
) -> int:
    """Cluster `df` into `n_files` range-partitioned files on either
    the z-key (`layout='zorder'`) or the lexicographic first column
    (`layout='linear'` — the comparison baseline), then write a
    per-file min/max manifest for every cluster column. Returns the
    file count actually written.

    Scale shape: repartitionByRange samples the key (one pass),
    writes shuffle one row each; the manifest build re-scans ONLY the
    cluster columns of the written files (column-pruned parquet read,
    cheap) and aggregates to one row per file — a real catalog gets
    these stats free from footers; the explicit manifest keeps the
    pruning logic engine-visible and testable."""
    if layout not in ("zorder", "linear"):
        raise ValueError(f"layout must be zorder|linear: {layout}")
    key = (
        zorder_key(cluster_by, bits)
        if layout == "zorder"
        else F.col(cluster_by[0]).cast("bigint")
    )
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    spark = df.sparkSession
    written = spark.read.parquet(path)
    aggs = []
    for c in cluster_by:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    for c in bloom_cols or []:
        # per-file membership filter for POINT predicates on
        # high-cardinality columns, where min/max boxes are useless
        # (a url column's [min, max] spans everything): the distinct
        # md5 buckets seen in the file. SIZE bloom_buckets to the
        # file's expected distinct count — probe selectivity is
        # ndv/m, so m >= ~30x ndv-per-file gives ~3% false-keep; at
        # m <= ndv the list saturates and admits every probe
        # (measured at 62k ndv vs the 4096 default: 64/64 files kept
        # — never wrong, just useless). Storage is O(min(ndv, m))
        # ints per file, the same order as Parquet's own column
        # bloom sizing.
        aggs.append(
            F.sort_array(
                F.collect_set(_bloom_bucket(F.col(c), bloom_buckets))
            ).alias(f"bloom_{c}")
        )
        # the bucket modulus rides IN the manifest so readers probe
        # with the exact m the writer used (re-layouts can change it)
        aggs.append(F.first(F.lit(bloom_buckets)).alias(f"bloom_m_{c}"))
    manifest = (
        written.select(
            F.input_file_name().alias("file"),
            *cluster_by,
            *[c for c in (bloom_cols or []) if c not in cluster_by],
        )
        .groupBy("file")
        .agg(*aggs)
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, MANIFEST)
    )
    return manifest.count()


def plan_files(
    spark: SparkSession,
    path: str,
    ranges: dict[str, tuple[int, int]] | None = None,
    equals: dict[str, object] | None = None,
) -> tuple[list[str], int]:
    """(surviving files, total files): manifest rows whose [min, max]
    box intersects every predicate range [lo, hi] AND whose Bloom
    bucket list contains every equality predicate's bucket. The
    manifest is one row per file — driver-safe at any corpus size
    (file counts, not row counts)."""
    m = spark.read.parquet(os.path.join(path, MANIFEST))
    total = m.count()
    cond = F.lit(True)
    for c, (lo, hi) in (ranges or {}).items():
        cond = cond & (F.col(f"max_{c}") >= lo) & (F.col(f"min_{c}") <= hi)
    for c, v in (equals or {}).items():
        from easyner_spark.operators.sampling import md5_long32

        probe = md5_long32(F.lit(v)) % F.col(f"bloom_m_{c}")
        cond = cond & F.array_contains(F.col(f"bloom_{c}"), probe)
    kept = [r.file for r in m.where(cond).select("file").collect()]
    return kept, total


def pruned_read(
    spark: SparkSession,
    path: str,
    ranges: dict[str, tuple[int, int]] | None = None,
    equals: dict[str, object] | None = None,
) -> DataFrame:
    """Read only the manifest-surviving files, then re-apply the
    predicates as a residual filter (file-level stats and Bloom
    buckets admit false positives, never false negatives — the
    residual keeps results EXACTLY equal to a full scan + filter,
    which is the correctness contract tests pin). An empty survivor
    set returns an empty frame with the table's schema."""
    kept, _ = plan_files(spark, path, ranges, equals)
    full_schema = spark.read.parquet(path).schema
    if not kept:
        return spark.createDataFrame([], full_schema)
    df = spark.read.parquet(*kept)
    for c, (lo, hi) in (ranges or {}).items():
        df = df.where((F.col(c) >= lo) & (F.col(c) <= hi))
    for c, v in (equals or {}).items():
        df = df.where(F.col(c) == v)
    return df
