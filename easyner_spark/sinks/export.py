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


def to_ntriples(
    edges,
    base_iri: str = "http://kg.example/",
    subj_col: str = "subj_id",
    pred_col: str = "pred",
    obj_col: str = "obj_id",
):
    """W3C N-Triples serialization of the KG edge table: one `line`
    per edge — `<base/e/SUBJ> <base/p/PRED> <base/e/OBJ> .` — the
    interop format every triple store loads. IRI-unsafe characters in
    the ids (anything outside RFC 3986 unreserved + '/') are
    percent-encoded byte-wise via a scan-fused transform over the
    character array; deterministic, so the serialized lines
    value-match across engines. Returns (subj_id, pred, obj_id, line);
    write `line` with text writers or `write_corpus_shards`.

    Zero shuffle: pure codegen string assembly.
    """
    from pyspark.sql import functions as F

    def enc(col):
        # percent-encode per character, byte-wise (a multi-byte UTF-8
        # char becomes %XX%YY): unreserved set kept verbatim
        return F.array_join(
            F.transform(
                F.split(col, ""),
                lambda c: F.when(
                    c.rlike("^[A-Za-z0-9._~-]$"), c
                ).otherwise(
                    F.regexp_replace(
                        F.upper(F.hex(F.encode(c, "UTF-8"))),
                        "(..)",
                        r"%$1",
                    )
                ),
            ),
            "",
        )

    line = F.concat(
        F.lit(f"<{base_iri}e/"), enc(F.col(subj_col)),
        F.lit(f"> <{base_iri}p/"), enc(F.col(pred_col)),
        F.lit(f"> <{base_iri}e/"), enc(F.col(obj_col)),
        F.lit("> ."),
    )
    return edges.select(subj_col, pred_col, obj_col, line.alias("line"))


def to_ntriples_oracle_sql(
    edges_sql: str, base_iri: str = "http://kg.example/"
) -> str:
    """DuckDB twin of to_ntriples; `edges_sql` yields (subj_id, pred,
    obj_id). Same per-character percent-encoding."""

    def enc(col: str) -> str:
        return (
            "array_to_string(list_transform("
            f"string_split({col}, ''), c -> CASE "
            "WHEN regexp_matches(c, '^[A-Za-z0-9._~-]$') THEN c "
            "ELSE regexp_replace(upper(to_hex(encode(c))),"
            " '(..)', '%\\1', 'g') END), '')"
        )

    return f"""
WITH e AS ({edges_sql})
SELECT subj_id, pred, obj_id,
  '<{base_iri}e/' || {enc('subj_id')}
  || '> <{base_iri}p/' || {enc('pred')}
  || '> <{base_iri}e/' || {enc('obj_id')} || '> .' AS line
FROM e
"""
