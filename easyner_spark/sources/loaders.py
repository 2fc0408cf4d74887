"""Sources/scans (SURVEY.md §2.1): the reference's four offline loaders
re-expressed as DataFrame scans into the canonical `pages` shape
(url/doc_id, title, text[, metadata...]).

The PubMed API/FTP downloaders (S1/S2 network legs) are out of scope
for a cluster engine — ingestion starts from files/tables already in
distributed storage. What IS preserved is every load-time semantic:
filters, id coalescing, subset semi-join, concatenation quirks.

All loaders are scan + narrow projections (+ one broadcast semi-join
for the subset filter); nothing here shuffles, so ingest runs at scan
speed at any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# CORD-19 metadata.csv id columns, in the reference's coalesce priority
# order (scripts/cord_loader.py:52-83).
CORD_ID_COLS = [
    "cord_uid", "doi", "pmcid", "pubmed_id", "mag_id", "who_covidence_id", "arxiv_id",
]


def cord_csv_load(
    spark: SparkSession,
    path: str,
    subset_df: DataFrame | None = None,
) -> DataFrame:
    """CORD-19 CSV loader (S3; reference scripts/cord_loader.py:14-103).

    Semantics preserved:
      - rows with empty title OR abstract dropped (:41-42);
      - doc id = first non-empty of the 7 id columns, else
        sha256(title) (:52-83), with `id_type` recording which won;
      - optional subset: keep rows whose lowercased cord_uid is in the
        subset list (:20-25, :85-86) -> broadcast LEFT-SEMI join.
    """
    df = spark.read.csv(path, header=True).na.fill("", CORD_ID_COLS + ["title", "abstract"])
    df = df.where((F.col("title") != "") & (F.col("abstract") != ""))

    id_expr = F.coalesce(
        *[F.nullif(F.col(c), F.lit("")) for c in CORD_ID_COLS],
        F.sha2(F.col("title").cast("binary"), 256),
    )
    type_expr = F.lit("hash")
    for c in reversed(CORD_ID_COLS):
        type_expr = F.when(F.col(c) != "", F.lit(c)).otherwise(type_expr)

    out = df.select(
        id_expr.alias("doc_id"),
        type_expr.alias("id_type"),
        "title",
        F.col("abstract").alias("text"),
        *CORD_ID_COLS,
    )
    if subset_df is not None:
        # reference parity: subset entries are strip()ped but NOT
        # lowercased (cord_loader.py:20-25) — only the row's cord_uid is
        # lowercased before the membership test, so an uppercase subset
        # entry never matches, bug-for-bug.
        uids = subset_df.select(F.trim(subset_df.columns[0]).alias("cord_uid"))
        out = out.join(
            F.broadcast(uids),
            F.lower(out["cord_uid"]) == uids["cord_uid"],
            "left_semi",
        )
    return out


def free_text_load(spark: SparkSession, glob_path: str, prefix: str = "freetext") -> DataFrame:
    """Free-text loader (S4; reference scripts/text_loader.py:6-39).

    One doc per *.txt file: lines stripped and joined with single
    spaces; title = filename stem. The reference's doc id is
    `prefix_<enumeration index over the sorted glob>` — positional ids
    are non-deterministic under distributed listing, so the id here is
    derived from the SORTED filename rank (a tiny window over the
    distinct file list), which reproduces the reference's ids exactly
    for the same file set.
    """
    from pyspark.sql.window import Window

    lines = (
        spark.read.text(glob_path)
        .withColumn("file", F.input_file_name())
        # Python str.strip() parity: remove ALL leading/trailing
        # whitespace (\t \r \f \v ...), not just ASCII space as F.trim
        # does — CRLF .txt files must not leave stray \r in the text.
        .select("file", F.regexp_replace("value", r"(?U)^\s+|\s+$", "").alias("line"))
    )
    # preserve line order within each file for the join
    lines = lines.withColumn("line_id", F.monotonically_increasing_id())
    docs = lines.groupBy("file").agg(
        F.concat_ws(" ", F.array_sort(F.collect_list(F.struct("line_id", "line"))).getField("line")).alias("text")
    )
    rank_w = Window.orderBy("file")
    return docs.withColumn("idx", F.row_number().over(rank_w) - 1).select(
        F.concat(F.lit(f"{prefix}_"), F.col("idx")).alias("doc_id"),
        F.regexp_extract("file", r"([^/]+)\.txt$", 1).alias("title"),
        "text",
    )


def pubtator_load(
    spark: SparkSession,
    path: str,
    variant: str = "bioid",
) -> DataFrame:
    """PubTator corpus loader (S5; reference
    supplementary/experiment_scripts/convert_hunflair2_pubtator_to_json.py).

    Variants (:48-67 bioid, :101-128 medmentions, :162-186 tmvar3,
    :221-247 biored):
      - 'bioid': one `id|text` paragraph line per doc; title = id.
      - 'medmentions' / 'tmvar3' / 'biored': `id|t|title` and
        `id|a|abstract` lines; text = title + '.' + ' ' + abstract for
        medmentions (the `.`-append quirk, :117), title + ' ' +
        abstract for the others (:97).
    Conditional aggregation over regexp-extracted (id, kind, payload)
    rows — one groupBy on doc id.
    """
    lines = spark.read.text(path)
    if variant == "bioid":
        m = lines.select(
            F.regexp_extract("value", r"^([^|]+)\|(.+)$", 1).alias("doc_id"),
            F.regexp_extract("value", r"^([^|]+)\|(.+)$", 2).alias("text"),
        ).where(F.col("doc_id") != "")
        return m.select("doc_id", F.col("doc_id").alias("title"), F.trim("text").alias("text"))

    parsed = lines.select(
        F.regexp_extract("value", r"^(\d+)\|([ta])\|(.*)$", 1).alias("doc_id"),
        F.regexp_extract("value", r"^(\d+)\|([ta])\|(.*)$", 2).alias("kind"),
        F.regexp_extract("value", r"^(\d+)\|([ta])\|(.*)$", 3).alias("payload"),
    ).where(F.col("doc_id") != "")
    agg = parsed.groupBy("doc_id").agg(
        F.max(F.when(F.col("kind") == "t", F.col("payload"))).alias("title"),
        F.max(F.when(F.col("kind") == "a", F.col("payload"))).alias("abstract"),
    )
    if variant == "medmentions":
        title = F.concat(F.col("title"), F.lit("."))
    else:
        title = F.col("title")
    return agg.select(
        "doc_id",
        title.alias("title"),
        F.concat(title, F.lit(" "), F.col("abstract")).alias("text"),
    )


def presplit_json_scan(
    spark: SparkSession,
    path: str,
    batch_range: tuple[int, int] | None = None,
) -> DataFrame:
    """Pre-split batch-JSON scan (S6; reference
    scripts/splitter_pubmed.py:15-35 + scripts/ner_main.py:141-151).

    The reference sorts batch files by numeric filename suffix and
    range-filters `[start, end]` inclusive. Here the batch id is parsed
    from the input file name into a column and the range becomes a
    pushable predicate (partition pruning once the table is written
    partitioned by batch_id).
    """
    df = spark.read.json(path, multiLine=True).withColumn(
        "batch_id",
        F.regexp_extract(F.input_file_name(), r"(\d+)\.json$", 1).cast("int"),
    )
    if batch_range is not None:
        lo, hi = batch_range
        df = df.where((F.col("batch_id") >= lo) & (F.col("batch_id") <= hi))
    return df


ANNOTATED_SENT_SCHEMA = (
    "doc_id string, sent_idx int, sentence string, batch_id int, "
    "anns array<struct<mention:string, begin:int, end:int, class:string>>"
)


def annotated_json_load(spark: SparkSession, path: str) -> DataFrame:
    """Reference NER-output batch JSON loader (the format
    scripts/ner_main.py WRITES and entity_merger/analysis READ:
    {pmid: {title, sentences: [{text, entities, entity_spans}]}};
    results/sample_output/ner_huner_gene-1.json is a bundled example).

    Handles BOTH annotation shapes: the flat per-run lists
    (entities: [..], class='') and the merged nested maps
    (entities: {tag: [..]}, class=tag — entity_merger.py:20-33).
    One task per batch file (wholetext read, stdlib json parse in an
    Arrow batch); batch_id = trailing integer in the file stem.
    Scale note: the task unit is one WHOLE batch file in memory — the
    reference writes bounded ~1000-doc batches (config.json
    splitter.batch_size), which is what keeps this O(batch) per task;
    re-batch pathological multi-GB files upstream before loading."""
    import json as _json
    import re as _re

    import pandas as pd

    files = spark.read.format("text").option("wholetext", "true").load(path)
    files = files.withColumn("file", F.input_file_name())

    def gen(batches):
        cols = ["doc_id", "sent_idx", "sentence", "batch_id", "anns"]
        for pdf in batches:
            rows = []
            for raw, fname in zip(pdf["value"], pdf["file"]):
                m = _re.search(r"(\d+)\.json$", fname)
                batch = int(m.group(1)) if m else -1
                for pmid, art in _json.loads(raw).items():
                    for i, s in enumerate(art.get("sentences", [])):
                        ents = s.get("entities") or []
                        spans = s.get("entity_spans") or []
                        anns = []
                        if isinstance(ents, dict):
                            for tag in ents:
                                for e, sp in zip(ents[tag], spans.get(tag, [])):
                                    anns.append((e, int(sp[0]), int(sp[1]), tag))
                        else:
                            for e, sp in zip(ents, spans):
                                anns.append((e, int(sp[0]), int(sp[1]), ""))
                        rows.append((pmid, i, s.get("text", ""), batch, anns))
            yield pd.DataFrame(rows, columns=cols)

    return files.select("value", "file").mapInPandas(gen, ANNOTATED_SENT_SCHEMA)


def annotated_mentions(sents: DataFrame) -> DataFrame:
    """Explode the annotation arrays to the engine's mention-row shape
    (url, sent_idx, mention, mention_lc, begin, end, class)."""
    ex = sents.select(
        F.col("doc_id").alias("url"),
        "sent_idx",
        "batch_id",
        F.explode("anns").alias("a"),
    )
    return ex.select(
        "url",
        "sent_idx",
        "batch_id",
        F.col("a.mention").alias("mention"),
        F.lower(F.col("a.mention")).alias("mention_lc"),
        F.col("a.begin").alias("begin"),
        F.col("a.end").alias("end"),
        F.col("a.class").alias("class"),
    )


def articles_json_load(
    spark: SparkSession, path: str, text_field: str = "abstract"
) -> DataFrame:
    """Downloader/bulk-loader article JSON ({pmid: {title, abstract,
    ...}} — data/Lund-Autophagy-1_articles.json is a bundled example)
    -> canonical pages (doc_id, title, text). One task per file; same
    bounded-batch-file assumption as annotated_json_load."""
    import json as _json

    import pandas as pd

    files = spark.read.format("text").option("wholetext", "true").load(path)

    def gen(batches):
        for pdf in batches:
            rows = []
            for raw in pdf["value"]:
                for pmid, art in _json.loads(raw).items():
                    rows.append(
                        (pmid, art.get("title", ""), art.get(text_field, "") or "")
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "title", "text"])

    return files.select("value").mapInPandas(
        gen, "doc_id string, title string, text string"
    )
