"""PubTator export (SURVEY.md K5, W2) and compat span conversion.

Reference: convert_easyner_output_json_to_pubtator.py:34-57, 97-130 —
re-assembles the document text by space-joining sentences, shifts each
sentence-local span to document offsets by accumulating
`len(sentence) + 1` per preceding sentence, then writes
`id|t|title` / `id|a|text` lines plus one
`id TAB start TAB end TAB mention TAB class TAB -1` line per mention.

Spark shape: the running offset is a classic window frame —
sum(length + 1) over (partition by url order by sent_idx rows between
unbounded preceding and 1 preceding) — one shuffle on url, then pure
projections; the line rendering is concat_ws, fully JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sentence_doc_offsets(sentences: DataFrame) -> DataFrame:
    """sentences + `doc_offset`: char offset of each sentence within the
    space-joined document text."""
    w = (
        Window.partitionBy("url")
        .orderBy("sent_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return sentences.withColumn(
        "doc_offset",
        F.coalesce(F.sum(F.length("sentence") + 1).over(w), F.lit(0)).cast("int"),
    )


def mentions_with_doc_spans(mentions: DataFrame, sentences: DataFrame) -> DataFrame:
    """mention spans shifted to document offsets (doc_begin, doc_end)."""
    offs = sentence_doc_offsets(sentences).select("url", "sent_idx", "doc_offset")
    return (
        mentions.join(offs, ["url", "sent_idx"])
        .withColumn("doc_begin", F.col("begin") + F.col("doc_offset"))
        .withColumn("doc_end", F.col("end") + F.col("doc_offset"))
        .drop("doc_offset")
    )


def doc_text(sentences: DataFrame) -> DataFrame:
    """Space-joined document text (reference :41-49). sort_array on the
    (sent_idx, sentence) struct keeps the aggregation order-insensitive
    to partitioning — deterministic at any parallelism."""
    return sentences.groupBy("url").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("sent_idx", "sentence"))),
                lambda s: s["sentence"],
            ),
        ).alias("text")
    )


def to_pubtator_lines(
    mentions: DataFrame,
    sentences: DataFrame,
    titles: DataFrame | None = None,
    inclusive_end: bool = False,
) -> DataFrame:
    """(url, line_no, line) export table; write with
    df.orderBy(...).write.text after a coalesce, or keep as a table.

    `inclusive_end=True` applies the reference dictionary-path span
    quirk (scripts/ner_main.py:80 stores end_char - 1) at this boundary
    only — engine-internal spans stay [begin, end) exclusive.
    """
    texts = doc_text(sentences)
    t_lines = (
        (titles if titles is not None else texts.select("url", F.lit("").alias("title")))
        .select(
            "url",
            F.lit(0).alias("line_no"),
            F.concat_ws("|", "url", F.lit("t"), "title").alias("line"),
        )
    )
    a_lines = texts.select(
        "url", F.lit(1).alias("line_no"), F.concat_ws("|", "url", F.lit("a"), "text").alias("line")
    )
    spans = mentions_with_doc_spans(mentions, sentences)
    end_col = F.col("doc_end") - 1 if inclusive_end else F.col("doc_end")
    m_lines = spans.select(
        "url",
        (F.lit(2) + F.col("sent_idx")).alias("line_no"),
        F.concat_ws(
            "\t", "url", F.col("doc_begin"), end_col, "mention", "class", F.lit("-1")
        ).alias("line"),
    )
    return t_lines.unionByName(a_lines).unionByName(m_lines)


def pubtator_annotations(spark, path: str):
    """Parse PubTator ANNOTATION lines (doc\\tbegin\\tend\\tmention\\t
    class[\\tidentifier]) into rows; text lines (|t|/|a|, < 5 tab
    fields) are skipped — load those with sources.loaders.pubtator_load.
    A missing identifier gets the reference's dummy '-1'
    (preprocess_pubtatorformat.py:64-66)."""
    lines = spark.read.text(path)
    # reference parity: line.strip() BEFORE splitting — a trailing tab
    # must not create a phantom empty identifier field
    parts = F.split(F.regexp_replace("value", r"(?U)^\s+|\s+$", ""), "\t")
    anns = lines.where(F.size(parts) >= 5).select(
        parts.getItem(0).alias("doc_id"),
        parts.getItem(1).cast("int").alias("begin"),
        parts.getItem(2).cast("int").alias("end"),
        parts.getItem(3).alias("mention"),
        parts.getItem(4).alias("class"),
        F.coalesce(F.get(parts, 5), F.lit("-1")).alias("identifier"),
    )
    return anns


def _remap_table(mapping):
    """(old, new) mapping normalized for the broadcast join. Duplicate
    old-class rows are deduped (max new-class wins — the reference's
    dict is last-file-line-wins, an order a DataFrame doesn't have;
    max is the deterministic stand-in) so a dirty TSV can't duplicate
    fact rows through the join."""
    return (
        mapping.select(
            F.col(mapping.columns[0]).alias("__old"),
            F.col(mapping.columns[1]).alias("__new"),
        )
        .groupBy("__old")
        .agg(F.max("__new").alias("__new"))
    )


def remap_annotation_classes(anns, mapping):
    """Entity-class remap against a (old_class, new_class) table
    (preprocess_pubtatorformat.py:24-70): matched classes rewrite
    (the reference strips the class before lookup), unmatched pass
    through. Broadcast left join — no shuffle of the fact side."""
    m = _remap_table(mapping)
    return (
        anns.join(F.broadcast(m), F.trim(anns["class"]) == m["__old"], "left")
        .withColumn("class", F.coalesce(F.col("__new"), F.col("class")))
        .drop("__old", "__new")
    )


def preprocess_pubtator_lines(spark, path: str, mapping=None):
    """Byte-level twin of the reference's file rewrite: text lines
    (< 5 tab fields) pass through verbatim; annotation lines gain the
    dummy '-1' identifier when missing and remap their class. Emits
    (file, line_no, line) so callers can write back in input order."""
    lines = (
        spark.read.text(path)
        .withColumn("file", F.input_file_name())
        .withColumn("line_no", F.monotonically_increasing_id())
    )
    # reference parity: split the STRIPPED line (a trailing tab must
    # not read as an empty identifier); text lines pass through with
    # their original bytes
    parts = F.split(F.regexp_replace("value", r"(?U)^\s+|\s+$", ""), "\t")
    is_ann = F.size(parts) >= 5
    # F.get: NULL (not ANSI error) when the identifier is absent
    ident = F.coalesce(F.get(parts, 5), F.lit("-1"))
    cls = F.get(parts, 4)  # NULL on text lines (ANSI-safe)
    if mapping is not None:
        m = _remap_table(mapping)
        lines = lines.join(
            F.broadcast(m), F.trim(cls) == m["__old"], "left"
        )
        cls = F.coalesce(F.col("__new"), cls)
    # keep fields BEYOND the identifier verbatim (the reference joins
    # the whole split list back; extended corpora carry extra columns)
    rebuilt = F.array_join(
        F.concat(
            F.slice(parts, 1, 4),
            F.array(cls, ident),
            F.when(F.size(parts) > 6, F.slice(parts, 7, F.size(parts) - 6))
            .otherwise(F.array().cast("array<string>")),
        ),
        "\t",
    )
    out = lines.select(
        "file",
        "line_no",
        F.when(is_ann, rebuilt).otherwise(F.col("value")).alias("line"),
    )
    return out
