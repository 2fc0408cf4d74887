"""Token-level IOB2 evaluation (SURVEY.md §2.6 A6 + §2.5 J6).

Reference: scripts/metrics.py:10-44 zips aligned gold/pred IOB2 files
(`token label` lines, blank line between sentences), checks equal
length + first-token mismatches, and feeds seqeval's
classification_report (entity-level: an entity is correct iff its full
B/I span and class match exactly). scripts/error_detection.py:30-45 is
the same zip emitting mismatching spans in context.

Spark shape: IOB2 span reconstruction is window logic — lag() to find
B/I boundaries, a running sum of span-starts as the span id (SURVEY
§2.7 W1-pattern) — followed by an exact span equi-join gold<->pred and
the shared prf()/corpus_rollup() from operators.evaluate. Eval corpora
are small (thousands of sentences); the windows partition by sequence
id so nothing big ever sits in one partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from easyner_spark.operators.evaluate import corpus_rollup, prf

TOKENS_SCHEMA = "seq_id int, tok_idx int, token string, label string"


def _parse_columned_lines(
    spark: SparkSession, path: str, label_cols: list[str]
) -> DataFrame:
    """Shared mechanics of the whitespace-columned token-line formats:
    `token <label>...` lines, blank line = sentence boundary ->
    (seq_id, tok_idx, token, *label_cols).

    Line order matters, so the file is read single-partition (these
    eval files are small by construction — the reference zips them
    whole into driver memory, scripts/metrics.py:16-18)."""
    lines = (
        spark.read.text(path)
        .coalesce(1)
        .withColumn("line_no", F.monotonically_increasing_id())
        .select("line_no", F.trim("value").alias("line"))
    )
    w = Window.orderBy("line_no")
    seq = F.sum(F.when(F.col("line") == "", 1).otherwise(0)).over(w)
    toks = (
        lines.withColumn("seq_id", seq.cast("int"))
        .where(F.col("line") != "")
        .withColumn("token", F.split("line", r"\s+").getItem(0))
    )
    for i, col in enumerate(label_cols):
        toks = toks.withColumn(col, F.split("line", r"\s+").getItem(i + 1))
    tw = Window.partitionBy("seq_id").orderBy("line_no")
    return toks.select(
        "seq_id",
        (F.row_number().over(tw) - 1).alias("tok_idx"),
        "token",
        *label_cols,
    )


def parse_iob2_lines(spark: SparkSession, path: str) -> DataFrame:
    """`token label` lines, blank line = sentence boundary ->
    (seq_id, tok_idx, token, label)."""
    return _parse_columned_lines(spark, path, ["label"])


def parse_flair_lines(spark: SparkSession, path: str) -> DataFrame:
    """Flair prediction output (supplementary/experiment_scripts/
    Flair_prediction_evaluation.py:10-12): `token gold pred` 3-column
    lines, blank line = sentence boundary ->
    (seq_id, tok_idx, token, label_true, label_pred) — the exact input
    shape of :func:`error_regions` and, via the per-stream projections,
    of :func:`seqeval_report`/:func:`iob_spans`."""
    return _parse_columned_lines(spark, path, ["label_true", "label_pred"])


def iob_spans(tokens: DataFrame) -> DataFrame:
    """IOB2 -> entity spans (seq_id, class, begin, end) with [begin,
    end) token-index convention.

    Start rule (seqeval IOB2 semantics): a token starts an entity when
    its label is B-*, or I-* not preceded by a same-class B-*/I-*.
    """
    cls = F.when(
        F.col("label").rlike("^[BI]-"), F.substring("label", 3, 1000)
    ).otherwise(F.lit(""))
    w = Window.partitionBy("seq_id").orderBy("tok_idx")
    t = (
        tokens.withColumn("cls", cls)
        .withColumn("tag", F.substring("label", 1, 1))
        .withColumn("prev_tag", F.lag("tag").over(w))
        .withColumn("prev_cls", F.lag("cls").over(w))
    )
    is_start = F.when(F.col("tag") == "B", 1).when(
        (F.col("tag") == "I")
        & (
            F.col("prev_tag").isNull()
            | (F.col("prev_tag") == "O")
            | (F.col("prev_cls") != F.col("cls"))
        ),
        1,
    ).otherwise(0)
    t = t.withColumn("span_id", F.sum(is_start).over(w))
    return (
        t.where(F.col("tag") != "O")
        .groupBy("seq_id", "span_id", "cls")
        .agg(F.min("tok_idx").alias("begin"), (F.max("tok_idx") + 1).alias("end"))
        .select("seq_id", F.col("cls").alias("class"), "begin", "end")
    )


def token_zip_check(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """J6: positional alignment check of two token streams
    (reference scripts/metrics.py:16-33: equal-length assert + token
    mismatch warnings). Full-outer join on (seq_id, tok_idx); rows
    where either side is missing or tokens differ are the mismatches.
    """
    p = pred.select("seq_id", "tok_idx", F.col("token").alias("p_tok"))
    g = gold.select("seq_id", "tok_idx", F.col("token").alias("g_tok"))
    j = p.join(g, ["seq_id", "tok_idx"], "full_outer")
    return j.where(
        F.col("p_tok").isNull()
        | F.col("g_tok").isNull()
        | (F.col("p_tok") != F.col("g_tok"))
    )


def seqeval_class_metrics(pred_tokens: DataFrame, gold_tokens: DataFrame) -> DataFrame:
    """Entity-level P/R/F1 per class from aligned IOB2 token tables
    (seqeval classification_report semantics: exact span + class)."""
    p = iob_spans(pred_tokens)
    g = iob_spans(gold_tokens)
    keys = ["seq_id", "class", "begin", "end"]
    tp = (
        p.join(g, keys, "left_semi").groupBy("class").agg(F.count("*").alias("tp"))
    )
    fp = (
        p.join(g, keys, "left_anti").groupBy("class").agg(F.count("*").alias("fp"))
    )
    fn = (
        g.join(p, keys, "left_anti").groupBy("class").agg(F.count("*").alias("fn"))
    )
    base = p.select("class").union(g.select("class")).distinct()
    counts = (
        base.join(tp, "class", "left")
        .join(fp, "class", "left")
        .join(fn, "class", "left")
        .na.fill(0, ["tp", "fp", "fn"])
    )
    return prf(counts)


def seqeval_report(pred_tokens: DataFrame, gold_tokens: DataFrame) -> DataFrame:
    """Corpus-level macro/micro/weighted rollup (mirrors the shape of
    the span-tolerant evaluator's corpus_rollup, reference :418-498)."""
    return corpus_rollup(seqeval_class_metrics(pred_tokens, gold_tokens))


CO_OCCUR_SCHEMA = (
    "seq_id int, has_cooccurrence boolean, entities array<string>, text string"
)


def co_occurrence(tokens: DataFrame) -> DataFrame:
    """T6 compat: the reference's co-occurrence extractor
    (entity_parser.py:4-55) over (seq_id, tok_idx, token, label) rows.

    Reproduced bit-exactly, quirks included:
      - detokenize: a label containing 'X' merges `token[2:]` into the
        previous word (WordPiece '##' convention, :4-16);
      - 'B' while already inside an entity keeps accumulating WITHOUT
        a space separator (:26-28 has no in_entity reset);
      - an entity still open at sequence end is DROPPED (the loop only
        appends on an 'O', :34-38);
      - entity surfaces get the ' - '/' , ' repairs, the joined text
        gets the 9-step replace chain (:38-53).

    Grouped applyInPandas per sequence — groups are sentence-sized and
    the (seq_id) grouping reuses the pipeline's partitioning; this is
    a compat/eval boundary, not a hot path."""
    import pandas as pd

    from easyner_spark.functions.text import detok_fixups_py, entity_fixups_py

    def _per_seq(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("tok_idx", kind="stable")
        pairs = list(zip(pdf["token"], pdf["label"]))
        # detokenize (entity_parser.py:4-16)
        labels, words = [], []
        for token, label in pairs:
            if "X" not in label:
                words.append(token)
                labels.append(label)
            elif words:
                words[-1] = words[-1] + token[2:]
        # co_occurrence_extractor (entity_parser.py:19-55)
        entities: list[str] = []
        entity, in_entity = "", False
        for label, word in zip(labels, words):
            if "B" in label:
                entity = entity + word
                in_entity = True
            elif in_entity:
                if "I" in label:
                    entity = entity + " " + word
                elif "O" in label:
                    in_entity = False
                    entities.append(entity_fixups_py(entity))
                    entity = ""
        text = detok_fixups_py(" ".join(words))
        return pd.DataFrame(
            {
                "seq_id": [int(pdf["seq_id"].iloc[0])],
                "has_cooccurrence": [len(entities) >= 2],
                "entities": [entities],
                "text": [text],
            }
        )

    return tokens.groupBy("seq_id").applyInPandas(_per_seq, CO_OCCUR_SCHEMA)


ERROR_REGION_SCHEMA = (
    "seq_id int, region_idx int, word string, "
    "true_tags array<string>, pred_tags array<string>, text string"
)


def error_regions(tokens: DataFrame) -> DataFrame:
    """NER error inspection (reference scripts/error_detection.py:
    8-95): zip the gold and predicted IOB streams per sentence and
    emit the disagreement regions.

    Input: (seq_id, tok_idx, token, label_true, label_pred) — build it
    by joining two token tables on (seq_id, tok_idx), or from
    token_zip_check output.

    Reference semantics, quirks included (:65-88):
      - a region OPENS at the first token where either stream says B
        (leading I tokens before any B are skipped);
      - while open, every token where either stream is non-O joins the
        region (a both-O token closes it);
      - a closed region is emitted only when the tag sequences differ;
      - a region still open at sentence end is DROPPED (no flush after
        the loop — same trailing-drop family as the co-occurrence
        extractor);
      - output: one row per mismatched region with the joined surface
        and both tag lists, plus the full sentence text.

    Grouped applyInPandas per sequence (sentence-sized groups; eval
    tooling, not a hot path)."""
    import pandas as pd

    def _per_seq(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("tok_idx", kind="stable")
        text = " ".join(pdf["token"])
        rows = []
        cur_w: list[str] = []
        cur_t: list[str] = []
        cur_p: list[str] = []
        cont = False
        for word, tt, tp in zip(pdf["token"], pdf["label_true"], pdf["label_pred"]):
            if tt != "O" or tp != "O":
                if tt == "B" or tp == "B":
                    cont = True
                if cont:
                    cur_w.append(word)
                    cur_t.append(tt)
                    cur_p.append(tp)
            if tt == "O" and tp == "O":
                cont = False
                if cur_w:
                    if cur_t != cur_p:
                        rows.append((" ".join(cur_w), list(cur_t), list(cur_p)))
                    cur_w, cur_t, cur_p = [], [], []
        out = [
            (int(pdf["seq_id"].iloc[0]), i, w, t, p, text)
            for i, (w, t, p) in enumerate(rows)
        ]
        return pd.DataFrame(
            out,
            columns=["seq_id", "region_idx", "word", "true_tags", "pred_tags", "text"],
        )

    return tokens.groupBy("seq_id").applyInPandas(_per_seq, ERROR_REGION_SCHEMA)
