"""CRAFT pubannotator-JSON -> IOB2 converter (the last uncovered
reference script: supplementary/experiment_scripts/
CRAFT_preprocessing_spacy.py:20-84).

Reference semantics, re-expressed model-free:

  - one JSON object per file: {"text": ..., "denotations":
    [{"id", "obj", "span": {"begin", "end"}}, ...]}; denotations with
    obj == '_FRAGMENT' are dropped (:66-67);
  - each remaining annotation char-span is EXPANDED to whole-token
    boundaries (spaCy char_span(..., alignment_mode="expand"), :31);
  - the overlap POINTER rule runs in file order over the EXPANDED
    spans (:25-38 quirks kept bit-level: a span whose expanded
    start_char OR end_char falls before the running limiting_value is
    skipped; the limiting_value advances to the accepted span's
    expanded end_char — note file order, NOT sorted order, so an
    out-of-order annotation can be skipped even without a real
    overlap);
  - output is one token stream per document, `token<TAB>iob` with iob
    in B/I/O and NO class suffix (:80-82 writes t.ent_iob_ only),
    whitespace tokens dropped (:81 is_space guard — the pinned
    tokenizer never emits them).

The reference's scispacy tokenizer (en_core_sci_sm) is not installable
here; the default is the engine's pinned offset tokenizer
(functions.text.tokenize_with_offsets) and `tokenizer_factory` plugs a
real model in, exactly like operators.splitter — it must return a
`text -> [(token, begin, end)]` callable and is built once per
partition iterator.

Spark shape: whole-file JSON scan (multiLine) with the doc id from the
file name; the sequential pointer rule is per-document, so conversion
is an Arrow-batched mapInPandas over docs — documents are file-sized
units and the scan parallelizes across files; nothing shuffles.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PUBANN_SCHEMA = (
    "text string, denotations array<struct<id:string, obj:string, "
    "span:struct<begin:long, end:long>>>"
)

CRAFT_TOKENS_SCHEMA = "doc_id string, tok_idx int, token string, label string"


def load_pubannotation(spark: SparkSession, path: str) -> DataFrame:
    """pubannotator JSON files -> (doc_id, text, denotations), doc_id =
    file basename sans extension. Array order inside `denotations` is
    the file order (the pointer rule depends on it)."""
    df = (
        spark.read.option("multiLine", "true")
        .schema(PUBANN_SCHEMA)
        .json(path)
        .withColumn(
            "doc_id",
            F.regexp_extract(F.input_file_name(), r"([^/]+?)(?:\.json)?$", 1),
        )
    )
    return df.select("doc_id", "text", "denotations")


def _expand_span(
    toks: list[tuple[str, int, int]], begin: int, end: int
) -> tuple[int, int, int, int] | None:
    """char [begin, end) -> (first_tok, last_tok+1, start_char,
    end_char) expanded to whole tokens (spaCy alignment_mode='expand');
    None when the range overlaps no token."""
    hit = [
        i for i, (_, b, e) in enumerate(toks) if e > begin and b < end
    ]
    if not hit:
        return None
    lo, hi = hit[0], hit[-1]
    return lo, hi + 1, toks[lo][1], toks[hi][2]


def craft_to_iob2(
    docs: DataFrame,
    tokenizer_factory: Callable[[], Callable[[str], list[tuple[str, int, int]]]]
    | None = None,
) -> DataFrame:
    """(doc_id, text, denotations) -> (doc_id, tok_idx, token, label)
    with label in B/I/O (classless, the reference's output shape)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if tokenizer_factory is not None:
            tokenize = tokenizer_factory()
        else:
            from easyner_spark.functions.text import tokenize_with_offsets

            tokenize = tokenize_with_offsets
        cols = ["doc_id", "tok_idx", "token", "label"]
        for pdf in batches:
            rows = []
            for doc_id, text, dens in zip(
                pdf["doc_id"], pdf["text"], pdf["denotations"]
            ):
                toks = tokenize(text or "")
                labels = ["O"] * len(toks)
                limiting = 0  # reference :26 pointer for overlaps
                for d in dens if dens is not None else []:
                    if d["obj"] == "_FRAGMENT":
                        continue
                    span = _expand_span(
                        toks, int(d["span"]["begin"]), int(d["span"]["end"])
                    )
                    if span is None:
                        continue
                    lo, hi, start_char, end_char = span
                    if start_char < limiting or end_char < limiting:
                        continue  # reference :34-35
                    limiting = end_char
                    labels[lo] = "B"
                    for i in range(lo + 1, hi):
                        labels[i] = "I"
                # reference :81 is_space guard: spans/labels are
                # computed over the FULL token stream (a real spaCy
                # tokenizer emits whitespace tokens and char_span
                # expansion sees them), but whitespace tokens are
                # dropped from the OUTPUT lines; tok_idx numbers the
                # emitted stream, matching the reference's line order.
                # The pinned tokenizer never emits them (no-op there).
                rows.extend(
                    (doc_id, j, t[0], lab)
                    for j, (t, lab) in enumerate(
                        (t, lab)
                        for t, lab in zip(toks, labels)
                        if t[0].strip()
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return docs.mapInPandas(run, CRAFT_TOKENS_SCHEMA)


def craft_iob2_lines(tokens: DataFrame) -> DataFrame:
    """Token table -> the reference's flat `token<TAB>iob` lines in
    token order, one row per line plus doc ordering columns (callers
    write with .sort + text sink)."""
    return tokens.select(
        "doc_id",
        "tok_idx",
        F.concat_ws("\t", "token", "label").alias("line"),
    )
