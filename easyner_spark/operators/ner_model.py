"""Model-based NER (SURVEY.md §2.4 T5): BERT-style token
classification behind the SAME mention-table interface as dict_ner.

Reference: scripts/ner_biobert.py:9-17 + scripts/ner_main.py:90-116
load a HF AutoModelForTokenClassification pipeline (aggregation
'max', model_max_length=192) and predict sentence-at-a-time;
scripts/ner_inference.py:10-80 is the ONNX variant (max_length=128,
IOB label decode); per-sentence exceptions yield an empty prediction
(scripts/ner_main.py:100-108 — a deliberate semantic for
non-tokenizable input, kept here, with skip counts surfaced instead of
swallowed).

Spark shape: an Arrow-batched `mapInPandas` whose predictor is built
ONCE per partition iterator (fixing the reference's biggest CPU waste,
the per-text model reload noted in SURVEY §4.1) and fed SENTENCE
BATCHES (the reference predicts one sentence at a time — batching is
the single largest GPU/CPU win and changes no outputs). The heavy
libraries (transformers/torch/onnxruntime) are NOT in this
environment, so `hf_predictor_factory` import-gates them;
`regex_predictor_factory` is a deterministic, dependency-free stand-in
with the same (text batch) -> [mention dicts] contract used by tests
and benches.

Model distribution at cluster scale: ship weights via an archive on
distributed storage + `spark.files`/`--archives`, loaded lazily per
executor — never broadcast tensors through the driver.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from easyner_spark.operators.ner_dict import MENTION_SCHEMA

# predictor: list[str] -> list[list[dict(mention, begin, end, score)]]
Predictor = Callable[[list[str]], list[list[dict]]]

MODEL_MENTION_SCHEMA = MENTION_SCHEMA + ", score double"


def regex_predictor_factory(
    pattern: str = r"\b[A-Z][A-Za-z0-9]*\d[A-Za-z0-9]*\b",
    cls: str = "gene",
) -> Callable[[], Predictor]:
    """Deterministic stand-in 'model': gene-symbol-shaped tokens
    (capitalized, containing a digit — e.g. TSC1, AKT1) with a fake
    confidence derived from match length. Same contract as the HF
    path, zero dependencies."""

    def build() -> Predictor:
        rx = re.compile(pattern)

        def predict(texts: list[str]) -> list[list[dict]]:
            out = []
            for t in texts:
                ms = [
                    {
                        "mention": m.group(0),
                        "begin": m.start(),
                        "end": m.end(),
                        "class": cls,
                        "score": round(0.5 + min(len(m.group(0)), 10) / 20, 3),
                    }
                    for m in rx.finditer(t or "")
                ]
                out.append(ms)
            return out

        return predict

    return build


def hf_predictor_factory(
    model_path: str,
    cls: str,
    max_length: int = 192,
    batch_size: int = 32,
) -> Callable[[], Predictor]:
    """HF transformers token-classification predictor (reference
    scripts/ner_biobert.py:9-17). Import-gated: raises ImportError with
    a clear message when transformers/torch are absent (they are not in
    this sandbox; the factory body mirrors the reference call shape so
    the integration is a drop-in on a real cluster)."""

    def build() -> Predictor:
        try:
            from transformers import (  # noqa: F401
                AutoModelForTokenClassification,
                AutoTokenizer,
                pipeline,
            )
        except ImportError as e:  # pragma: no cover - env without HF
            raise ImportError(
                "transformers/torch not available in this environment; "
                "use regex_predictor_factory or install the model stack"
            ) from e
        tok = AutoTokenizer.from_pretrained(model_path, model_max_length=max_length)
        model = AutoModelForTokenClassification.from_pretrained(model_path)
        nlp = pipeline(
            "ner", model=model, tokenizer=tok, aggregation_strategy="max"
        )

        def predict(texts: list[str]) -> list[list[dict]]:
            preds = nlp(list(texts), batch_size=batch_size)
            out = []
            for ent_list in preds:
                out.append(
                    [
                        {
                            "mention": e["word"],
                            "begin": int(e["start"]),
                            "end": int(e["end"]),
                            "class": cls,
                            "score": float(e["score"]),
                        }
                        for e in ent_list
                    ]
                )
            return out

        return predict

    return build


# the reference's ONNX label inventory (ner_inference.py:89)
ONNX_LABELS = ["[PAD]", "B", "I", "O", "X", "[CLS]", "[SEP]"]


def decode_token_labels(
    pairs: list[tuple[str, str]], cls: str = "entity"
) -> list[dict]:
    """(wordpiece token, IOB label) pairs -> mention dicts, using the
    reference's detokenize + entity-accumulation semantics bit-exactly
    (entity_parser.py:4-38 quirks preserved: a label containing 'X'
    merges token[2:] into the previous word; 'B' while already inside
    an entity concatenates WITHOUT a space; an entity still open at
    sequence end is dropped; surfaces get the ' - '/' , ' repairs).

    begin/end are WORD indices into the detokenized stream — the
    reference's ONNX path (ner_inference.py:59-80) stops at token-label
    pairs and never recovers original char offsets, so none exist to
    report. Callers needing char spans use the HF path."""
    from easyner_spark.functions.text import entity_fixups_py

    labels: list[str] = []
    words: list[str] = []
    for token, label in pairs:
        if "X" not in label:
            words.append(token)
            labels.append(label)
        elif words:
            words[-1] = words[-1] + token[2:]
    mentions: list[dict] = []
    entity, in_entity, start = "", False, -1
    for i, (label, word) in enumerate(zip(labels, words)):
        if "B" in label:
            if not in_entity:
                start = i
            entity = entity + word
            in_entity = True
        elif in_entity:
            if "I" in label:
                entity = entity + " " + word
            elif "O" in label:
                mentions.append(
                    {
                        "mention": entity_fixups_py(entity),
                        "begin": start,
                        "end": i,
                        "class": cls,
                        "score": 1.0,
                    }
                )
                entity, in_entity, start = "", False, -1
    return mentions


def onnx_predictor_factory(
    model_dir: str,
    model_name: str,
    model_vocab: str,
    labels: list[str] | None = None,
    cls: str = "entity",
    max_length: int = 128,
    session_factory: Callable | None = None,
    tokenizer_factory: Callable | None = None,
) -> Callable[[], Predictor]:
    """ONNX-runtime token-classification predictor mirroring the
    reference's NERInferenceSession_biobert_onnx (ner_inference.py:
    25-80): BertTokenizer vocab, max_length=128 padded encode, the
    graph's pinned input-feed names, labels[index] decode, then the
    bit-parity IOB detokenizer (`decode_token_labels`).

    Import-gated: onnxruntime/transformers are absent in this sandbox,
    so `session_factory`/`tokenizer_factory` inject substitutes — the
    tests drive the full encode/run/decode path with a fake session,
    and a real deployment passes nothing and gets the genuine stack.
    Scores are 1.0: the reference graph emits label ids, not
    probabilities (ner_inference.py:62-73)."""
    labels = list(labels) if labels is not None else list(ONNX_LABELS)

    def build() -> Predictor:
        import os

        import numpy as np

        if (session_factory is None) != (tokenizer_factory is None):
            raise ValueError(
                "session_factory and tokenizer_factory must be passed "
                "together (injecting only one would silently mix a fake "
                "with the real model stack)"
            )
        if session_factory is not None and tokenizer_factory is not None:
            session = session_factory()
            tokenizer = tokenizer_factory()
        else:
            try:
                import onnxruntime
                from transformers import BertTokenizer
            except ImportError as e:  # pragma: no cover - env without ONNX
                raise ImportError(
                    "onnxruntime/transformers not available in this "
                    "environment; pass session_factory/tokenizer_factory "
                    "or install the model stack"
                ) from e
            # reference symlink allowance (:22-23); realpath resolves
            # relative link targets against the link's own directory
            # (raw readlink would resolve them against the CWD)
            model_path = os.path.realpath(os.path.join(model_dir, model_name))
            session = onnxruntime.InferenceSession(model_path)
            onnxruntime.set_default_logger_severity(3)
            tokenizer = BertTokenizer.from_pretrained(model_vocab)

        pad_token = tokenizer.convert_ids_to_tokens(0)

        def predict(texts: list[str]) -> list[list[dict]]:
            out = []
            for seq in texts:
                encoded = tokenizer.encode_plus(
                    seq,
                    max_length=max_length,
                    add_special_tokens=True,
                    return_token_type_ids=True,
                    padding="max_length",
                    truncation=True,
                    return_attention_mask=True,
                    return_tensors="np",
                )
                tokens = tokenizer.convert_ids_to_tokens(encoded["input_ids"][0])
                for i, token in enumerate(tokens):
                    if token == pad_token:  # truncate at first [PAD] (:41-44)
                        tokens = tokens[:i]
                        break
                _, logits, _ = session.run(
                    [],
                    {
                        "segment_ids_1:0": np.asarray(
                            encoded["token_type_ids"], dtype=np.int32
                        ),
                        "input_mask_1_raw_output___9:0": np.asarray(
                            encoded["attention_mask"], dtype=np.int32
                        ),
                        "input_ids_1:0": np.asarray(
                            encoded["input_ids"], dtype=np.int32
                        ),
                        "label_ids_1:0": np.asarray([0], dtype=np.int32),
                    },
                )
                predicted = [labels[int(i)] for i in logits[0]]
                out.append(decode_token_labels(list(zip(tokens, predicted)), cls))
            return out

        return predict

    return build


def model_ner(
    sentences: DataFrame,
    predictor_factory: Callable[[], Predictor],
    text_col: str = "sentence",
    batch_size: int = 64,
) -> DataFrame:
    """sentences (url, sent_idx, sentence) -> mention table with score.

    Output schema is dict_ner's + `score`, so every downstream operator
    (merger, NEL, triples, evaluator) consumes either path unchanged —
    the reference's multi-model workflow (§3.2) with no filename
    contract. Failed sentences emit no mentions and are counted in the
    `_skipped` accumulator-style metrics column of the companion
    `model_ner_metrics` (the reference's try/except -> [] semantic,
    scripts/ner_main.py:100-108, made observable)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        predict = predictor_factory()
        cols = [
            "url", "sent_idx", "mention", "mention_lc",
            "begin", "end", "begin_tok", "end_tok", "class", "score",
        ]
        for pdf in batches:
            rows = []
            texts = pdf[text_col].fillna("").tolist()
            urls = pdf["url"].tolist()
            idxs = pdf["sent_idx"].tolist()
            for off in range(0, len(texts), batch_size):
                chunk = texts[off : off + batch_size]
                try:
                    preds = predict(chunk)
                except Exception:
                    # batch-level failure -> retry one-by-one so a single
                    # poison sentence only loses itself
                    preds = []
                    for t in chunk:
                        try:
                            preds.append(predict([t])[0])
                        except Exception:
                            preds.append([])
                for j, ents in enumerate(preds):
                    u, si = urls[off + j], idxs[off + j]
                    for e in ents:
                        rows.append(
                            (
                                u, si, e["mention"], e["mention"].lower(),
                                e["begin"], e["end"], -1, -1, e["class"],
                                e.get("score", 1.0),
                            )
                        )
            yield pd.DataFrame(rows, columns=cols)

    pruned = sentences.select("url", "sent_idx", text_col)
    return pruned.mapInPandas(run, MODEL_MENTION_SCHEMA)


def score_filter(mentions: DataFrame, min_score: float) -> DataFrame:
    """Confidence threshold (the knob the reference lacks — its BERT
    path keeps every aggregated prediction)."""
    return mentions.where(F.col("score") >= min_score)
