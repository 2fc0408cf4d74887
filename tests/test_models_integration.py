"""`pytest -m models` — the real-model integration lane (VERDICT r3
next-step #5).

Everything here drives the GENUINE optional stacks (`pip install
'.[models]'`, see pyproject.toml) end-to-end against the reference's
semantics, and auto-SKIPS (never silently passes) where a stack is
absent. In this sandbox all of these skip — the skip reasons document
exactly what to install:

  * spaCy lane: `split_sentences_udf(spacy_splitter_factory())` must
    be byte-identical to a reference-style raw loop over
    `en_core_web_sm` (`[str(s) for s in nlp(text).sents]`,
    scripts/splitter.py:18-26) on the synthetic fixture corpus.
  * NLTK lane: same for `sent_tokenize` (scripts/splitter.py:13-15).
  * ONNX lane: `onnx_predictor_factory` (no injected fakes — the real
    onnxruntime + BertTokenizer stack, scripts/ner_inference.py:25-80)
    must reproduce a reference-style raw encode/run/decode loop over
    the same graph. Needs EASYNER_ONNX_MODEL_DIR / _MODEL / _VOCAB to
    point at a real exported model.
  * HF torch lane: the biobert_predictor_factory pipeline twin vs a
    raw `transformers` pipeline call (scripts/ner_biobert.py:9-17);
    needs EASYNER_HF_MODEL naming a token-classification checkpoint.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

pytestmark = pytest.mark.models

_HAS_SPACY = importlib.util.find_spec("spacy") is not None
_HAS_NLTK = importlib.util.find_spec("nltk") is not None
_HAS_ONNX = (
    importlib.util.find_spec("onnxruntime") is not None
    and importlib.util.find_spec("transformers") is not None
)
_HAS_TORCH = (
    importlib.util.find_spec("torch") is not None
    and importlib.util.find_spec("transformers") is not None
)

ONNX_DIR = os.environ.get("EASYNER_ONNX_MODEL_DIR", "")
ONNX_MODEL = os.environ.get("EASYNER_ONNX_MODEL", "model.onnx")
ONNX_VOCAB = os.environ.get("EASYNER_ONNX_VOCAB", "")
HF_MODEL = os.environ.get("EASYNER_HF_MODEL", "")


def _fixture_texts(n: int = 40) -> list[tuple[str, str]]:
    from easyner_spark.fixtures import generate

    fx = generate(n_docs=n, with_gold=False)
    return [
        (r.url, r.text) for r in fx.pages.itertuples() if r.lang == "en"
    ]


def _spacy_model_present() -> bool:
    if not _HAS_SPACY:
        return False
    import spacy

    try:
        spacy.load("en_core_web_sm")
        return True
    except OSError:
        return False


@pytest.mark.skipif(
    not _spacy_model_present(),
    reason="needs `pip install '.[models]'` + "
    "`python -m spacy download en_core_web_sm`",
)
def test_spacy_splitter_live_parity(spark):  # pragma: no cover - needs spaCy
    """Operator output == a reference-style raw spaCy loop, byte for
    byte, on the synthetic corpus (reference scripts/splitter.py:18-26:
    sentences are `str(span)` over `nlp(text).sents`)."""
    import spacy

    from easyner_spark.operators.splitter import (
        spacy_splitter_factory,
        split_sentences_udf,
    )

    rows = _fixture_texts()
    nlp = spacy.load("en_core_web_sm")
    expected = {
        url: [str(s) for s in nlp(text).sents] for url, text in rows
    }
    pages = spark.createDataFrame(rows, "url string, text string")
    out = split_sentences_udf(pages, spacy_splitter_factory()).collect()
    got: dict[str, list[str]] = {}
    for r in sorted(out, key=lambda r: (r.url, r.sent_idx)):
        got.setdefault(r.url, []).append(r.sentence)
    for url, sents in expected.items():
        assert got.get(url, []) == sents, url


@pytest.mark.skipif(
    not _HAS_NLTK, reason="needs `pip install '.[models]'` (nltk + punkt)"
)
def test_nltk_splitter_live_parity(spark):  # pragma: no cover - needs NLTK
    from nltk.tokenize import sent_tokenize

    from easyner_spark.operators.splitter import (
        nltk_splitter_factory,
        split_sentences_udf,
    )

    rows = _fixture_texts()
    expected = {url: sent_tokenize(text) for url, text in rows}
    pages = spark.createDataFrame(rows, "url string, text string")
    out = split_sentences_udf(pages, nltk_splitter_factory()).collect()
    got: dict[str, list[str]] = {}
    for r in sorted(out, key=lambda r: (r.url, r.sent_idx)):
        got.setdefault(r.url, []).append(r.sentence)
    for url, sents in expected.items():
        assert got.get(url, []) == sents, url


@pytest.mark.skipif(
    not (_HAS_ONNX and ONNX_DIR and ONNX_VOCAB),
    reason="needs `pip install '.[models]'` + EASYNER_ONNX_MODEL_DIR/"
    "EASYNER_ONNX_VOCAB pointing at an exported token-classification "
    "graph (reference scripts/ner_inference.py:25-80)",
)
def test_onnx_factory_live_parity():  # pragma: no cover - needs ONNX model
    """The factory's encode/run/decode must reproduce a raw
    reference-style loop over the same graph: BertTokenizer
    max_length=128 padded encode, pinned feed names, labels[argmax]
    decode, IOB detokenize."""
    import numpy as np
    import onnxruntime
    from transformers import BertTokenizer

    from easyner_spark.operators.ner_model import (
        ONNX_LABELS,
        decode_token_labels,
        onnx_predictor_factory,
    )

    texts = [t for _, t in _fixture_texts(10)][:20]
    predictor = onnx_predictor_factory(ONNX_DIR, ONNX_MODEL, ONNX_VOCAB)()
    got = predictor(texts)

    model_path = os.path.realpath(os.path.join(ONNX_DIR, ONNX_MODEL))
    session = onnxruntime.InferenceSession(model_path)
    tokenizer = BertTokenizer.from_pretrained(ONNX_VOCAB)
    feed_names = [i.name for i in session.get_inputs()]
    for text, mentions in zip(texts, got):
        enc = tokenizer(
            text,
            truncation=True,
            padding="max_length",
            max_length=128,
            return_tensors="np",
        )
        feeds = {n: enc[n].astype(np.int64) for n in feed_names if n in enc}
        (logits,) = session.run(None, feeds)
        ids = logits[0].argmax(-1) if logits.ndim == 3 else logits[0]
        toks = tokenizer.convert_ids_to_tokens(enc["input_ids"][0])
        pairs = [
            (t, ONNX_LABELS[int(i)])
            for t, i in zip(toks, ids)
            if t not in ("[CLS]", "[SEP]", tokenizer.pad_token)
        ]
        assert decode_token_labels(pairs, "entity") == mentions


@pytest.mark.skipif(
    not (_HAS_TORCH and HF_MODEL),
    reason="needs `pip install '.[models]'` + EASYNER_HF_MODEL naming a "
    "token-classification checkpoint (reference scripts/ner_biobert.py:9-17)",
)
def test_hf_pipeline_live_parity():  # pragma: no cover - needs torch model
    from transformers import pipeline

    from easyner_spark.operators.ner_model import hf_predictor_factory

    texts = [t for _, t in _fixture_texts(10)][:10]
    predictor = hf_predictor_factory(HF_MODEL, cls="entity")()
    got = predictor(texts)
    ref = pipeline(
        "ner",
        model=HF_MODEL,
        tokenizer=HF_MODEL,
        aggregation_strategy="max",
    )
    for text, mentions in zip(texts, got):
        expected = [
            {"mention": r["word"], "begin": int(r["start"]), "end": int(r["end"])}
            for r in ref(text)
        ]
        assert [
            {"mention": m["mention"], "begin": m["begin"], "end": m["end"]}
            for m in mentions
        ] == expected
