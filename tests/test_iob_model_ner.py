"""IOB2/seqeval evaluation (SURVEY §2.6 A6, §2.5 J6) and the model-NER
path (T5) behind the shared mention-table interface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

IOB_GOLD = """\
The O
TSC1 B-gene
gene O

mTOR B-gene
kinase I-gene
binds O
rapamycin B-chemical

broken I-gene
start I-gene
"""

# pred: TSC1 correct; mTOR-kinase truncated to just mTOR (span mismatch);
# rapamycin correct; I-start entity matched exactly.
IOB_PRED = """\
The O
TSC1 B-gene
gene O

mTOR B-gene
kinase O
binds O
rapamycin B-chemical

broken I-gene
start I-gene
"""


@pytest.fixture(scope="module")
def iob_pair(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("iob")
    (d / "gold.txt").write_text(IOB_GOLD)
    (d / "pred.txt").write_text(IOB_PRED)
    from easyner_spark.operators.iob import parse_iob2_lines

    return (
        parse_iob2_lines(spark, str(d / "pred.txt")),
        parse_iob2_lines(spark, str(d / "gold.txt")),
    )


class TestIobParsing:
    def test_parse_shapes(self, iob_pair):
        pred, gold = iob_pair
        assert gold.count() == 9
        seqs = {r.seq_id for r in gold.select("seq_id").distinct().collect()}
        assert len(seqs) == 3
        first = {(r.tok_idx, r.token, r.label) for r in gold.where("seq_id = 0").collect()}
        assert first == {(0, "The", "O"), (1, "TSC1", "B-gene"), (2, "gene", "O")}

    def test_span_reconstruction(self, iob_pair):
        from easyner_spark.operators.iob import iob_spans

        _, gold = iob_pair
        spans = {(r.seq_id, r["class"], r.begin, r.end) for r in iob_spans(gold).collect()}
        s1 = sorted(r.seq_id for r in gold.select("seq_id").distinct().collect())
        a, b, c = s1
        assert (a, "gene", 1, 2) in spans               # TSC1
        assert (b, "gene", 0, 2) in spans               # mTOR kinase (B+I merged)
        assert (b, "chemical", 3, 4) in spans           # rapamycin
        assert (c, "gene", 0, 2) in spans               # I-start run = one entity
        assert len(spans) == 4

    def test_token_zip_check(self, iob_pair):
        from easyner_spark.operators.iob import token_zip_check

        pred, gold = iob_pair
        assert token_zip_check(pred, gold).count() == 0  # aligned streams
        # drop one pred token -> 1 mismatch row
        assert token_zip_check(pred.where("token != 'binds'"), gold).count() == 1


class TestSeqeval:
    def test_class_metrics(self, iob_pair):
        from easyner_spark.operators.iob import seqeval_class_metrics

        pred, gold = iob_pair
        m = {r["class"]: r for r in seqeval_class_metrics(pred, gold).collect()}
        # gene: gold has 3 spans, pred has 3 (TSC1 ok, mTOR truncated != mTOR-kinase, I-run ok)
        assert (m["gene"].tp, m["gene"].fp, m["gene"].fn) == (2, 1, 1)
        assert (m["chemical"].tp, m["chemical"].fp, m["chemical"].fn) == (1, 0, 0)
        assert m["chemical"].precision == 1.0 and m["chemical"].recall == 1.0
        assert m["gene"].precision == pytest.approx(2 / 3)

    def test_corpus_rollup(self, iob_pair):
        from easyner_spark.operators.iob import seqeval_report

        pred, gold = iob_pair
        r = seqeval_report(pred, gold).collect()[0]
        assert r.tp == 3 and r.fp == 1 and r.fn == 1
        assert r.micro_precision == pytest.approx(3 / 4)
        assert r.micro_recall == pytest.approx(3 / 4)
        assert r.macro_precision == pytest.approx((2 / 3 + 1.0) / 2)


class TestModelNer:
    @pytest.fixture(scope="class")
    def sents(self, spark):
        rows = [
            ("u1", 0, "The TSC1 gene binds AKT1 here."),
            ("u1", 1, "no entities in lowercase text"),
            ("u2", 0, None),  # null sentence must not crash
        ]
        return spark.createDataFrame(rows, "url string, sent_idx int, sentence string")

    def test_regex_predictor_mentions(self, spark, sents):
        from easyner_spark.operators.ner_model import model_ner, regex_predictor_factory

        out = model_ner(sents, regex_predictor_factory()).collect()
        got = {(r.url, r.sent_idx, r.mention, r.begin, r.end) for r in out}
        assert ("u1", 0, "TSC1", 4, 8) in got
        assert ("u1", 0, "AKT1", 20, 24) in got
        assert len(got) == 2
        assert all(0.5 <= r.score <= 1.0 for r in out)

    def test_same_interface_as_dict_ner(self, spark, sents):
        """model mentions flow through NEL/triples unchanged."""
        from easyner_spark.operators.nel import link_entities
        from easyner_spark.operators.ner_model import model_ner, regex_predictor_factory
        from easyner_spark.operators.triples import extract_triples

        alias = spark.createDataFrame(
            [("tsc1", "KB:0002"), ("akt1", "KB:0001")], "term string, ID string"
        )
        ments = model_ner(sents, regex_predictor_factory())
        linked = link_entities(ments, alias, keep_unmatched=False)
        tri = extract_triples(linked).collect()
        assert len(tri) == 1
        assert (tri[0].subj_id, tri[0].obj_id) == ("KB:0002", "KB:0001")

    def test_score_filter(self, spark, sents):
        from easyner_spark.operators.ner_model import (
            model_ner,
            regex_predictor_factory,
            score_filter,
        )

        out = model_ner(sents, regex_predictor_factory())
        assert score_filter(out, 0.99).count() == 0
        assert score_filter(out, 0.0).count() == 2

    def test_poison_sentence_isolated(self, spark, sents):
        """A predictor that explodes on one text loses only that text
        (reference try/except -> [] semantic, scripts/ner_main.py:100-108)."""
        from easyner_spark.operators.ner_model import model_ner

        def factory():
            def predict(texts):
                out = []
                for t in texts:
                    if "lowercase" in (t or ""):
                        raise RuntimeError("poison")
                    out.append(
                        [{"mention": "TSC1", "begin": 0, "end": 4, "class": "gene", "score": 1.0}]
                        if "TSC1" in (t or "")
                        else []
                    )
                return out

            return predict

        out = model_ner(sents, factory, batch_size=64).collect()
        # poison sentence dropped, healthy sentence in the same batch kept
        assert {(r.url, r.sent_idx) for r in out} == {("u1", 0)}

    def test_hf_factory_gated(self, spark, sents):
        from easyner_spark.operators.ner_model import hf_predictor_factory, model_ner

        with pytest.raises(Exception):
            # transformers absent in this env: the task must surface the
            # ImportError, not silently return empties
            model_ner(sents, hf_predictor_factory("some/model", "gene")).collect()


class TestErrorRegions:
    def test_reference_quirks(self, spark):
        """error_detection.py parity: region open at first B, both-O
        close, match-regions suppressed, trailing region dropped."""
        from easyner_spark.operators.iob import error_regions

        rows = [
            # seq 0: one mismatched region (pred misses token 2) and one
            # agreeing region (suppressed)
            (0, 0, "the", "O", "O"),
            (0, 1, "tumor", "B", "B"),
            (0, 2, "cells", "I", "O"),
            (0, 3, "grow", "O", "O"),
            (0, 4, "fast", "B", "B"),
            (0, 5, ".", "O", "O"),
            # seq 1: leading I (no B yet) skipped entirely; later region
            # left open at sentence end -> dropped
            (1, 0, "odd", "I", "O"),
            (1, 1, "x", "O", "O"),
            (1, 2, "gene", "B", "O"),
        ]
        toks = spark.createDataFrame(
            rows,
            "seq_id int, tok_idx int, token string, label_true string, label_pred string",
        )
        got = error_regions(toks).collect()
        assert len(got) == 1
        r = got[0]
        assert (r.seq_id, r.region_idx) == (0, 0)
        assert r.word == "tumor cells"
        assert r.true_tags == ["B", "I"] and r.pred_tags == ["B", "O"]
        assert r.text == "the tumor cells grow fast ."


# ---------------------------------------------------------------------------
# ONNX predictor (reference scripts/ner_inference.py:25-80) exercised
# end-to-end through fake session/tokenizer injectables — onnxruntime and
# transformers are absent in this sandbox, but the encode/run/decode path
# is the real code.

def _make_fakes():
    """Fake tokenizer + session, defined LOCALLY so cloudpickle ships
    them by value to Spark workers (the tests module itself is not
    importable there)."""
    vocab = {
        0: "[PAD]", 101: "[CLS]", 102: "[SEP]",
        5: "mtor", 6: "kinase", 7: "binds", 8: "rapa", 9: "##mycin", 10: "the",
    }
    word_ids = {
        "mtor": [5], "kinase": [6], "binds": [7], "rapamycin": [8, 9], "the": [10],
    }
    # label index per token id, into ONNX_LABELS = [PAD, B, I, O, X, CLS, SEP]
    token_label_id = {101: 5, 102: 6, 5: 1, 6: 2, 7: 3, 8: 1, 9: 4, 10: 3, 0: 0}

    class FakeTokenizer:
        def convert_ids_to_tokens(self, ids):
            if isinstance(ids, int):
                return vocab[ids]
            return [vocab[int(i)] for i in ids]

        def encode_plus(self, seq, max_length, **kw):
            import numpy as np

            ids = [101]
            for w in (seq or "").lower().split():
                ids.extend(word_ids.get(w, [10]))
            ids.append(102)
            ids = ids[:max_length]
            n = len(ids)
            ids = ids + [0] * (max_length - n)
            return {
                "input_ids": np.asarray([ids]),
                "token_type_ids": np.asarray([[0] * max_length]),
                "attention_mask": np.asarray([[1] * n + [0] * (max_length - n)]),
            }

    class FakeSession:
        """Emits the reference graph's output shape: (_, label_ids, _),
        one label id per input position, keyed off the token id."""

        def run(self, _outputs, feeds):
            ids = feeds["input_ids_1:0"][0]
            assert feeds["segment_ids_1:0"].dtype.name == "int32"
            assert feeds["input_mask_1_raw_output___9:0"].dtype.name == "int32"
            assert feeds["label_ids_1:0"].tolist() == [0]
            return None, [[token_label_id[int(i)] for i in ids]], None

    return FakeSession, FakeTokenizer


class TestOnnxPredictor:
    def test_decode_token_labels_quirks(self):
        """Bit-parity with entity_parser.py:4-38: X-merge, B-after-B
        concat without space, trailing-open-entity drop, surface fixups."""
        from easyner_spark.operators.ner_model import decode_token_labels

        pairs = [
            ("[CLS]", "[CLS]"),
            ("mtor", "B"),
            ("kin", "I"),
            ("##ase", "X"),       # merges into previous word
            ("binds", "O"),       # closes -> mention 1
            ("tsc", "B"),
            ("1", "B"),           # B-after-B: concat WITHOUT space
            (".", "O"),           # closes -> mention 2
            ("open", "B"),        # still open at end -> dropped
            ("[SEP]", "[SEP]"),
        ]
        got = decode_token_labels(pairs, cls="gene")
        assert [(m["mention"], m["begin"], m["end"], m["class"]) for m in got] == [
            ("mtor kinase", 1, 3, "gene"),
            ("tsc1", 4, 6, "gene"),
        ]

    def test_factory_end_to_end_fake_session(self):
        from easyner_spark.operators.ner_model import onnx_predictor_factory

        fake_session, fake_tokenizer = _make_fakes()
        build = onnx_predictor_factory(
            "/nonexistent", "model.onnx", "/nonexistent/vocab.txt",
            cls="gene",
            session_factory=fake_session,
            tokenizer_factory=fake_tokenizer,
        )
        predict = build()
        (ments,) = predict(["mtor kinase binds rapamycin"])
        # rapamycin is B..X right before [SEP]: open at end -> dropped
        # (the reference's trailing-drop quirk); mtor-kinase survives
        assert [(m["mention"], m["begin"], m["end"]) for m in ments] == [
            ("mtor kinase", 1, 3)
        ]
        # a closed rapamycin mention decodes with the X-merge applied
        (m2,) = predict(["rapamycin binds"])
        assert [(m["mention"], m["begin"], m["end"]) for m in m2] == [
            ("rapamycin", 1, 2)
        ]

    def test_factory_import_gated_without_injection(self):
        from easyner_spark.operators.ner_model import onnx_predictor_factory

        with pytest.raises(ImportError):
            onnx_predictor_factory("/m", "m.onnx", "/m/vocab.txt")()

    def test_model_ner_through_spark(self, spark):
        from easyner_spark.operators.ner_model import (
            model_ner,
            onnx_predictor_factory,
        )

        sents = spark.createDataFrame(
            [
                ("u1", 0, "mtor kinase binds rapamycin"),
                ("u2", 0, "the binds the"),
            ],
            "url string, sent_idx int, sentence string",
        )
        fake_session, fake_tokenizer = _make_fakes()
        build = onnx_predictor_factory(
            "/nonexistent", "model.onnx", "/nonexistent/vocab.txt",
            cls="gene",
            session_factory=fake_session,
            tokenizer_factory=fake_tokenizer,
        )
        out = model_ner(sents, build).collect()
        assert [(r.url, r.mention, r.begin, r.end, r["class"], r.score) for r in out] == [
            ("u1", "mtor kinase", 1, 3, "gene", 1.0)
        ]
