"""CRAFT pubannotator->IOB2 converter + Flair 3-column IOB reader
(VERDICT r2 next-step #6 — the last two uncovered reference scripts).

Quirk parity targets: CRAFT_preprocessing_spacy.py:25-38 (expand +
pointer rule, file order) and :80-82 (classless B/I/O lines);
Flair_prediction_evaluation.py:10-12 (token gold pred columns feeding
the existing evaluators).
"""

from __future__ import annotations

import json

import pytest


def _write_pubann(tmp_path, name: str, text: str, dens: list[dict]) -> None:
    (tmp_path / f"{name}.json").write_text(
        json.dumps({"text": text, "denotations": dens}), encoding="utf-8"
    )


def _den(begin: int, end: int, obj: str = "CHEBI:1") -> dict:
    return {"id": f"T{begin}", "obj": obj, "span": {"begin": begin, "end": end}}


@pytest.fixture(scope="module")
def craft_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pubann")
    #      0123456789012345678901234567
    text = "cholesterol binds mTOR now."
    _write_pubann(
        d,
        "doc_a",
        text,
        [
            _den(0, 7),            # mid-token end -> expands to 'cholesterol'
            _den(3, 5, "_FRAGMENT"),  # dropped before the pointer rule
            _den(18, 22),          # 'mTOR'
            _den(12, 17),          # out of file order: expanded start 12
                                   # < limiting 22 -> skipped (quirk)
        ],
    )
    # doc_b: expansion-induced overlap — both annotations touch the
    # same token, second is pointer-skipped
    _write_pubann(
        d,
        "doc_b",
        "abcdef ghij",
        [_den(0, 8), _den(8, 11)],  # both expand into 'ghij'
    )
    return str(d)


class TestCraftConverter:
    def test_loader_and_quirks(self, spark, craft_dir):
        from easyner_spark.sources.craft import craft_to_iob2, load_pubannotation

        docs = load_pubannotation(spark, craft_dir)
        assert {r.doc_id for r in docs.select("doc_id").collect()} == {
            "doc_a",
            "doc_b",
        }
        toks = craft_to_iob2(docs).collect()
        a = [
            (r.token, r.label)
            for r in sorted(
                (r for r in toks if r.doc_id == "doc_a"), key=lambda r: r.tok_idx
            )
        ]
        # 'cholesterol' expanded from chars [0,7); 'binds' skipped (the
        # out-of-order den(12,17) arrives after limiting=22); 'mTOR' B.
        assert a == [
            ("cholesterol", "B"),
            ("binds", "O"),
            ("mTOR", "B"),
            ("now", "O"),
            (".", "O"),
        ]
        b = [
            (r.token, r.label)
            for r in sorted(
                (r for r in toks if r.doc_id == "doc_b"), key=lambda r: r.tok_idx
            )
        ]
        # den(0,8) expands across both tokens (B I); den(8,11)'s
        # expanded start_char 7 < limiting 11 -> skipped
        assert b == [("abcdef", "B"), ("ghij", "I")]

    def test_multitoken_span_and_lines(self, spark, craft_dir):
        from easyner_spark.sources.craft import (
            craft_iob2_lines,
            craft_to_iob2,
            load_pubannotation,
        )

        docs = load_pubannotation(spark, craft_dir).where("doc_id = 'doc_b'")
        lines = craft_iob2_lines(craft_to_iob2(docs)).orderBy("tok_idx").collect()
        assert [r.line for r in lines] == ["abcdef\tB", "ghij\tI"]

    def test_pluggable_tokenizer(self, spark, craft_dir):
        """tokenizer_factory contract: text -> [(token, begin, end)],
        built once per partition (the scispacy slot)."""
        from easyner_spark.sources.craft import craft_to_iob2, load_pubannotation

        def whitespace_factory():
            def build(text):
                out, pos = [], 0
                for w in text.split():
                    b = text.index(w, pos)
                    out.append((w, b, b + len(w)))
                    pos = b + len(w)
                return out

            return build

        docs = load_pubannotation(spark, craft_dir).where("doc_id = 'doc_a'")
        toks = craft_to_iob2(docs, tokenizer_factory=whitespace_factory).collect()
        got = [(r.token, r.label) for r in sorted(toks, key=lambda r: r.tok_idx)]
        # whitespace tokens: 'now.' is ONE token; mTOR den expands to it? no —
        # den(18,22) covers 'mTOR' exactly under whitespace tokenization
        assert got == [
            ("cholesterol", "B"),
            ("binds", "O"),
            ("mTOR", "B"),
            ("now.", "O"),
        ]


FLAIR_FILE = """\
cholesterol B-Chemical B-Chemical
clefts O O

mTOR B-gene O
binds O O
"""


class TestFlairReader:
    def test_parse_and_feed_evaluators(self, spark, tmp_path):
        from easyner_spark.operators.iob import (
            error_regions,
            parse_flair_lines,
            seqeval_class_metrics,
        )

        p = tmp_path / "predictions_chemical.txt"
        p.write_text(FLAIR_FILE, encoding="utf-8")
        toks = parse_flair_lines(spark, str(p))
        got = {
            (r.seq_id, r.tok_idx): (r.token, r.label_true, r.label_pred)
            for r in toks.collect()
        }
        assert got == {
            (0, 0): ("cholesterol", "B-Chemical", "B-Chemical"),
            (0, 1): ("clefts", "O", "O"),
            (1, 0): ("mTOR", "B-gene", "O"),
            (1, 1): ("binds", "O", "O"),
        }
        # feeds error_regions after projecting the bare B/I/O prefix —
        # the port pins error_detection.py's bare-tag equality, while
        # Flair emits class-suffixed tags
        bare = toks.selectExpr(
            "seq_id",
            "tok_idx",
            "token",
            "substring(label_true, 1, 1) as label_true",
            "substring(label_pred, 1, 1) as label_pred",
        )
        regions = error_regions(bare).collect()
        assert len(regions) == 1 and regions[0].word == "mTOR"
        # and the seqeval rollup via per-stream projections
        gold = toks.selectExpr("seq_id", "tok_idx", "token", "label_true as label")
        pred = toks.selectExpr("seq_id", "tok_idx", "token", "label_pred as label")
        rep = {r["class"]: r for r in seqeval_class_metrics(pred, gold).collect()}
        assert rep["Chemical"].f1 == 1.0
        assert rep["gene"].recall == 0.0
