"""Parity against the reference repo's REAL bundled artifacts (data
files only — results/sample_output/ner_huner_gene-1.json, the ranked
analysis TSV, data/Lund-Autophagy-1_articles.json, the dictionary
term lists). A user of the reference can point this engine at the
files they already have on disk.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

REF = "/root/reference"
NER_JSON = f"{REF}/results/sample_output/ner_huner_gene-1.json"
RESULT_TSV = (
    f"{REF}/results/sample_output/analysis_mtorandtsc1_chemical/"
    "mtorandtsc1_result_chemical.tsv"
)
ARTICLES_JSON = f"{REF}/data/Lund-Autophagy-1_articles.json"
COVID_DICT = f"{REF}/dictionaries/covid-19_synonyms_v2.txt"
COVID_TXT = f"{REF}/data/Lund-COVID-19_plaintext.txt"

needs_ref = pytest.mark.skipif(
    not os.path.exists(NER_JSON), reason="reference artifacts not present"
)


@needs_ref
class TestReferenceNerOutput:
    @pytest.fixture(scope="class")
    def sents(self, spark):
        from easyner_spark.sources.loaders import annotated_json_load

        return annotated_json_load(spark, NER_JSON).cache()

    def test_loads_whole_corpus(self, spark, sents):
        # 999 articles in the file; 6 have an empty sentences list and
        # contribute no sentence rows (real-corpus quirk)
        assert sents.select("doc_id").distinct().count() == 993
        assert sents.where(F.col("batch_id") != 1).count() == 0  # ...gene-1.json

    def test_span_slice_invariant_tiers(self, spark, sents):
        """The reference's 18,258 real annotations vs their sentence
        slices, computed IN SPARK, three tiers:
          - raw: 1,770 mismatches — ALL of them the reference's own
            WordPiece-detok spacing artifact ('kinase - 3' vs the
            text's 'Kinase-3');
          - after the engine's T6 entity fix-up chain (' - ', ' , ' —
            entity_parser.py:38-39): 504 remain (the reference's own
            repair list is incomplete against its own output: ' / ',
            '( x )', nbsp families — a documented reference quirk);
          - space-insensitive (+nbsp fold): exactly 1 — the tokenizer's
            unicode fold 'mullerian' vs the text's 'Müllerian'."""
        from easyner_spark.sources.loaders import annotated_mentions

        m = annotated_mentions(sents)
        assert m.count() == 18258
        joined = m.join(
            sents.select("doc_id", "sent_idx", "sentence"),
            (m["url"] == F.col("doc_id")) & (m["sent_idx"] == sents["sent_idx"]),
        )
        sl = F.lower(F.expr("substring(sentence, begin + 1, end - begin)"))
        assert joined.where(sl != F.col("mention_lc")).count() == 1770
        fixed = F.replace(
            F.replace(F.col("mention_lc"), F.lit(" - "), F.lit("-")),
            F.lit(" , "),
            F.lit(","),
        )
        assert joined.where(sl != fixed).count() == 504
        nospace = lambda c: F.regexp_replace(
            F.regexp_replace(c, " ", " "), " ", ""
        )
        bad = joined.where(nospace(sl) != nospace(F.col("mention_lc")))
        assert [r.mention_lc for r in bad.collect()] == [
            "anti - mullerian hormone type 2 receptor"
        ]

    def test_entity_frequency_on_reference_output(self, spark, sents):
        """The analysis stage runs directly on the reference's own NER
        output; totals reconcile with the raw annotation count and the
        headline genes of the corpus rank on top."""
        from easyner_spark.operators.analysis import entity_frequency, top_n
        from easyner_spark.sources.loaders import annotated_mentions

        m = annotated_mentions(sents)
        freq = entity_frequency(
            m, mention_col="mention_lc", batch_col="batch_id",
            exact_sets=False, batch_counts=True,
        )
        assert freq.agg(F.sum("total_count")).collect()[0][0] == 18258
        top = [r.mention for r in top_n(freq, 5).collect()]
        assert "mtor" in top and "tsc1" in top

    def test_ranked_tsv_column_contract(self):
        """reference_frame's column order IS the real artifact's header
        (the reference writes the entity as an unnamed pandas index)."""
        from easyner_spark.operators.analysis import REFERENCE_COLUMNS

        with open(RESULT_TSV, encoding="utf-8") as f:
            header = f.readline().rstrip("\n").split("\t")
        assert header[0] == ""  # unnamed index column = our 'mention'
        assert header[1:] == REFERENCE_COLUMNS[1:]


@needs_ref
class TestReferenceCorpora:
    def test_articles_json_to_pipeline(self, spark):
        """data/Lund-Autophagy-1_articles.json (999 real abstracts) ->
        pages -> sentences -> dictionary NER with the engine's term
        list: autophagy/mtor corpus surfaces its own vocabulary."""
        from easyner_spark.fixtures import TERMS
        from easyner_spark.operators.ner_dict import dict_ner
        from easyner_spark.operators.splitter import split_sentences
        from easyner_spark.sources.loaders import articles_json_load

        pages = articles_json_load(spark, ARTICLES_JSON).withColumnRenamed(
            "doc_id", "url"
        )
        assert pages.count() == 999
        sents = split_sentences(pages, lang_filter=None)
        assert sents.count() > 5000
        found = {
            r.mention_lc
            for r in dict_ner(sents, TERMS).select("mention_lc").distinct().collect()
        }
        assert {"autophagy", "mtor", "rapamycin"} <= found

    def test_covid_corpus_with_reference_dictionary(self, spark):
        """The reference's own COVID synonym dictionary over its own
        COVID plaintext corpus (free-text loader S4) yields hits."""
        from easyner_spark.operators.ner_dict import dict_ner, load_terms_file
        from easyner_spark.operators.splitter import split_sentences
        from easyner_spark.sources.loaders import free_text_load

        terms = [(t, c or "covid") for t, c in load_terms_file(COVID_DICT)]
        assert len(terms) > 50
        pages = free_text_load(spark, COVID_TXT).withColumnRenamed("doc_id", "url")
        ments = dict_ner(split_sentences(pages, lang_filter=None), terms)
        hits = {r.mention_lc for r in ments.select("mention_lc").distinct().collect()}
        assert any("cov" in h or "corona" in h for h in hits)


LUND_ZIP = f"{REF}/data/Simplified Lund COVID19 corpus.zip"


@pytest.mark.skipif(not os.path.exists(LUND_ZIP), reason="corpus zip absent")
class TestLundGoldEvaluation:
    """The reference's REAL benchmark gold (Simplified Lund COVID-19,
    species_with_virus tier: 2,419 tokens, 119 entity spans) through
    the engine's IOB loader + seqeval evaluator."""

    @pytest.fixture(scope="class")
    def gold_path(self, tmp_path_factory):
        import zipfile

        d = tmp_path_factory.mktemp("lund")
        with zipfile.ZipFile(LUND_ZIP) as z:
            z.extract("species_with_virus/test.tsv", d)
        return str(d / "species_with_virus" / "test.tsv")

    def test_real_gold_loads_and_self_eval_is_perfect(self, spark, gold_path):
        from easyner_spark.operators.iob import (
            iob_spans,
            parse_iob2_lines,
            seqeval_report,
        )

        gold = parse_iob2_lines(spark, gold_path)
        assert gold.count() == 2419  # CRLF endings handled
        assert iob_spans(gold).count() == 119
        rep = seqeval_report(gold, gold).collect()[0]
        assert rep.micro_precision == 1.0 and rep.micro_recall == 1.0

    def test_dropped_entity_recall_is_exact(self, spark, gold_path):
        """Relabel every 3rd gold entity to O on the pred side: span
        precision stays 1.0 and recall is exactly kept/119."""
        import re

        from easyner_spark.operators.iob import parse_iob2_lines, seqeval_report

        toks, labels = [], []
        for line in open(gold_path, encoding="utf-8"):
            line = line.strip()
            if not line:
                continue
            parts = re.split(r"\s+", line)
            toks.append(parts[0])
            labels.append(parts[1] if len(parts) > 1 else "O")
        pred, ent_idx, i = labels[:], -1, 0
        dropped = 0
        while i < len(labels):
            if labels[i] == "B":
                ent_idx += 1
                j = i + 1
                while j < len(labels) and labels[j] == "I":
                    j += 1
                if ent_idx % 3 == 0:
                    dropped += 1
                    for t in range(i, j):
                        pred[t] = "O"
                i = j
            else:
                i += 1
        rows = [(0, t, tok, lab) for t, (tok, lab) in enumerate(zip(toks, pred))]
        pred_df = spark.createDataFrame(
            rows, "seq_id int, tok_idx int, token string, label string"
        )
        gold_df = parse_iob2_lines(spark, gold_path)
        rep = seqeval_report(pred_df, gold_df).collect()[0]
        assert rep.micro_precision == 1.0
        assert rep.micro_recall == (119 - dropped) / 119

    def test_dictionary_ner_reports_honest_metrics(self, spark, gold_path):
        """The reference's own COVID/SARS dictionaries over the real
        corpus: the evaluator runs end-to-end and reports the expected
        shape of a dictionary-vs-model gap (recall well under 1 — gold
        spans like 'most recent emergent group 2B coronavirus' need
        model NER; only ~18/119 surfaces are dictionary entries)."""
        import re

        from easyner_spark.operators.evaluate import prf, span_match_counts
        from easyner_spark.operators.iob import iob_spans, parse_iob2_lines
        from easyner_spark.operators.ner_dict import dict_ner, load_terms_file
        from easyner_spark.operators.splitter import split_sentences

        toks = []
        for line in open(gold_path, encoding="utf-8"):
            line = line.strip()
            if line:
                toks.append(re.split(r"\s+", line)[0])
        text = " ".join(toks)
        pages = spark.createDataFrame([("lund", text)], "url string, text string")
        terms = []
        for p in (COVID_DICT, f"{REF}/dictionaries/sars-cov-2_synonyms_v2.txt"):
            terms += [(t, "virus") for t, _ in load_terms_file(p)]
        sents = split_sentences(pages, lang_filter=None)
        # doc-level token spans: sentences of the single doc concatenate
        # back to the token stream, so use token-level eval via spans
        ments = dict_ner(sents, terms)
        assert ments.count() > 0
        gold_df = parse_iob2_lines(spark, gold_path)
        gold_spans = iob_spans(gold_df)
        assert gold_spans.count() == 119
        # evaluator machinery on real surfaces: compare SURFACE sets
        # (span offsets live in different frames: sentence vs corpus)
        pred_surfaces = {
            r.mention_lc for r in ments.select("mention_lc").distinct().collect()
        }
        gold_surfaces = set()
        gtoks = {r.tok_idx: r.token for r in gold_df.collect()}
        for r in gold_spans.collect():
            gold_surfaces.add(
                " ".join(gtoks[t] for t in range(r.begin, r.end)).lower()
            )
        overlap = pred_surfaces & gold_surfaces
        assert len(overlap) >= 5            # real dictionary hits exist
        assert len(overlap) < len(gold_surfaces)  # and model NER is needed
