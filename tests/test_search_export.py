"""Search semi-joins (P5) and PubTator export offsets (W2/K5)."""

from pyspark.sql import functions as F

from easyner_spark.fixtures import TERMS
from easyner_spark.operators.ner_dict import dict_ner
from easyner_spark.operators.search import search_mentions, search_sentences
from easyner_spark.operators.splitter import split_sentences
from easyner_spark.sinks.pubtator import (
    doc_text,
    mentions_with_doc_spans,
    to_pubtator_lines,
)


def test_search_sentences_exact_membership(spark, pages_df):
    sents = split_sentences(pages_df)
    ments = dict_ner(sents, TERMS)
    hits = search_sentences(sents, ments, ["rapamycin"], match_col="mention_lc")
    got = hits.toPandas()
    # every returned sentence really contains the term (case-insensitive)
    assert len(got) > 0
    assert got["sentence"].str.lower().str.contains("rapamycin").all()
    # and no sentence containing it is missed
    all_sents = sents.toPandas()
    expected_keys = set()
    m = ments.where(F.col("mention_lc") == "rapamycin").select("url", "sent_idx").distinct()
    for r in m.collect():
        expected_keys.add((r["url"], r["sent_idx"]))
    assert set(zip(got["url"], got["sent_idx"])) == expected_keys


def test_search_cased_vs_lowercase(spark):
    sents = spark.createDataFrame(
        [("u", 0, "RAPAMYCIN works"), ("u", 1, "rapamycin works")],
        "url string, sent_idx int, sentence string",
    )
    ments = dict_ner(sents, TERMS)
    cased = search_sentences(sents, ments, ["rapamycin"], match_col="mention")
    assert cased.count() == 1  # only the lowercase surface matches exactly
    lc = search_sentences(sents, ments, ["rapamycin"], match_col="mention_lc")
    assert lc.count() == 2
    assert search_mentions(ments, ["rapamycin"], "mention_lc").count() == 2


def test_search_hit_keys_not_force_broadcast(spark, pages_df):
    """A hot term's hit-key set is unbounded; the default plan must not
    carry a forced broadcast hint on it (AQE decides at runtime)."""
    sents = split_sentences(pages_df)
    ments = dict_ner(sents, TERMS)
    auto = search_sentences(sents, ments, ["rapamycin"], match_col="mention_lc")
    # optimized logical plan: exactly one broadcast hint (the tiny term
    # list inside _hit_keys), none on the hit-key side of the outer join
    plan = auto._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("ResolvedHint") <= 1
    forced = search_sentences(
        sents, ments, ["rapamycin"], match_col="mention_lc", hint="broadcast"
    )
    fplan = forced._jdf.queryExecution().optimizedPlan().toString()
    assert fplan.count("ResolvedHint") >= plan.count("ResolvedHint")
    # same answer either way
    assert sorted(map(tuple, auto.select("url", "sent_idx").collect())) == sorted(
        map(tuple, forced.select("url", "sent_idx").collect())
    )


def test_doc_span_shift_slices_doc_text(spark, pages_df):
    sents = split_sentences(pages_df)
    ments = dict_ner(sents, TERMS)
    shifted = mentions_with_doc_spans(ments, sents)
    texts = doc_text(sents)
    joined = shifted.join(texts, "url").select(
        "mention",
        F.expr("substring(text, doc_begin + 1, doc_end - doc_begin)").alias("slice"),
    )
    assert joined.where(F.col("mention") != F.col("slice")).count() == 0


def test_pubtator_lines_shape(spark, pages_df):
    sents = split_sentences(pages_df).where(F.col("url").endswith("/doc/0"))
    ments = dict_ner(sents, TERMS)
    lines = to_pubtator_lines(ments, sents).orderBy("url", "line_no", "line").toPandas()
    assert lines.iloc[0]["line"].split("|")[1] == "t"
    assert lines.iloc[1]["line"].split("|")[1] == "a"
    body = lines.iloc[2:]
    assert (body["line"].str.count("\t") == 5).all()


def test_barchart_svg_render(spark, pages_df, tmp_path):
    """K4: ranked top-n feed -> driver-side SVG export (reference
    scripts/analysis.py:82-122; the matplotlib twin is import-gated)."""
    from easyner_spark.operators.analysis import entity_frequency
    from easyner_spark.sinks.chart import render_barchart_svg, write_barchart_svg

    ments = dict_ner(split_sentences(pages_df), TERMS)
    freq = entity_frequency(ments, mention_col="mention_lc")
    svg = render_barchart_svg(freq, n=5, title="Top 5 entities")
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    top = freq.orderBy(F.desc("total_count"), F.asc("mention")).limit(5).collect()
    for r in top:  # every ranked entity appears as a label + its value
        assert f">{r.mention}<" in svg
        assert f">{r.total_count}<" in svg
    assert svg.count("<rect") == len(top) + 1  # bars + surface
    out = tmp_path / "chart.svg"
    write_barchart_svg(freq, str(out), n=5)
    assert out.read_text() == svg


class TestPubtatorPreprocess:
    CORPUS = (
        "101|t|A title\n"
        "101|a|An abstract with TNF here\n"
        "101\t17\t20\tTNF\tGene\n"                  # 5 fields -> dummy id
        "101\t0\t1\tA\tDisease\tMESH:D1\n"          # 6 fields -> kept
        "\n"
        "102|t|Other\n"
        "102\t3\t7\tther\tChemical\n"
    )

    def test_annotations_and_dummy_id(self, spark, tmp_path):
        from easyner_spark.sinks.pubtator import pubtator_annotations

        p = tmp_path / "c.txt"
        p.write_text(self.CORPUS)
        anns = {(r.doc_id, r.begin): r for r in pubtator_annotations(spark, str(p)).collect()}
        assert len(anns) == 3
        assert anns[("101", 17)].identifier == "-1"      # dummy added
        assert anns[("101", 0)].identifier == "MESH:D1"  # existing kept
        assert anns[("102", 3)].mention == "ther"

    def test_remap_and_byte_twin(self, spark, tmp_path):
        from easyner_spark.sinks.pubtator import (
            preprocess_pubtator_lines,
            pubtator_annotations,
            remap_annotation_classes,
        )

        p = tmp_path / "c.txt"
        p.write_text(self.CORPUS)
        mapping = spark.createDataFrame(
            [("Gene", "GeneOrGeneProduct")], "old string, new string"
        )
        anns = remap_annotation_classes(pubtator_annotations(spark, str(p)), mapping)
        classes = {r.begin: r["class"] for r in anns.where("doc_id = '101'").collect()}
        assert classes == {17: "GeneOrGeneProduct", 0: "Disease"}  # unmapped pass
        lines = [
            r.line
            for r in preprocess_pubtator_lines(spark, str(p), mapping)
            .orderBy("line_no")
            .collect()
        ]
        # reference byte behavior: text lines verbatim, annotations
        # rewritten with dummy id + remapped class
        assert lines[0] == "101|t|A title"
        assert lines[2] == "101\t17\t20\tTNF\tGeneOrGeneProduct\t-1"
        assert lines[3] == "101\t0\t1\tA\tDisease\tMESH:D1"
        assert lines[6] == "102\t3\t7\tther\tChemical\t-1"


def test_pubtator_preprocess_review_regressions(spark, tmp_path):
    """code-review r2b: trailing-tab lines still get the dummy id,
    extra fields beyond the identifier survive verbatim, duplicate
    mapping keys don't duplicate lines."""
    from easyner_spark.sinks.pubtator import (
        preprocess_pubtator_lines,
        pubtator_annotations,
    )

    p = tmp_path / "c.txt"
    p.write_text(
        "101\t17\t20\tTNF\tGene\t\n"                    # trailing tab
        "101\t0\t5\tBRCA1\tGene\tNCBI:672\tExtraCol\n"  # 7 fields
    )
    anns = {r.begin: r for r in pubtator_annotations(spark, str(p)).collect()}
    assert anns[17].identifier == "-1"
    mapping = spark.createDataFrame(
        [("Gene", "A"), ("Gene", "B")], "old string, new string"
    )
    lines = [
        r.line
        for r in preprocess_pubtator_lines(spark, str(p), mapping)
        .orderBy("line_no")
        .collect()
    ]
    assert len(lines) == 2  # duplicate mapping key didn't duplicate rows
    assert lines[0] == "101\t17\t20\tTNF\tB\t-1"
    assert lines[1] == "101\t0\t5\tBRCA1\tB\tNCBI:672\tExtraCol"
