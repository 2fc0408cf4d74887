"""ner_examples: context-window extraction semantics on a closed
sentence (boundary clipping, NULL contexts, multi-token mentions)."""

from easyner_spark.operators.ner_dict import ner_examples


def test_windows_and_boundaries(spark):
    sents = spark.createDataFrame(
        [("d1", 0, "alpha beta gamma delta epsilon zeta")],
        "url string, sent_idx long, sentence string",
    )
    mentions = spark.createDataFrame(
        [
            # mention at sentence start: left_ctx NULL
            ("d1", 0, 0, 1, "CHEM"),
            # mid-sentence two-token mention, clipped left window
            ("d1", 0, 1, 3, "GENE"),
            # mention at sentence end: right_ctx NULL
            ("d1", 0, 5, 6, "DISEASE"),
        ],
        "url string, sent_idx long, begin_tok long, end_tok long, class string",
    )
    got = {
        (r["begin_tok"], r["end_tok"]): r
        for r in ner_examples(mentions, sents, window=3).collect()
    }
    a = got[(0, 1)]
    assert a["mention_txt"] == "alpha"
    assert a["left_ctx"] is None
    assert a["right_ctx"] == "beta gamma delta"
    b = got[(1, 3)]
    assert b["mention_txt"] == "beta gamma"
    assert b["left_ctx"] == "alpha"  # clipped at sentence start
    assert b["right_ctx"] == "delta epsilon zeta"
    c = got[(5, 6)]
    assert c["mention_txt"] == "zeta"
    assert c["left_ctx"] == "gamma delta epsilon"
    assert c["right_ctx"] is None
    assert {r["label"] for r in got.values()} == {"CHEM", "GENE", "DISEASE"}
