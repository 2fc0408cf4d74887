"""Passive-voice pattern triples: role flip, adjacency, first-hit."""

from easyner_spark.operators.triples import extract_passive_triples


def _fixture(spark, sentence):
    sents = spark.createDataFrame(
        [("u1", 0, sentence)], ["url", "sent_idx", "sentence"]
    )
    # mentions: mtor at [0,4), rapamycin at the tail
    b2 = sentence.index("rapamycin")
    ments = spark.createDataFrame(
        [
            ("u1", 0, 0, 4, "MTOR"),
            ("u1", 0, b2, b2 + 9, "RAPA"),
        ],
        ["url", "sent_idx", "begin", "end", "entity_id"],
    )
    return ments, sents


def test_passive_flip(spark):
    ments, sents = _fixture(spark, "mtor is inhibited by rapamycin today")
    out = extract_passive_triples(ments, sents).collect()
    assert len(out) == 1
    r = out[0]
    # roles flipped: the LATER entity becomes the subject
    assert (r.subj_id, r.pred, r.obj_id) == ("RAPA", "inhibits", "MTOR")


def test_passive_requires_adjacency_and_lexicon(spark):
    # aux and participle not adjacent -> no triple
    ments, sents = _fixture(spark, "mtor is strongly inhibited by rapamycin")
    assert extract_passive_triples(ments, sents).collect() == []
    # unmapped participle -> no triple
    ments, sents = _fixture(spark, "mtor is zapped by rapamycin")
    assert extract_passive_triples(ments, sents).collect() == []


def test_passive_phrase_must_span_entire_gap(spark):
    # ADVICE r3 precision fix: the phrase is anchored to BOTH span
    # boundaries — extra material in the gap means the pair is not
    # the passive construction's (patient, agent) and emits nothing
    ments, sents = _fixture(
        spark, "mtor is zapped by x and is blocked by rapamycin"
    )
    assert extract_passive_triples(ments, sents).collect() == []


def test_passive_nonadjacent_pair_not_flipped(spark):
    # 'Z ... A is inhibited by B': only (B, inhibits, A) — the
    # unanchored scan used to also emit (B, inhibits, Z)
    sentence = "tsc1 binds mtor is inhibited by rapamycin"
    sents = spark.createDataFrame(
        [("u1", 0, sentence)], ["url", "sent_idx", "sentence"]
    )
    b_mtor = sentence.index("mtor")
    b_rapa = sentence.index("rapamycin")
    ments = spark.createDataFrame(
        [
            ("u1", 0, 0, 4, "TSC1"),
            ("u1", 0, b_mtor, b_mtor + 4, "MTOR"),
            ("u1", 0, b_rapa, b_rapa + 9, "RAPA"),
        ],
        ["url", "sent_idx", "begin", "end", "entity_id"],
    )
    out = extract_passive_triples(ments, sents).collect()
    assert [(r.subj_id, r.pred, r.obj_id) for r in out] == [
        ("RAPA", "inhibits", "MTOR")
    ]


def test_active_voice_emits_nothing(spark):
    ments, sents = _fixture(spark, "mtor binds rapamycin")
    assert extract_passive_triples(ments, sents).collect() == []
