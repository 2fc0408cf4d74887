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


def test_passive_first_mapped_hit_wins(spark):
    ments, sents = _fixture(
        spark, "mtor is zapped by x and is blocked by rapamycin"
    )
    out = extract_passive_triples(ments, sents).collect()
    assert len(out) == 1 and out[0].pred == "blocks"


def test_active_voice_emits_nothing(spark):
    ments, sents = _fixture(spark, "mtor binds rapamycin")
    assert extract_passive_triples(ments, sents).collect() == []
