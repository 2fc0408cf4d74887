"""Nominalization pattern triples: role flip, strict adjacency."""

from easyner_spark.operators.triples import extract_nominal_triples


def _fixture(spark, sentence):
    sents = spark.createDataFrame(
        [("u1", 0, sentence)], ["url", "sent_idx", "sentence"]
    )
    b1 = sentence.index("mtor")
    b2 = sentence.index("rapamycin")
    ments = spark.createDataFrame(
        [
            ("u1", 0, b1, b1 + 4, "MTOR"),
            ("u1", 0, b2, b2 + 9, "RAPA"),
        ],
        ["url", "sent_idx", "begin", "end", "entity_id"],
    )
    return ments, sents


def test_nominal_flip(spark):
    ments, sents = _fixture(spark, "inhibition of mtor by rapamycin today")
    out = extract_nominal_triples(ments, sents).collect()
    assert len(out) == 1
    r = out[0]
    # the 'by' entity becomes the subject, the 'of' entity the object
    assert (r.subj_id, r.pred, r.obj_id) == ("RAPA", "inhibits", "MTOR")


def test_nominal_mid_sentence(spark):
    ments, sents = _fixture(
        spark, "we saw strong inhibition of mtor by rapamycin here"
    )
    out = extract_nominal_triples(ments, sents).collect()
    assert len(out) == 1 and out[0].pred == "inhibits"


def test_nominal_requires_adjacency(spark):
    # determiner between 'of' and the first entity -> prefix no longer
    # ends with '<nominal> of '
    ments, sents = _fixture(spark, "inhibition of the mtor by rapamycin")
    assert extract_nominal_triples(ments, sents).collect() == []
    # extra token in the A..B gap -> gap is not exactly 'by'
    ments, sents = _fixture(spark, "inhibition of mtor only by rapamycin")
    assert extract_nominal_triples(ments, sents).collect() == []


def test_nominal_requires_lexicon(spark):
    ments, sents = _fixture(spark, "zapping of mtor by rapamycin")
    assert extract_nominal_triples(ments, sents).collect() == []


def test_nominal_first_span_contract(spark):
    # A occurred earlier in the sentence: the pair uses the FIRST span,
    # whose prefix is not the nominal phrase -> no triple
    s = "mtor rose and inhibition of mtor by rapamycin"
    sents = spark.createDataFrame([("u1", 0, s)], ["url", "sent_idx", "sentence"])
    b2 = s.index("rapamycin")
    ments = spark.createDataFrame(
        [
            ("u1", 0, 0, 4, "MTOR"),
            ("u1", 0, s.index("of mtor") + 3, s.index("of mtor") + 7, "MTOR"),
            ("u1", 0, b2, b2 + 9, "RAPA"),
        ],
        ["url", "sent_idx", "begin", "end", "entity_id"],
    )
    assert extract_nominal_triples(ments, sents).collect() == []
