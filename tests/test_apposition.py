"""Appositive role mining: pattern gate, two-token names, of/at
connectors, per-doc dedup, and non-matches."""

from easyner_spark.operators.triples import apposition_facts

SENTS = [
    ("d1", "Tim Cook, the CEO of Apple, spoke today."),
    ("d1", "Tim Cook, the CEO of Apple, spoke again."),  # same doc: 1 vote
    ("d2", "Tim Cook, the CEO of Apple, resigned."),  # second doc: 2 votes
    ("d3", "Ada Lovelace, a pioneer at Analytical Engines, wrote notes."),
    ("d3", "He said hello, the weather was nice."),  # 'He said' no comma-name
    ("d4", "lowercase name, the boss of Nowhere, fails the gate."),
    ("d5", "Grace Hopper, the Admiral of, malformed trailing."),
]


def test_apposition(spark):
    sents = spark.createDataFrame(SENTS, ["url", "sentence"])
    out = {
        (r.subj, r.role, r.obj): r.n_docs
        for r in apposition_facts(sents).collect()
    }
    # NB: 'CEO' is all-caps so the name tier captures 'Tim Cook' but
    # the role word must be lowercase -- 'the CEO of' fails the role
    # gate by contract. Use a lowercase-role sentence for the support
    # count check instead:
    assert ("Ada Lovelace", "pioneer", "Analytical Engines") in out
    assert out[("Ada Lovelace", "pioneer", "Analytical Engines")] == 1
    assert not any(s == "lowercase name" for s, _, _ in out)
    assert not any(s == "Grace Hopper" for s, _, _ in out)


def test_support_and_dedup(spark):
    sents = spark.createDataFrame(
        [
            ("d1", "Alice, the ceo of Acme, spoke."),
            ("d1", "Alice, the ceo of Acme, spoke twice."),
            ("d2", "Alice, the ceo of Acme, returned."),
            ("d2", "Bob, a founder at Initech, left."),
        ],
        ["url", "sentence"],
    )
    out = {
        (r.subj, r.role, r.obj): r.n_docs
        for r in apposition_facts(sents).collect()
    }
    assert out == {
        ("Alice", "ceo", "Acme"): 2,
        ("Bob", "founder", "Initech"): 1,
    }
