"""Knowledge fusion by iterative truth discovery (Sums/TruthFinder
family over (source, subj, pred, obj) claims).

Reference parity: EasyNER aggregates co-occurrence counts only
(scripts/analysis.py); claim-level conflict between sources has no
analog there. fuse_claims is the Knowledge-Vault-style web-scale
addition: per-source trust and per-claim confidence estimated jointly,
so a mirror farm repeating one wrong fact cannot outvote a few
reliable sources that are right about everything else.
"""

import pytest
from pyspark.sql import functions as F

from easyner_spark.operators.triples import fuse_claims


def _best(df):
    return {
        (r.subj_id, r.pred): (r.obj_id, r.n_sources)
        for r in df.where("is_best").collect()
    }


def test_majority_vote_when_trust_uniform(spark):
    # One iteration == weighted majority vote with uniform trust.
    claims = spark.createDataFrame(
        [("s1", "A", "p", "X"), ("s2", "A", "p", "X"), ("s3", "A", "p", "Y")],
        "source string, subj_id string, pred string, obj_id string",
    )
    out = fuse_claims(claims, iters=1)
    assert _best(out)[("A", "p")] == ("X", 2)


def test_spam_farm_outweighed_by_reliable_sources(spark):
    # 3 spam mirrors assert ONLY the wrong fact (A,p)->BAD. 2 good
    # sources assert (A,p)->GOOD and also agree with each other on 4
    # uncontested slots, so their trust climbs while the mirrors' trust
    # decays; by iteration 3 GOOD overtakes BAD despite 3-vs-2 votes.
    rows = [(f"spam{i}", "A", "p", "BAD") for i in range(3)]
    for s in ("good1", "good2"):
        rows.append((s, "A", "p", "GOOD"))
        rows += [(s, f"U{k}", "p", f"V{k}") for k in range(4)]
    claims = spark.createDataFrame(
        rows, "source string, subj_id string, pred string, obj_id string"
    )
    vote = fuse_claims(claims, iters=1)
    assert _best(vote)[("A", "p")][0] == "BAD"  # plain vote is fooled
    out = fuse_claims(claims, iters=3)
    assert _best(out)[("A", "p")] == ("GOOD", 2)


def test_confidence_shares_sum_to_one_per_slot(spark):
    claims = spark.createDataFrame(
        [
            ("s1", "A", "p", "X"),
            ("s2", "A", "p", "Y"),
            ("s3", "A", "p", "Z"),
            ("s1", "B", "q", "W"),
        ],
        "source string, subj_id string, pred string, obj_id string",
    )
    out = fuse_claims(claims, iters=2)
    sums = {
        (r.subj_id, r.pred): r.s
        for r in out.groupBy("subj_id", "pred")
        .agg(F.sum("confidence").alias("s"))
        .collect()
    }
    for v in sums.values():
        assert v == pytest.approx(1.0, abs=1e-8)
    # uncontested slot: confidence exactly 1, flagged best
    b = {(r.subj_id, r.pred, r.obj_id): (r.confidence, r.is_best) for r in out.collect()}
    assert b[("B", "q", "W")] == (1.0, True)


def test_tie_breaks_to_min_obj_id_and_dedup(spark):
    # duplicate claim rows collapse; exact tie -> min obj_id wins
    claims = spark.createDataFrame(
        [
            ("s1", "A", "p", "Y"),
            ("s1", "A", "p", "Y"),
            ("s2", "A", "p", "X"),
        ],
        "source string, subj_id string, pred string, obj_id string",
    )
    out = fuse_claims(claims, iters=3)
    assert _best(out)[("A", "p")] == ("X", 1)
    assert out.count() == 2


def test_iters_validation(spark):
    claims = spark.createDataFrame(
        [("s1", "A", "p", "X")],
        "source string, subj_id string, pred string, obj_id string",
    )
    with pytest.raises(ValueError):
        fuse_claims(claims, iters=0)
