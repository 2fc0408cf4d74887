"""Filtered KG link-prediction ranking metrics (MRR / Hits@k)."""

import duckdb
import pytest

from easyner_spark.operators.graph import (
    ranking_eval,
    ranking_eval_oracle_sql,
    ranking_summary,
    ranking_summary_oracle_sql,
)

# (subj, pred, obj, score_micro, is_gold)
CANDS = [
    # query (a, p): gold g1 outscored by one negative -> rank 2
    ("a", "p", "g1", 500000, 1),
    ("a", "p", "n1", 900000, 0),
    ("a", "p", "n2", 100000, 0),
    # query (b, p): gold tied with a negative; 'aa' < 'g2' wins the
    # tie -> rank 2; 'zz' ties but loses -> no effect
    ("b", "p", "g2", 700000, 1),
    ("b", "p", "aa", 700000, 0),
    ("b", "p", "zz", 700000, 0),
    # query (c, p): TWO golds; each must ignore the other (filtered
    # protocol) -> both rank 1 (no negative beats either)
    ("c", "p", "g3", 400000, 1),
    ("c", "p", "g4", 900000, 1),
    ("c", "p", "n3", 100000, 0),
]


@pytest.fixture(scope="module")
def cands(spark):
    return spark.createDataFrame(
        CANDS,
        "subj string, pred string, obj string, score_micro long, is_gold int",
    )


def test_ranks(spark, cands):
    out = {r["obj"]: r["rank"] for r in ranking_eval(cands).collect()}
    assert out == {"g1": 2, "g2": 2, "g3": 1, "g4": 1}


def test_summary(spark, cands):
    s = ranking_summary(ranking_eval(cands), ks=(1, 3)).collect()[0]
    assert s["n_gold"] == 4
    assert s["hits1"] == 2
    assert s["hits3"] == 4
    # 1/2 + 1/2 + 1 + 1 in micro-units
    assert s["sum_rr_micro"] == 3000000
    assert s["mrr_micro"] == 750000


def test_oracle_twins(spark, cands):
    vals = ", ".join(
        f"('{s}', '{p}', '{o}', {sc}, {g})" for s, p, o, sc, g in CANDS
    )
    cands_sql = (
        f"SELECT * FROM (VALUES {vals}) "
        "v(subj, pred, obj, score_micro, is_gold)"
    )
    got = sorted(tuple(r) for r in ranking_eval(cands).collect())
    want = sorted(
        tuple(r) for r in duckdb.sql(ranking_eval_oracle_sql(cands_sql)).fetchall()
    )
    assert got == want
    got_s = tuple(ranking_summary(ranking_eval(cands)).collect()[0])
    want_s = duckdb.sql(ranking_summary_oracle_sql(cands_sql)).fetchall()[0]
    assert got_s == tuple(want_s)
