"""Predicate source-diversity QA (triples.predicate_support_profile)."""

import duckdb

from easyner_spark.operators.triples import (
    predicate_support_profile,
    predicate_support_profile_oracle_sql,
)

ROWS = [
    # treats: 3 hosts, h1 dominant (2 of 4)
    ("treats", "h1"), ("treats", "h1"), ("treats", "h2"), ("treats", "h3"),
    # spam_pred: single-source
    ("spam_pred", "farm.biz"), ("spam_pred", "farm.biz"),
    ("spam_pred", "farm.biz"),
]


def _frame(spark):
    return spark.createDataFrame(ROWS, "pred string, host string")


def test_profile_and_single_source_flag(spark):
    rows = {r.pred: r for r in predicate_support_profile(_frame(spark)).collect()}
    t = rows["treats"]
    assert (t.n_facts, t.n_sources, t.top_source) == (4, 3, "h1")
    assert t.top_share_micro == 500_000 and not t.single_source
    s = rows["spam_pred"]
    assert (s.n_facts, s.n_sources, s.single_source) == (3, 1, True)
    assert s.top_share_micro == 1_000_000


def test_oracle_twin(spark):
    vals = ", ".join(f"('{p}', '{h}')" for p, h in ROWS)
    sql = predicate_support_profile_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(pred, host)"
    )
    got = sorted(
        tuple(r) for r in predicate_support_profile(_frame(spark)).collect()
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
