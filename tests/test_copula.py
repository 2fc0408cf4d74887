"""Copula is-a mining (triples.copula_isa)."""

import duckdb
import pytest

from easyner_spark.operators.triples import copula_isa, copula_isa_oracle_sql

SENTS = [
    ("u1", "A transformer is a model."),
    ("u1", "The transformer is a model, everyone agrees."),  # same doc: once
    ("u2", "Transformers are the model of choice."),
    ("u2", "Rapamycin is an inhibitor."),
    ("u3", "It is clearly working."),  # no article after 'is': no match
    ("u4", "no copula pattern here at all"),
]


@pytest.fixture(scope="module")
def sents(spark):
    return spark.createDataFrame(SENTS, "url string, sentence string")


def test_isa(spark, sents):
    got = {tuple(r) for r in copula_isa(sents).collect()}
    assert ("transformer", "model", 1) in got
    assert ("transformers", "model", 1) in got
    assert ("rapamycin", "inhibitor", 1) in got
    # 'is clearly working' has no article after the copula: no match
    assert len(got) == 3


def test_oracle_twin(spark, sents):
    got = sorted(tuple(r) for r in copula_isa(sents).collect())
    sv = ", ".join(f"('{u}', '{t}')" for u, t in SENTS)
    sql = copula_isa_oracle_sql(f"SELECT * FROM (VALUES {sv}) v(url, sentence)")
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
