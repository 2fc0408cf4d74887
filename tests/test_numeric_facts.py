"""Numeric-fact extraction (triples.numeric_facts)."""

import duckdb
import pytest

from easyner_spark.operators.triples import (
    numeric_facts,
    numeric_facts_oracle_sql,
)

DOCS = [
    (1, "The payload weighs 75 kg and costs 120 usd."),
    # decimal preserved as the exact source string; % normalizes
    (2, "Purity reached 99.9 percent, up 4% overall."),
    # '5kgs' must NOT match (unit right boundary); bare number ignored
    (3, "We lifted 5kgs and counted 42 things."),
    (4, "nothing measurable"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_facts(spark, docs):
    got = {tuple(r) for r in numeric_facts(docs).collect()}
    assert got == {
        (1, 0, "75", "kg"),
        (1, 1, "120", "usd"),
        (2, 0, "99.9", "percent"),
        (2, 1, "4", "percent"),
    }


def test_oracle_twin(spark, docs):
    got = sorted(tuple(r) for r in numeric_facts(docs).collect())
    dv = ", ".join(f"({i}, '{t}')" for i, t in DOCS)
    sql = numeric_facts_oracle_sql(f"SELECT * FROM (VALUES {dv}) v(id, text)")
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
