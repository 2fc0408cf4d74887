"""Acronym-definition mining (nel.acronym_pairs)."""

import duckdb
import pytest

from easyner_spark.operators.nel import (
    acronym_pairs,
    acronym_pairs_oracle_sql,
)

DOCS = [
    (1, "The World Health Organization (WHO) said so."),
    (2, "Contacting the World Health Organization (WHO) again."),
    # initials mismatch -> rejected (parenthetical aside, not a def)
    (3, "We read the new policy (WHO) yesterday."),
    # two defs in one doc; per-doc dedup counts each pair once
    (4, "Machine Learning (ML) and Machine Learning (ML) overlap."),
    (5, "no acronyms here"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_pairs(spark, docs):
    got = {tuple(r) for r in acronym_pairs(docs).collect()}
    assert got == {
        ("who", "world health organization", 2),
        ("ml", "machine learning", 1),
    }


def test_oracle_twin(spark, docs):
    got = sorted(tuple(r) for r in acronym_pairs(docs).collect())
    dv = ", ".join(f"({i}, '{t}')" for i, t in DOCS)
    sql = acronym_pairs_oracle_sql(f"SELECT * FROM (VALUES {dv}) v(id, text)")
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
