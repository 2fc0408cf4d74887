"""Contact-fact extraction (textstats.contact_facts)."""

import duckdb
import pytest

from easyner_spark.operators.textstats import (
    contact_facts,
    contact_facts_oracle_sql,
)

DOCS = [
    (1, "Reach us at Info@Example.ORG or +46 8-123 456 78 today."),
    (2, "two mails: a@b.co and c.d+tag@e-f.museum"),
    (3, "no contacts here"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_contacts(spark, docs):
    got = {tuple(r) for r in contact_facts(docs).collect()}
    assert got == {
        (1, "email", 0, "info@example.org"),
        (1, "phone", 0, "+46812345678"),
        (2, "email", 0, "a@b.co"),
        (2, "email", 1, "c.d+tag@e-f.museum"),
    }


def test_oracle_twin(spark, docs):
    got = sorted(tuple(r) for r in contact_facts(docs).collect())
    dv = ", ".join(f"({i}, '{t}')" for i, t in DOCS)
    sql = contact_facts_oracle_sql(f"SELECT * FROM (VALUES {dv}) v(id, text)")
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
