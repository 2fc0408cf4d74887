"""Coordinate extraction (triples.geo_facts)."""

import duckdb
import pytest

from easyner_spark.operators.triples import geo_facts, geo_facts_oracle_sql

DOCS = [
    (1, "The venue sits at 59.3293, 18.0686 in town."),
    # negative lon; exact string preserved (trailing zero kept)
    (2, "See -33.8688, 151.20930 on the map."),
    # out-of-range pair (a version string) gated out
    (3, "Release 99.5, 200.1 shipped yesterday."),
    (4, "no coordinates"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_geo(spark, docs):
    got = {tuple(r) for r in geo_facts(docs).collect()}
    assert got == {
        (1, 0, "59.3293", "18.0686"),
        (2, 0, "-33.8688", "151.20930"),
    }


def test_oracle_twin(spark, docs):
    got = sorted(tuple(r) for r in geo_facts(docs).collect())
    dv = ", ".join(f"({i}, '{t}')" for i, t in DOCS)
    sql = geo_facts_oracle_sql(f"SELECT * FROM (VALUES {dv}) v(id, text)")
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
