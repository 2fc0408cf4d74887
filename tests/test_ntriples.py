"""N-Triples serialization (sinks/export.to_ntriples)."""

import duckdb
import pytest

from easyner_spark.sinks.export import to_ntriples, to_ntriples_oracle_sql

EDGES = [
    ("mtor", "inhibits", "tsc1"),
    # space and '>' must percent-encode; multi-byte char is byte-wise
    ("rapamycin complex", "binds>fast", "mtor"),
    ("café", "co_occurs_with", "tea"),
]


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(
        EDGES, "subj_id string, pred string, obj_id string"
    )


def test_lines(spark, edges):
    got = {r.line for r in to_ntriples(edges).collect()}
    assert (
        "<http://kg.example/e/mtor> <http://kg.example/p/inhibits>"
        " <http://kg.example/e/tsc1> ." in got
    )
    assert (
        "<http://kg.example/e/rapamycin%20complex>"
        " <http://kg.example/p/binds%3Efast>"
        " <http://kg.example/e/mtor> ." in got
    )
    assert any("caf%C3%A9" in line for line in got)


def test_oracle_twin(spark, edges):
    got = sorted(tuple(r) for r in to_ntriples(edges).collect())
    ev = ", ".join(f"('{a}', '{p}', '{b}')" for a, p, b in EDGES)
    sql = to_ntriples_oracle_sql(
        f"SELECT * FROM (VALUES {ev}) v(subj_id, pred, obj_id)"
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
