"""KG consistency QA: declared functional-constraint violations."""

import duckdb
import pytest

from easyner_spark.operators.triples import (
    functional_violations,
    functional_violations_oracle_sql,
)

EDGES = [
    # capital_of declared functional: f1 has TWO capitals (violation),
    # f2 one (fine). located_in declared inverse_functional: city c9
    # is located_in by THREE subjects (violation).
    ("f1", "capital_of", "c1"),
    ("f1", "capital_of", "c2"),
    ("f2", "capital_of", "c3"),
    ("s1", "located_in", "c9"),
    ("s2", "located_in", "c9"),
    ("s3", "located_in", "c9"),
    ("s4", "located_in", "c8"),
    # undeclared predicate: never reported however many values
    ("f1", "mentions", "c1"),
    ("f1", "mentions", "c2"),
]

CONSTRAINTS = [
    ("capital_of", "functional"),
    ("located_in", "inverse_functional"),
]


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(
        EDGES, "subj_id string, pred string, obj_id string"
    )


def test_violations(spark, edges):
    out = sorted(tuple(r) for r in functional_violations(edges, CONSTRAINTS).collect())
    assert out == [
        ("capital_of", "functional", "f1", 2, "c1", "c2"),
        ("located_in", "inverse_functional", "c9", 3, "s1", "s3"),
    ]


def test_single_kind_and_bad_kind(spark, edges):
    only = functional_violations(edges, [("capital_of", "functional")])
    assert only.count() == 1
    with pytest.raises(ValueError, match="unknown constraint kind"):
        functional_violations(edges, [("capital_of", "key")])


def test_oracle_twin(spark, edges):
    got = sorted(tuple(r) for r in functional_violations(edges, CONSTRAINTS).collect())
    vals = ", ".join(f"('{s}', '{p}', '{o}')" for s, p, o in EDGES)
    sql = functional_violations_oracle_sql(
        f"WITH e AS (SELECT * FROM (VALUES {vals}) v(subj_id, pred, obj_id))",
        CONSTRAINTS,
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
