"""Negation QA per edge (triples.edge_negation)."""

import duckdb
import pytest

from easyner_spark.operators.triples import (
    edge_negation,
    edge_negation_oracle_sql,
)

TRIPLES = [
    ("A", "co", "B", "u1", 0),
    ("A", "co", "B", "u1", 1),
    ("B", "co", "C", "u2", 0),
]
SENTS = [
    ("u1", 0, "alpha does NOT inhibit beta"),
    ("u1", 1, "alpha binds beta"),
    # "nothing" must not fire the 'no' cue (word boundary)
    ("u2", 0, "nothing suggests beta binds gamma"),
]


@pytest.fixture(scope="module")
def frames(spark):
    t = spark.createDataFrame(
        TRIPLES, "subj_id string, pred string, obj_id string, url string,"
        " sent_idx long"
    )
    s = spark.createDataFrame(SENTS, "url string, sent_idx long, sentence string")
    return t, s


def test_negation(spark, frames):
    t, s = frames
    got = {tuple(r) for r in edge_negation(t, s).collect()}
    assert got == {
        ("A", "co", "B", 1, 2),
        ("B", "co", "C", 0, 1),
    }


def test_oracle_twin(spark, frames):
    t, s = frames
    got = sorted(tuple(r) for r in edge_negation(t, s).collect())
    tv = ", ".join(
        f"('{a}', '{p}', '{b}', '{u}', {i})" for a, p, b, u, i in TRIPLES
    )
    sv = ", ".join(f"('{u}', {i}, '{x}')" for u, i, x in SENTS)
    sql = edge_negation_oracle_sql(
        f"SELECT * FROM (VALUES {tv}) t(subj_id, pred, obj_id, url, sent_idx)",
        f"SELECT * FROM (VALUES {sv}) s(url, sent_idx, sentence)",
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
