"""In-text temporal qualifiers per edge (triples.edge_temporal)."""

import duckdb
import pytest

from easyner_spark.operators.triples import (
    edge_temporal,
    edge_temporal_oracle_sql,
)

TRIPLES = [
    ("A", "co", "B", "u1", 0),
    ("A", "co", "B", "u1", 1),
    ("A", "co", "B", "u2", 0),
    ("B", "co", "C", "u2", 1),
]
SENTS = [
    # ISO date preferred over the bare year also present
    ("u1", 0, "signed on 2020-05-17, announced 1999"),
    ("u1", 1, "later, in 2021, it grew"),
    ("u2", 0, "no date here"),
    ("u2", 1, "undated too"),
]


@pytest.fixture(scope="module")
def frames(spark):
    t = spark.createDataFrame(
        TRIPLES, "subj_id string, pred string, obj_id string, url string,"
        " sent_idx long"
    )
    s = spark.createDataFrame(SENTS, "url string, sent_idx long, sentence string")
    return t, s


def test_temporal(spark, frames):
    t, s = frames
    got = {tuple(r) for r in edge_temporal(t, s).collect()}
    assert got == {
        # "2020-05-17" < "2021" lexicographically AND temporally
        ("A", "co", "B", "2020-05-17", "2021", 2, 3),
        ("B", "co", "C", None, None, 0, 1),
    }


def test_oracle_twin(spark, frames):
    t, s = frames
    got = sorted(
        tuple("" if v is None else v for v in r)
        for r in edge_temporal(t, s).collect()
    )
    tv = ", ".join(
        f"('{a}', '{p}', '{b}', '{u}', {i})" for a, p, b, u, i in TRIPLES
    )
    sv = ", ".join(f"('{u}', {i}, '{x}')" for u, i, x in SENTS)
    sql = edge_temporal_oracle_sql(
        f"SELECT * FROM (VALUES {tv}) t(subj_id, pred, obj_id, url, sent_idx)",
        f"SELECT * FROM (VALUES {sv}) s(url, sent_idx, sentence)",
    )
    want = sorted(
        tuple("" if v is None else v for v in r)
        for r in duckdb.sql(sql).fetchall()
    )
    assert got == want
