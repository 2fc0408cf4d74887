"""KG edge evidence sentences (triples.edge_evidence)."""

import duckdb
import pytest

from easyner_spark.operators.triples import (
    edge_evidence,
    edge_evidence_oracle_sql,
)

# (subj_id, pred, obj_id, url, sent_idx): edge (A,co,B) has 4 evidence
# sentences (one duplicated) -> k=2 keeps the lexicographic-min two
TRIPLES = [
    ("A", "co", "B", "u1", 0),
    ("A", "co", "B", "u1", 0),
    ("A", "co", "B", "u1", 2),
    ("A", "co", "B", "u2", 1),
    ("A", "co", "B", "u0", 5),
    ("B", "co", "C", "u2", 1),
]
SENTS = [
    ("u0", 5, "s-u0-5"),
    ("u1", 0, "s-u1-0"),
    ("u1", 2, "s-u1-2"),
    ("u2", 1, "s-u2-1"),
]


@pytest.fixture(scope="module")
def frames(spark):
    t = spark.createDataFrame(
        TRIPLES, "subj_id string, pred string, obj_id string, url string,"
        " sent_idx long"
    )
    s = spark.createDataFrame(SENTS, "url string, sent_idx long, sentence string")
    return t, s


def test_topk(spark, frames):
    t, s = frames
    got = {tuple(r) for r in edge_evidence(t, s, k=2).collect()}
    assert got == {
        ("A", "co", "B", 1, "u0", 5, "s-u0-5"),
        ("A", "co", "B", 2, "u1", 0, "s-u1-0"),
        ("B", "co", "C", 1, "u2", 1, "s-u2-1"),
    }


def test_oracle_twin(spark, frames):
    t, s = frames
    got = sorted(tuple(r) for r in edge_evidence(t, s, k=2).collect())
    tv = ", ".join(
        f"('{a}', '{p}', '{b}', '{u}', {i})" for a, p, b, u, i in TRIPLES
    )
    sv = ", ".join(f"('{u}', {i}, '{x}')" for u, i, x in SENTS)
    sql = edge_evidence_oracle_sql(
        f"SELECT * FROM (VALUES {tv}) t(subj_id, pred, obj_id, url, sent_idx)",
        f"SELECT * FROM (VALUES {sv}) s(url, sent_idx, sentence)",
        k=2,
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
