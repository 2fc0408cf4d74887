"""Composed edge confidence (triples.edge_confidence)."""

import duckdb
import pytest

from easyner_spark.operators.triples import (
    edge_confidence,
    edge_confidence_oracle_sql,
)

# (A,co,B): 3 evidence sentences across 2 docs, 1 negated; support 4
# (one sentence pair repeats). (B,co,C): 1 doc, clean.
TRIPLES = [
    ("A", "co", "B", "u1", 0),
    ("A", "co", "B", "u1", 0),
    ("A", "co", "B", "u1", 1),
    ("A", "co", "B", "u2", 0),
    ("B", "co", "C", "u2", 1),
]
SENTS = [
    ("u1", 0, "alpha never binds beta"),
    ("u1", 1, "alpha binds beta"),
    ("u2", 0, "alpha binds beta strongly"),
    ("u2", 1, "beta binds gamma"),
]


@pytest.fixture(scope="module")
def frames(spark):
    t = spark.createDataFrame(
        TRIPLES, "subj_id string, pred string, obj_id string, url string,"
        " sent_idx long"
    )
    s = spark.createDataFrame(SENTS, "url string, sent_idx long, sentence string")
    return t, s


def test_confidence(spark, frames):
    t, s = frames
    got = {tuple(r) for r in edge_confidence(t, s, doc_clamp=2).collect()}
    # (A,co,B): share = (3-1)*1e6//3 = 666666; clamp = min(2,2)//2 = full
    assert ("A", "co", "B", 4, 2, 1, 3, 666666) in got
    # (B,co,C): share 1e6, clamp 1/2 -> 500000
    assert ("B", "co", "C", 1, 1, 0, 1, 500000) in got


def test_oracle_twin(spark, frames):
    t, s = frames
    got = sorted(tuple(r) for r in edge_confidence(t, s, doc_clamp=2).collect())
    tv = ", ".join(
        f"('{a}', '{p}', '{b}', '{u}', {i})" for a, p, b, u, i in TRIPLES
    )
    sv = ", ".join(f"('{u}', {i}, '{x}')" for u, i, x in SENTS)
    sql = edge_confidence_oracle_sql(
        f"SELECT * FROM (VALUES {tv}) t(subj_id, pred, obj_id, url, sent_idx)",
        f"SELECT * FROM (VALUES {sv}) s(url, sent_idx, sentence)",
        doc_clamp=2,
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
