"""Positional bitext candidate mining over translation clusters."""

import duckdb
import pytest

from easyner_spark.operators.webtext import (
    bitext_candidates,
    bitext_candidates_oracle_sql,
)

# (url, lang, sent_idx, sentence)
SENTS = [
    ("en1", "en", 0, "hello"),
    ("en1", "en", 1, "world"),
    ("de1", "de", 0, "hallo"),
    ("de1", "de", 1, "welt"),
    # fr variant has only 1 sentence of 2 -> within the 50% gate
    ("fr1", "fr", 0, "bonjour"),
    # second cluster: counts diverge 1 vs 3 -> gated out
    ("en2", "en", 0, "a"),
    ("de2", "de", 0, "x"),
    ("de2", "de", 1, "y"),
    ("de2", "de", 2, "z"),
    # page outside any cluster: never aligned
    ("solo", "en", 0, "alone"),
]

CLUSTERS = [
    ("en1", "c1"),
    ("de1", "c1"),
    ("fr1", "c1"),
    ("en2", "c2"),
    ("de2", "c2"),
]


@pytest.fixture(scope="module")
def frames(spark):
    s = spark.createDataFrame(
        SENTS, "url string, lang string, sent_idx long, sentence string"
    )
    c = spark.createDataFrame(CLUSTERS, "node string, cluster string")
    return s, c


def test_alignment_and_gate(spark, frames):
    s, c = frames
    out = sorted(tuple(r) for r in bitext_candidates(s, c).collect())
    assert out == sorted(
        [
            # de < en: canonical order puts german first
            ("c1", "de1", "de", "en1", "en", 0, "hallo", "hello"),
            ("c1", "de1", "de", "en1", "en", 1, "welt", "world"),
            ("c1", "de1", "de", "fr1", "fr", 0, "hallo", "bonjour"),
            ("c1", "en1", "en", "fr1", "fr", 0, "hello", "bonjour"),
            # c2 gated out: |1-3|*100 > 50*3
        ]
    )


def test_gate_loosened(spark, frames):
    s, c = frames
    out = bitext_candidates(s, c, max_count_diff_pct=100)
    assert out.where("cluster = 'c2'").count() == 1  # sent_idx 0 only


def test_oracle_twin(spark, frames):
    s, c = frames
    got = sorted(tuple(r) for r in bitext_candidates(s, c).collect())
    sv = ", ".join(f"('{u}', '{l}', {i}, '{t}')" for u, l, i, t in SENTS)
    cv = ", ".join(f"('{n}', '{cl}')" for n, cl in CLUSTERS)
    sql = bitext_candidates_oracle_sql(
        f"SELECT * FROM (VALUES {sv}) v(url, lang, sent_idx, sentence)",
        f"SELECT * FROM (VALUES {cv}) w(node, cluster)",
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
