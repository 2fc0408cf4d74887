"""Exact-integer readability counts (textstats.readability_counts)."""

import duckdb
import pytest

from easyner_spark.operators.textstats import (
    readability_counts,
    readability_counts_oracle_sql,
)

DOCS = [
    # 2 sentences, 6 words; "the"=1 syll, "cat"=1, "sat"=1, "it"=1,
    # "was"=1, "happy"=2 (ha-ppy: a + y groups)
    (1, "The cat sat. It was happy!"),
    # trailing punctuation run + a fragment with no word -> not a sentence
    (2, "Wait... ?? Extraordinary examination!"),
    # "xyzzyx": vowel groups: y, y -> 2; "brr": none -> floored at 1
    (3, "xyzzyx brr"),
    (4, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_counts(spark, docs):
    got = {r.doc_id: tuple(r)[1:] for r in readability_counts(docs).collect()}
    assert got[1] == (2, 6, 7, 3_000_000, 7_000_000 // 6)
    # "wait"=1 group (ai), "extraordinary"=e,ao,i,a,y=5, "examination"=
    # e,a,i,a,io=5 -> 11 syllables / 3 words, 2 sentences
    assert got[2] == (2, 3, 11, 1_500_000, 11_000_000 // 3)
    assert got[3] == (1, 2, 3, 2_000_000, 1_500_000)
    assert got[4] == (0, 0, 0, 0, 0)


def test_oracle_twin(spark, docs):
    got = sorted(tuple(r) for r in readability_counts(docs).collect())
    dv = ", ".join(f"({i}, '{t}')" for i, t in DOCS)
    sql = readability_counts_oracle_sql(
        f"SELECT * FROM (VALUES {dv}) v(id, text)"
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
