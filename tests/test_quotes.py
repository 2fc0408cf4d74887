"""Quote attribution (triples.quote_attributions)."""

import duckdb
import pytest

from easyner_spark.operators.triples import (
    quote_attributions,
    quote_attributions_oracle_sql,
)

DOCS = [
    (1, 'Intro. "The results are solid," said Ada Lovelace. More text. '
        '"We will verify everything" says Grace Hopper.'),
    # too-short quote (under 10 chars) never extracts
    (2, '"No way," said Bob.'),
    (3, "no quotes at all"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_quotes(spark, docs):
    got = {tuple(r) for r in quote_attributions(docs).collect()}
    assert got == {
        (1, 0, "ada lovelace", "said", "The results are solid,"),
        (1, 1, "grace hopper", "says", "We will verify everything"),
    }


def test_oracle_twin(spark, docs):
    got = sorted(tuple(r) for r in quote_attributions(docs).collect())
    dv = ", ".join(
        "({}, '{}')".format(i, t.replace("'", "''")) for i, t in DOCS
    )
    sql = quote_attributions_oracle_sql(
        f"SELECT * FROM (VALUES {dv}) v(id, text)"
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
