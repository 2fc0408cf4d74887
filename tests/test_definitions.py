"""Glossary extraction (webtext.extract_definitions)."""

import duckdb
import pytest

from easyner_spark.operators.webtext import (
    extract_definitions,
    extract_definitions_oracle_sql,
)

PAGES = [
    (
        "u1",
        "<html><dl><dt> mTOR </dt><dd>a kinase regulating growth</dd>"
        "<dt>TSC1</dt>\n<dd>hamartin, a tumor suppressor</dd>"
        "<dt>orphan-term</dt></dl>"
        "<p>x</p><dl><dt>Second</dt><dd>another list</dd></dl></html>",
    ),
    ("u2", "<html><dt>stray, no dl</dt><dd>ignored</dd></html>"),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "url string, html string")


def test_definitions(spark, pages):
    got = {tuple(r) for r in extract_definitions(pages).collect()}
    assert got == {
        ("u1", 0, 0, "mtor", "a kinase regulating growth"),
        ("u1", 0, 1, "tsc1", "hamartin, a tumor suppressor"),
        ("u1", 1, 0, "second", "another list"),
    }


def test_oracle_twin(spark, pages):
    got = sorted(tuple(r) for r in extract_definitions(pages).collect())
    pv = ", ".join(
        f"('{u}', e'{h.replace(chr(10), chr(92) + 'n')}')" for u, h in PAGES
    )
    sql = extract_definitions_oracle_sql(
        f"SELECT * FROM (VALUES {pv}) v(url, html)"
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
