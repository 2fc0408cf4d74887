"""Document outline extraction (webtext.extract_headings)."""

import duckdb
import pytest

from easyner_spark.operators.webtext import (
    extract_headings,
    extract_headings_oracle_sql,
)

PAGES = [
    (
        "u1",
        '<html><h1 class="t"> Main Title </h1><p>x</p>'
        "<h2>Section One</h2><h3>Sub</h3><h2>Section Two</h2>"
        "<h4></h4></html>",  # empty heading dropped
    ),
    ("u2", "<html><p>no headings</p></html>"),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "url string, html string")


def test_outline(spark, pages):
    got = [
        (r.heading_idx, r.level, r.text)
        for r in extract_headings(pages).orderBy("heading_idx").collect()
    ]
    assert got == [
        (0, 1, "main title"),
        (1, 2, "section one"),
        (2, 3, "sub"),
        (3, 2, "section two"),
    ]


def test_oracle_twin(spark, pages):
    got = sorted(tuple(r) for r in extract_headings(pages).collect())
    pv = ", ".join(f"('{u}', '{h}')" for u, h in PAGES)
    sql = extract_headings_oracle_sql(f"SELECT * FROM (VALUES {pv}) v(url, html)")
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
