"""AMP-variant declarations (webtext.extract_amphtml)."""

import duckdb
import pytest

from easyner_spark.operators.webtext import (
    extract_amphtml,
    extract_amphtml_oracle_sql,
    url_equivalence,
)

PAGES = [
    ("https://a.com/story", '<html><link rel="amphtml"'
     ' href="https://a.com/amp/story"></html>'),
    # root-relative AMP target resolves against the page
    ("https://b.com/x/y", '<html><link rel="amphtml" href="/amp/y"></html>'),
    ("https://c.com/p", "<html><p>no amp</p></html>"),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "url string, html string")


def test_edges(spark, pages):
    got = {tuple(r) for r in extract_amphtml(pages).collect()}
    assert got == {
        ("https://a.com/story", "https://a.com/amp/story"),
        ("https://b.com/x/y", "https://b.com/amp/y"),
    }


def test_feeds_url_equivalence(spark, pages):
    # the declared contract: AMP edges ride url_equivalence's
    # redirects argument and fold variants into one class
    eq = dict(
        (r.node, r.canonical)
        for r in url_equivalence(pages, extract_amphtml(pages)).collect()
    )
    assert eq["https://a.com/amp/story"] == eq["https://a.com/story"]


def test_oracle_twin(spark, pages):
    got = sorted(tuple(r) for r in extract_amphtml(pages).collect())
    pv = ", ".join(f"('{u}', '{h}')" for u, h in PAGES)
    sql = extract_amphtml_oracle_sql(f"SELECT * FROM (VALUES {pv}) v(url, html)")
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
