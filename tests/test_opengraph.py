"""Open Graph extraction (webtext.extract_opengraph)."""

import duckdb
import pytest

from easyner_spark.operators.webtext import (
    extract_opengraph,
    extract_opengraph_oracle_sql,
)

PAGES = [
    (
        "u1",
        '<html><head><meta property="og:title" content="Alan Turing">'
        '<meta property="og:type" content="profile">'
        '<meta property="og:image" content="https://x.com/1.png">'
        '<meta property="og:image" content="https://x.com/2.png">'
        "</head></html>",
    ),
    # non-og meta and a name= (not property=) variant: both ignored
    (
        "u2",
        '<html><meta name="og:title" content="nope">'
        '<meta property="description" content="nope"></html>',
    ),
    ("u3", "<html><p>no head metadata</p></html>"),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "url string, html string")


def test_props(spark, pages):
    got = {tuple(r) for r in extract_opengraph(pages).collect()}
    assert got == {
        ("u1", 0, "title", "alan turing"),
        ("u1", 1, "type", "profile"),
        ("u1", 2, "image", "https://x.com/1.png"),
        ("u1", 3, "image", "https://x.com/2.png"),
    }


def test_oracle_twin(spark, pages):
    got = sorted(tuple(r) for r in extract_opengraph(pages).collect())
    pv = ", ".join(f"('{u}', '{h}')" for u, h in PAGES)
    sql = extract_opengraph_oracle_sql(
        f"SELECT * FROM (VALUES {pv}) v(url, html)"
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
