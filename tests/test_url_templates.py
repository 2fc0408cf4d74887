"""URL path-template profiling (webtext.url_templates)."""

import duckdb
import pytest

from easyner_spark.operators.webtext import (
    url_templates,
    url_templates_oracle_sql,
)

PAGES = [
    ("https://a.com/post/8231/comments",),
    ("https://a.com/post/977/comments",),
    ("https://a.com/post/12/comments",),
    # long hex run folds to {H} (tried before the digit rule)
    ("https://a.com/s/deadbeef01/x",),
    ("https://a.com/s/cafebabe99/x",),
    # query string dropped -> same template as above? no: /about page
    ("https://a.com/about?utm_source=x",),
    ("https://a.com/about",),
    # below min_urls -> omitted
    ("https://a.com/unique-page",),
    # bare root
    ("https://b.com",),
    ("https://b.com/",),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "url string")


def test_templates(spark, pages):
    got = {tuple(r) for r in url_templates(pages).collect()}
    assert got == {
        ("a.com", "/post/{N}/comments", 3),
        ("a.com", "/s/{H}/x", 2),
        ("a.com", "/about", 2),
        ("b.com", "/", 2),
    }


def test_oracle_twin(spark, pages):
    got = sorted(tuple(r) for r in url_templates(pages).collect())
    pv = ", ".join(f"('{u}')" for (u,) in PAGES)
    sql = url_templates_oracle_sql(f"SELECT * FROM (VALUES {pv}) v(url)")
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
