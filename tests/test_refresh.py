"""meta-refresh redirect extraction (webtext.extract_refresh)."""

import duckdb
import pytest

from easyner_spark.operators.webtext import (
    extract_refresh,
    extract_refresh_oracle_sql,
)

PAGES = [
    # absolute target, 0s = hard move
    ("https://a.com/old", '<html><meta http-equiv="refresh"'
     ' content="0;url=https://a.com/new"></html>'),
    # relative target + interstitial delay; resolves against the page
    ("https://b.com/dir/page", '<html><META HTTP-EQUIV="Refresh"'
     ' CONTENT="5; url=next.html"></html>'),
    # root-relative
    ("https://c.com/x", '<html><meta http-equiv="refresh"'
     ' content="3;url=/home"></html>'),
    # no refresh at all
    ("https://d.com/", "<html><p>static</p></html>"),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "url string, html string")


def test_refresh(spark, pages):
    got = {tuple(r) for r in extract_refresh(pages).collect()}
    assert got == {
        ("https://a.com/old", 0, "https://a.com/new"),
        # tag case-insensitive via lower(html); relative resolution
        ("https://b.com/dir/page", 5, "https://b.com/dir/next.html"),
        ("https://c.com/x", 3, "https://c.com/home"),
    }


def test_oracle_twin(spark, pages):
    got = sorted(tuple(r) for r in extract_refresh(pages).collect())
    pv = ", ".join(f"('{u}', '{h}')" for u, h in PAGES)
    sql = extract_refresh_oracle_sql(f"SELECT * FROM (VALUES {pv}) v(url, html)")
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
