"""Unified discovery frontier (webtext.crawl_frontier)."""

import duckdb
import pytest

from easyner_spark.operators.webtext import (
    crawl_frontier,
    crawl_frontier_oracle_sql,
)

# p1 links to p2 (fetched -> not frontier) and to an external page;
# p2 links relatively to /new (unfetched, same host)
PAGES = [
    (
        "https://a.com/p1",
        '<html><a href="https://a.com/p2">in</a>'
        '<a href="https://ext.org/x">out</a></html>',
    ),
    ("https://a.com/p2", '<html><a href="/new">n</a></html>'),
]

# sitemap announces the same external page (corroboration) plus a
# fresh one; the feed announces an already-fetched page (suppressed)
SITEMAP_URLS = ["https://ext.org/x", "https://a.com/fresh"]
FEED_URLS = ["https://a.com/p1", "https://feed.example/item1"]


@pytest.fixture(scope="module")
def frames(spark):
    p = spark.createDataFrame(PAGES, "url string, html string")
    sm = spark.createDataFrame([(u,) for u in SITEMAP_URLS], "url string")
    fd = spark.createDataFrame([(u,) for u in FEED_URLS], "url string")
    return p, sm, fd


def test_frontier(spark, frames):
    p, sm, fd = frames
    got = {
        tuple(r)
        for r in crawl_frontier(
            p, [(sm, "sitemap"), (fd, "feed")]
        ).collect()
    }
    assert got == {
        ("https://ext.org/x", "link,sitemap", 2),
        ("https://a.com/new", "link", 1),
        ("https://a.com/fresh", "sitemap", 1),
        ("https://feed.example/item1", "feed", 1),
    }


def test_oracle_twin(spark, frames):
    p, sm, fd = frames
    got = sorted(
        tuple(r)
        for r in crawl_frontier(p, [(sm, "sitemap"), (fd, "feed")]).collect()
    )
    pv = ", ".join(f"('{u}', '{h}')" for u, h in PAGES)
    prefix = f"""
WITH d AS (SELECT * FROM (VALUES {pv}) v(src_url, html)),
els AS (SELECT src_url,
          unnest(regexp_extract_all(html,
            '<a href="[^"]*"[^>]*>[^<]*</a>', 0)) AS el FROM d),
pa AS (SELECT src_url, regexp_extract(el, 'href="([^"]*)"', 1) AS href
       FROM els)"""
    pages_sql = f"SELECT src_url AS url FROM (VALUES {pv}) v(src_url, html)"
    sv = ", ".join(f"('{u}')" for u in SITEMAP_URLS)
    fv = ", ".join(f"('{u}')" for u in FEED_URLS)
    sql = crawl_frontier_oracle_sql(
        prefix,
        pages_sql,
        [
            (f"SELECT * FROM (VALUES {sv}) s(url)", "sitemap"),
            (f"SELECT * FROM (VALUES {fv}) f(url)", "feed"),
        ],
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
