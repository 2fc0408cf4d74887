"""Sitemap announcements in robots.txt (webtext.robots_sitemaps)."""

import duckdb
import pytest

from easyner_spark.operators.webtext import (
    robots_sitemaps,
    robots_sitemaps_oracle_sql,
)

R1 = (
    "User-agent: *\n"
    "Disallow: /private\n"
    "Sitemap: https://a.com/sitemap.xml\n"
    "User-agent: googlebot\n"
    "Disallow: /\n"
    "sitemap: https://a.com/news.xml  # case-insensitive, global\n"
)
R2 = "Sitemap: /relative-not-allowed\nSitemap: ftp://a.b/x\n"
R3 = "User-agent: *\nAllow: /\n"

ROBOTS = [
    ("https://a.com/robots.txt", R1),
    ("https://b.com/robots.txt", R2),
    ("https://c.com/robots.txt", R3),
]


@pytest.fixture(scope="module")
def robots(spark):
    return spark.createDataFrame(ROBOTS, "url string, robots_txt string")


def test_sitemaps(spark, robots):
    got = {tuple(r) for r in robots_sitemaps(robots).collect()}
    assert got == {
        # global: the news.xml line inside the googlebot group counts
        ("a.com", "https://a.com/sitemap.xml", 2),
        ("a.com", "https://a.com/news.xml", 5),
        # relative and non-http values dropped per spec
    }


def test_oracle_twin(spark, robots):
    got = sorted(tuple(r) for r in robots_sitemaps(robots).collect())
    # VALUES strings need real newlines: e'' escape strings
    rv = ", ".join(
        f"('{u}', e'{t.replace(chr(10), chr(92) + 'n')}')" for u, t in ROBOTS
    )
    sql = robots_sitemaps_oracle_sql(
        f"SELECT * FROM (VALUES {rv}) v(url, robots_txt)"
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
