"""Sitemap index parsing (webtext.sitemap_index_parse)."""

import duckdb
import pytest

from easyner_spark.operators.webtext import (
    sitemap_index_parse,
    sitemap_index_parse_oracle_sql,
)

IDX = (
    "<sitemapindex>\n"
    "<sitemap>\n  <loc>https://a.com/sm-1.xml</loc>\n"
    "  <lastmod>2026-01-05</lastmod>\n</sitemap>\n"
    "<sitemap><loc>https://a.com/sm-2.xml</loc></sitemap>\n"
    "<sitemap><lastmod>2026-01-01</lastmod></sitemap>\n"  # no loc: dropped
    "</sitemapindex>"
)

INDEXES = [("https://a.com/sitemap.xml", IDX), ("https://b.com/sm.xml", "<x/>")]


@pytest.fixture(scope="module")
def indexes(spark):
    return spark.createDataFrame(INDEXES, "url string, sitemap_xml string")


def test_children(spark, indexes):
    got = {tuple(r) for r in sitemap_index_parse(indexes).collect()}
    assert got == {
        ("https://a.com/sitemap.xml", "https://a.com/sm-1.xml", "2026-01-05"),
        ("https://a.com/sitemap.xml", "https://a.com/sm-2.xml", None),
    }


def test_oracle_twin(spark, indexes):
    got = sorted(
        tuple("" if v is None else v for v in r)
        for r in sitemap_index_parse(indexes).collect()
    )
    iv = ", ".join(
        f"('{u}', e'{x.replace(chr(10), chr(92) + 'n')}')" for u, x in INDEXES
    )
    sql = sitemap_index_parse_oracle_sql(
        f"SELECT * FROM (VALUES {iv}) v(url, sitemap_xml)"
    )
    want = sorted(
        tuple("" if v is None else v for v in r)
        for r in duckdb.sql(sql).fetchall()
    )
    assert got == want
