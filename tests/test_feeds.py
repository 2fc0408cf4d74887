"""RSS/Atom feed parsing (webtext.feed_parse)."""

import duckdb
import pytest

from easyner_spark.operators.webtext import feed_parse, feed_parse_oracle_sql

RSS = (
    "<rss><channel><title>Chan</title>"
    "<item><title>First Post</title><link>https://a.com/P1</link>"
    "<pubDate>Mon, 01 Jan 2026</pubDate></item>"
    "<item><link>https://a.com/P2</link></item>"
    "<item><title>no link, dropped</title></item>"
    "</channel></rss>"
)
ATOM = (
    '<feed><title>F</title><entry><title>Entry One</title>'
    '<link href="https://b.com/E1"/><updated>2026-01-02</updated></entry>'
    '<entry><link href="https://b.com/E2"/></entry></feed>'
)

FEEDS = [("https://a.com/rss", RSS), ("https://b.com/atom.xml", ATOM)]


@pytest.fixture(scope="module")
def feeds(spark):
    return spark.createDataFrame(FEEDS, "url string, feed_xml string")


def test_items(spark, feeds):
    got = {tuple(r) for r in feed_parse(feeds).collect()}
    assert got == {
        # case-preserving content, case-insensitive tags; channel/feed
        # titles never leak into items (block-first matching)
        ("https://a.com/rss", "rss", 0, "https://a.com/P1", "First Post",
         "Mon, 01 Jan 2026"),
        ("https://a.com/rss", "rss", 1, "https://a.com/P2", None, None),
        ("https://b.com/atom.xml", "atom", 0, "https://b.com/E1",
         "Entry One", "2026-01-02"),
        ("https://b.com/atom.xml", "atom", 1, "https://b.com/E2", None, None),
    }


def test_oracle_twin(spark, feeds):
    got = sorted(
        tuple("" if v is None else v for v in r)
        for r in feed_parse(feeds).collect()
    )
    fv = ", ".join(f"('{u}', '{x}')" for u, x in FEEDS)
    sql = feed_parse_oracle_sql(f"SELECT * FROM (VALUES {fv}) v(url, feed_xml)")
    want = sorted(
        tuple("" if v is None else v for v in r)
        for r in duckdb.sql(sql).fetchall()
    )
    assert got == want
