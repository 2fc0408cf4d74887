"""sitemap_parse / sitemap_frontier: block-wise extraction and the
announced-but-unfetched anti-join."""

from easyner_spark.operators.webtext import sitemap_frontier, sitemap_parse

XML = """<?xml version="1.0"?>
<urlset>
  <url>
    <loc>https://a.com/p/1</loc>
    <lastmod>2026-01-05</lastmod>
  </url>
  <url><loc>https://a.com/p/2</loc></url>
  <url><lastmod>2026-02-02</lastmod></url>
</urlset>"""


def test_parse_blocks(spark):
    df = spark.createDataFrame(
        [("https://a.com/sitemap.xml", XML)], "url string, sitemap_xml string"
    )
    got = {
        r["loc"]: r["lastmod"] for r in sitemap_parse(df).collect()
    }
    # lastmod attaches only to ITS block; loc-less entry dropped
    assert got == {"https://a.com/p/1": "2026-01-05", "https://a.com/p/2": None}


def test_frontier_anti_join(spark):
    sm = spark.createDataFrame(
        [
            ("https://a.com/sitemap.xml", XML),
            # second sitemap announces p/2 as well: dedup to one row
            (
                "https://a.com/sitemap2.xml",
                "<urlset><url><loc>https://a.com/p/2</loc></url></urlset>",
            ),
        ],
        "url string, sitemap_xml string",
    )
    pages = spark.createDataFrame([("https://a.com/p/1",)], "url string")
    got = {
        r["loc"]: r["sitemap_url"] for r in sitemap_frontier(sm, pages).collect()
    }
    # p/1 already fetched; p/2 announced twice -> once, min sitemap wins
    assert got == {"https://a.com/p/2": "https://a.com/sitemap.xml"}


def test_stale_announcements(spark):
    from easyner_spark.operators.webtext import stale_announcements

    entries = spark.createDataFrame(
        [
            ("https://a.com/p/1", "2026-03-01"),  # fetched 2026-02-15 -> stale
            ("https://a.com/p/2", "2026-01-01"),  # fetched later -> fresh
            ("https://a.com/p/3", None),          # no lastmod -> fresh
            ("https://a.com/p/9", "2026-03-01"),  # never fetched -> absent
        ],
        "loc string, lastmod string",
    )
    meta = spark.createDataFrame(
        [
            ("https://a.com/p/1", "2026-02-15"),
            ("https://a.com/p/2", "2026-02-15"),
            ("https://a.com/p/3", "2026-02-15"),
        ],
        "url string, fetch_date string",
    )
    got = {
        r["url"]: r["status"]
        for r in stale_announcements(entries, meta).collect()
    }
    assert got == {
        "https://a.com/p/1": "stale",
        "https://a.com/p/2": "fresh",
        "https://a.com/p/3": "fresh",
    }
