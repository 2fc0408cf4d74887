"""extract_meta: head-metadata extraction semantics on closed HTML."""

from easyner_spark.operators.webtext import extract_meta


def test_extract_meta(spark):
    rows = [
        # full head, mixed-case tags, padded title
        (
            "https://a.com/1",
            '<html><head><TITLE>  My Page  </TITLE>'
            '<META NAME="description" CONTENT="hello world">'
            '<LINK REL="canonical" HREF="https://a.com/canon"></head></html>',
        ),
        # no head metadata at all
        ("https://a.com/2", "<html><body>plain</body></html>"),
        # empty title element -> NULL (not '')
        ("https://a.com/3", "<html><head><title>   </title></head></html>"),
        # canonical only
        (
            "https://a.com/4",
            '<html><head><link rel="canonical" href="https://a.com/4c"></head>',
        ),
    ]
    pages = spark.createDataFrame(rows, "url string, html string")
    pages = pages.withColumn("html", pages["html"].cast("binary"))
    got = {r["url"]: r for r in extract_meta(pages).collect()}

    r1 = got["https://a.com/1"]
    assert r1["title"] == "my page"  # lowered + trimmed
    assert r1["meta_desc"] == "hello world"
    assert r1["canonical_href"] == "https://a.com/canon"
    assert r1["effective_url"] == "https://a.com/canon"

    r2 = got["https://a.com/2"]
    assert r2["title"] is None
    assert r2["meta_desc"] is None
    assert r2["canonical_href"] is None
    assert r2["effective_url"] == "https://a.com/2"  # falls back to url

    assert got["https://a.com/3"]["title"] is None  # whitespace-only -> NULL
    assert got["https://a.com/4"]["effective_url"] == "https://a.com/4c"


def test_meta_robots(spark):
    from easyner_spark.operators.webtext import meta_robots

    rows = [
        ("u1", '<head><META NAME="robots" CONTENT="NOINDEX , nofollow"></head>'),
        ("u2", '<head><meta name="robots" content="none"></head>'),
        ("u3", '<head><meta name="robots" content="index, follow"></head>'),
        ("u4", "<head></head>"),
    ]
    pages = spark.createDataFrame(rows, "url string, html string")
    pages = pages.withColumn("html", pages["html"].cast("binary"))
    got = {
        r["url"]: (r["noindex"], r["nofollow"])
        for r in meta_robots(pages).collect()
    }
    assert got["u1"] == (True, True)   # case + spacing tolerant
    assert got["u2"] == (True, True)   # 'none' implies both
    assert got["u3"] == (False, False)
    assert got["u4"] == (False, False)  # absent tag


def test_hreflang_clusters(spark):
    from easyner_spark.operators.webtext import (
        extract_hreflang,
        hreflang_clusters,
    )

    rows = [
        # a <-> b mutual, c one-sided into a, d chains off c: ONE cluster
        ("a", '<link rel="alternate" hreflang="en" href="b">'),
        ("b", '<link rel="alternate" hreflang="sv" href="a">'),
        ("c", '<link rel="alternate" hreflang="de" href="a">'),
        ("d", '<link rel="alternate" hreflang="fr" href="c">'),
        # isolated pair
        ("x", '<link rel="alternate" hreflang="en" href="y">'),
        # page with no alternates: absent from output
        ("z", "<p>nothing</p>"),
    ]
    pages = spark.createDataFrame(rows, "url string, html string")
    pages = pages.withColumn("html", pages["html"].cast("binary"))
    ex = extract_hreflang(pages)
    assert {(r["url"], r["hreflang"], r["href"]) for r in ex.collect()} == {
        ("a", "en", "b"),
        ("b", "sv", "a"),
        ("c", "de", "a"),
        ("d", "fr", "c"),
        ("x", "en", "y"),
    }
    got = {r["node"]: r["cluster"] for r in hreflang_clusters(pages).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}
