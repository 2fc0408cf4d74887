"""resolve_href / doc_link_graph: RFC 3986 resolution branches and
in-corpus membership on closed HTML."""

from pyspark.sql import functions as F

from easyner_spark.operators.webtext import doc_link_graph, resolve_href


def test_resolve_href_branches(spark):
    rows = [
        ("https://a.com:8080/dir/page.html", "https://b.org/x", "https://b.org/x"),
        ("https://a.com/dir/page.html", "//c.net/y", "https://c.net/y"),
        ("http://a.com/dir/page.html", "//c.net/y", "http://c.net/y"),
        ("https://a.com:8080/dir/page.html", "/root", "https://a.com:8080/root"),
        ("https://a.com/dir/page.html", "rel.html", "https://a.com/dir/rel.html"),
        ("https://a.com", "rel.html", "https://a.com/rel.html"),  # empty path
        ("https://a.com/dir/page.html", "mailto:x@y.z", None),
        ("https://a.com/dir/page.html", "javascript:void(0)", None),
        # dot segments kept verbatim (documented)
        ("https://a.com/dir/page.html", "../up", "https://a.com/dir/../up"),
    ]
    df = spark.createDataFrame(
        [(b, h) for b, h, _ in rows], "base string, href string"
    )
    got = [
        r["out"]
        for r in df.select(
            resolve_href(F.col("base"), F.col("href")).alias("out")
        ).collect()
    ]
    assert got == [want for _, _, want in rows]


def test_doc_link_graph_membership(spark):
    rows = [
        (
            "https://a.com/p/1",
            '<a href="/p/2">x</a><a href="https://b.org/out">y</a>'
            '<a href="/p/2">x2</a>',
        ),
        ("https://a.com/p/2", '<a href="/p/1">z</a>'),
    ]
    pages = spark.createDataFrame(rows, "url string, html string")
    pages = pages.withColumn("html", pages["html"].cast("binary"))
    internal = {
        (r["src_url"], r["dst_url"]): r["n_links"]
        for r in doc_link_graph(pages).collect()
    }
    assert internal == {
        ("https://a.com/p/1", "https://a.com/p/2"): 2,
        ("https://a.com/p/2", "https://a.com/p/1"): 1,
    }
    ext = {
        r["dst_url"]: r["in_corpus"]
        for r in doc_link_graph(pages, keep_external=True).collect()
    }
    assert ext["https://b.org/out"] is False
    assert ext["https://a.com/p/2"] is True


def test_surt_key(spark):
    from easyner_spark.operators.webtext import surt_key

    rows = [
        ("https://blog.example.org:8080/p/1", "org,example,blog)/p/1"),
        ("http://EXAMPLE.com", "com,example)/"),
        ("https://a.b.c.example.net/x/y?q=1#f", "net,example,c,b,a)/x/y"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], "url string")
    got = [r["s"] for r in df.select(surt_key("url").alias("s")).collect()]
    assert got == [want for _, want in rows]
    # domain locality: every subdomain of example.org sorts together
    urls = [
        "https://z.other.com/1",
        "https://blog.example.org/1",
        "https://example.org/2",
        "https://www.example.org/3",
    ]
    d2 = spark.createDataFrame([(u,) for u in urls], "url string")
    surts = sorted(r["s"] for r in d2.select(surt_key("url").alias("s")).collect())
    org_block = [s for s in surts if s.startswith("org,example")]
    i = surts.index(org_block[0])
    assert surts[i : i + len(org_block)] == org_block  # contiguous
