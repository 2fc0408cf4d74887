"""alias_candidates: phrase normalization + multi-host confidence gate
on closed HTML."""

from easyner_spark.operators.webtext import alias_candidates


def _page(url, html):
    return (url, html)


def test_confidence_gate(spark):
    rows = [
        # two different hosts name the hub "The  HUB\tportal" (messy ws)
        _page("https://a.com/1", '<a href="//hub.io/x">The  HUB\tportal</a>'),
        _page("https://b.org/1", '<a href="https://hub.io/y">the hub portal</a>'),
        # one host uses a phrase twice: support 2 but single-host
        _page(
            "https://c.net/1",
            '<a href="https://hub.io/z">hub home</a>'
            '<a href="https://hub.io/w">hub home</a>',
        ),
        # empty anchor text is dropped
        _page("https://a.com/2", '<a href="https://hub.io/q"></a>'),
    ]
    pages = spark.createDataFrame(rows, "url string, html string")
    pages = pages.withColumn("html", pages["html"].cast("binary"))
    got = {
        (r["entity_host"], r["alias"]): (
            r["support"],
            r["n_src_hosts"],
            r["is_confident"],
        )
        for r in alias_candidates(pages).collect()
    }
    # whitespace-collapsed, lowercased phrases merge across hosts
    assert got[("hub.io", "the hub portal")] == (2, 2, True)
    # repeated by ONE host: support passes, host gate fails
    assert got[("hub.io", "hub home")] == (2, 1, False)
    # empty anchors never become aliases
    assert all(alias != "" for _, alias in got)
