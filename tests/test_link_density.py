"""Anchor-text link density (jusText-style list-page / nav-hub signal).

Reference parity: EasyNER never sees HTML (inputs are abstracts,
scripts/downloader.py); north_star crawl-curation surface — a tag
cloud is fluent word-by-word, what flags it is text living inside <a>.
"""

import pytest

from easyner_spark.operators.webtext import link_density


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        # nav hub: nearly all visible text is anchor text
        ("hub", '<html><body><a href="/a">one link</a><a href="/b">two '
                'link</a>z</body></html>'),
        # article: one short link inside long prose
        ("art", '<html><body>' + "prose " * 40
                + '<a href="/x">ref</a></body></html>'),
        # no anchors at all
        ("plain", "<html><body>just text here</body></html>"),
        # empty body
        ("empty", "<html><body></body></html>"),
    ]
    return spark.createDataFrame(rows, "url string, html string")


def test_counts_and_flag(spark, pages):
    out = {r.url: r for r in link_density(pages).collect()}
    hub = out["hub"]
    assert hub.n_anchors == 2
    assert hub.anchor_chars == len("one link") + len("two link")
    assert hub.n_chars == hub.anchor_chars + 1  # the stray 'z'
    assert hub.is_linkfarm_page
    art = out["art"]
    assert art.n_anchors == 1 and art.anchor_chars == 3
    assert not art.is_linkfarm_page
    assert out["plain"].n_anchors == 0
    assert out["plain"].density_micro == 0
    e = out["empty"]
    assert (e.n_chars, e.density_micro, e.is_linkfarm_page) == (0, 0, False)


def test_density_micro_exact(spark, pages):
    out = {r.url: r for r in link_density(pages).collect()}
    hub = out["hub"]
    assert hub.density_micro == hub.anchor_chars * 1000000 // hub.n_chars
