"""Soft-404 detection: phrase gate, length gate, URL-path signal,
null-text safety, and the zero-shuffle plan contract."""

from easyner_spark.operators.webtext import soft404_signals

PAGES = [
    ("https://a.com/p/1", "Error 404 page not found. Sorry."),
    ("https://a.com/p/2", "A long real article " * 50 + "page not found"),
    ("https://a.com/404", "normal short text"),
    ("https://a.com/not-found/x", None),
    ("https://a.com/p/3", "regular content with nothing odd"),
    ("https://a.com/p/4", "This page does NOT EXIST anymore."),
]


def test_signals(spark):
    pages = spark.createDataFrame(PAGES, ["url", "text"])
    out = {r.url: r for r in soft404_signals(pages).collect()}
    r1 = out["https://a.com/p/1"]
    assert r1.hit_phrase and r1.is_soft404 and not r1.url_404
    # phrase present but text is long -> hit flagged, gate holds
    r2 = out["https://a.com/p/2"]
    assert r2.hit_phrase and not r2.is_soft404
    # URL signal fires independently of text
    r3 = out["https://a.com/404"]
    assert r3.url_404 and not r3.hit_phrase and not r3.is_soft404
    # null text is safe and counts as 0 chars
    r4 = out["https://a.com/not-found/x"]
    assert r4.n_chars == 0 and r4.url_404 and not r4.is_soft404
    assert not out["https://a.com/p/3"].hit_phrase
    # case-insensitive phrase match
    r6 = out["https://a.com/p/4"]
    assert r6.hit_phrase and r6.is_soft404


def test_zero_shuffle_plan(spark):
    pages = spark.createDataFrame(PAGES, ["url", "text"])
    plan = soft404_signals(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
