"""Canonical-URL equivalence classes (webtext.url_equivalence)."""

import duckdb
import pytest

from easyner_spark.operators.webtext import (
    url_equivalence,
    url_equivalence_oracle_sql,
)

CANON_HUB = '<html><head><link rel="canonical" href="https://hub.com/c"></head></html>'
CANON_WWW_HUB = (
    '<html><head><link rel="canonical" href="https://www.hub.com/c"></head></html>'
)
PLAIN = "<html><head></head></html>"

# (url, html): the x.com/a variants fold by normalization; the
# declared canonicals bridge them into the hub class; www.hub.com/c
# (a declared TARGET, never crawled) must still fold onto hub.com/c;
# w.com/p/ is an independent 2-node class; z.com/q has no alias
# evidence at all -> absent (singleton classes are implicit).
PAGES = [
    ("https://www.x.com/a", CANON_HUB),
    ("https://x.com/a?utm_source=m", PLAIN),
    ("https://x.com/a/", PLAIN),
    ("https://y.com/b", CANON_WWW_HUB),
    ("https://w.com/p/", PLAIN),
    ("https://z.com/q", PLAIN),
]

REDIRECTS = [("http://old.com/r", "https://x.com/a?utm_source=m")]

CLASS_A = {
    "http://old.com/r",
    "https://hub.com/c",
    "https://www.hub.com/c",
    "https://www.x.com/a",
    "https://x.com/a",
    "https://x.com/a/",
    "https://x.com/a?utm_source=m",
    "https://y.com/b",
}


@pytest.fixture(scope="module")
def frames(spark):
    p = spark.createDataFrame(PAGES, "url string, html string")
    r = spark.createDataFrame(REDIRECTS, "src string, dst string")
    return p, r


def test_classes_with_redirects(spark, frames):
    p, r = frames
    got = {(row.node, row.canonical) for row in url_equivalence(p, r).collect()}
    want = {(n, "http://old.com/r") for n in CLASS_A} | {
        ("https://w.com/p", "https://w.com/p"),
        ("https://w.com/p/", "https://w.com/p"),
    }
    assert got == want
    assert "https://z.com/q" not in {n for n, _ in got}


def test_without_redirects(spark, frames):
    p, _ = frames
    got = dict(
        (row.node, row.canonical) for row in url_equivalence(p).collect()
    )
    # old.com/r gone; the class min falls back to the hub url
    assert "http://old.com/r" not in got
    assert got["https://y.com/b"] == "https://hub.com/c"
    assert got["https://x.com/a/"] == "https://hub.com/c"


def test_oracle_twin(spark, frames):
    p, r = frames
    got = sorted(tuple(row) for row in url_equivalence(p, r).collect())
    pv = ", ".join(f"('{u}', '{h}')" for u, h in PAGES)
    rv = ", ".join(f"('{s}', '{d}')" for s, d in REDIRECTS)
    sql = url_equivalence_oracle_sql(
        f"SELECT * FROM (VALUES {pv}) v(url, html)",
        f"SELECT * FROM (VALUES {rv}) w(src, dst)",
    )
    want = sorted(tuple(row) for row in duckdb.sql(sql).fetchall())
    assert got == want
