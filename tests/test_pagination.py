"""Pagination-series reconstruction (webtext.pagination_series)."""

import duckdb
import pytest

from easyner_spark.operators.webtext import (
    extract_rel_pagination,
    pagination_series,
    pagination_series_oracle_sql,
)


def _pg(*links: str) -> str:
    return "<html><head>" + "".join(links) + "</head></html>"


PAGES = [
    # 3-page series: redundant declarations (both next and prev present)
    ("https://x.com/a1", _pg('<link rel="next" href="/a2">')),
    ("https://x.com/a2",
     _pg('<link rel="prev" href="/a1">', '<link rel="next" href="/a2b">')),
    # relative href: resolves against the page directory -> /a2b ... no:
    # a3's prev declared absolute below
    ("https://x.com/a2b", _pg('<link rel="prev" href="https://x.com/a2">')),
    # 2-cycle: both unresolved at the cap
    ("https://c.com/c1", _pg('<link rel="prev" href="/c2">')),
    ("https://c.com/c2", _pg('<link rel="prev" href="/c1">')),
    # no pagination at all -> absent
    ("https://z.com/solo", "<html><p>one page</p></html>"),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "url string, html string")


def test_extraction(spark, pages):
    got = {tuple(r) for r in extract_rel_pagination(pages).collect()}
    assert ("https://x.com/a1", "next", "https://x.com/a2") in got
    assert ("https://x.com/a2", "prev", "https://x.com/a1") in got


def test_series(spark, pages):
    got = {tuple(r) for r in pagination_series(pages, max_pages=4).collect()}
    assert got == {
        ("https://x.com/a1", "https://x.com/a1", 0, "resolved"),
        ("https://x.com/a2", "https://x.com/a1", 1, "resolved"),
        ("https://x.com/a2b", "https://x.com/a1", 2, "resolved"),
        # the 2-cycle never terminates: capped at max_pages, and after
        # an even number of steps each node is back at itself
        ("https://c.com/c1", "https://c.com/c1", 4, "unresolved"),
        ("https://c.com/c2", "https://c.com/c2", 4, "unresolved"),
    }


def test_oracle_twin(spark, pages):
    got = sorted(
        tuple(r) for r in pagination_series(pages, max_pages=4).collect()
    )
    pv = ", ".join(f"('{u}', '{h}')" for u, h in PAGES)
    sql = pagination_series_oracle_sql(
        f"SELECT * FROM (VALUES {pv}) v(url, html)", max_pages=4
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
