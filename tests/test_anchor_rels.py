"""Link-rel classification (webtext.anchor_rels)."""

import duckdb
import pytest

from easyner_spark.operators.webtext import (
    anchor_rels,
    anchor_rels_oracle_sql,
)

PAGES = [
    (
        "https://a.com/p",
        '<html><a href="https://x.com/1" rel="nofollow">n</a>'
        '<a href="https://x.com/2" rel="ugc sponsored">u</a>'
        '<a href="https://x.com/3" rel="noopener">o</a>'
        '<a href="/local">plain</a></html>',
    ),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "url string, html string")


def test_rels(spark, pages):
    got = {(r.dst, r.rel, r.follow) for r in anchor_rels(pages).collect()}
    assert got == {
        ("https://x.com/1", "nofollow", False),
        ("https://x.com/2", "ugc sponsored", False),
        # noopener is not an endorsement opt-out
        ("https://x.com/3", "noopener", True),
        ("https://a.com/local", None, True),
    }


def test_oracle_twin(spark, pages):
    got = sorted(
        tuple("" if v is None else v for v in r)
        for r in anchor_rels(pages).collect()
    )
    pv = ", ".join(f"('{u}', '{h}')" for u, h in PAGES)
    sql = anchor_rels_oracle_sql(f"SELECT * FROM (VALUES {pv}) v(url, html)")
    want = sorted(
        tuple("" if v is None else v for v in r)
        for r in duckdb.sql(sql).fetchall()
    )
    assert got == want
