"""Per-host structured-data adoption (webtext.host_surface_profile)."""

import duckdb
import pytest

from easyner_spark.operators.webtext import (
    host_surface_profile,
    host_surface_profile_oracle_sql,
)

JL = '<script type="application/ld+json">{"@type":"T"}</script>'
OG = '<meta property="og:title" content="x">'

PAGES = [
    ("https://a.com/1", f"<html><title>t</title>{JL}{OG}</html>"),
    ("https://a.com/2", f"<html><title>t</title>{JL}</html>"),
    ("https://a.com/3", "<html><title>t</title><table></table></html>"),
    ("https://b.com/1", "<html><p>bare</p></html>"),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "url string, html string")


def test_profile(spark, pages):
    got = {tuple(r) for r in host_surface_profile(pages).collect()}
    assert got == {
        # a.com: 3 pages, 2 jsonld (66%), 1 og (33%), 1 table, all titles
        ("a.com", 3, 66, 33, 33, 100),
        ("b.com", 1, 0, 0, 0, 0),
    }


def test_oracle_twin(spark, pages):
    got = sorted(tuple(r) for r in host_surface_profile(pages).collect())
    pv = ", ".join(f"('{u}', '{h.replace(chr(39), chr(39)*2)}')" for u, h in PAGES)
    sql = host_surface_profile_oracle_sql(
        f"SELECT * FROM (VALUES {pv}) v(url, html)"
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
