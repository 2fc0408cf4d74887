"""Declared-entity layer (webtext.page_entities)."""

import duckdb
import pytest

from easyner_spark.operators.webtext import (
    page_entities,
    page_entities_oracle_sql,
)

PAGES = [
    # all three surfaces; og:title disagrees with the JSON-LD name
    (
        "u1",
        '<html><head><title> Ada — Bio </title>'
        '<meta property="og:title" content="ada lovelace">'
        '<meta property="og:type" content="profile"></head>'
        '<script type="application/ld+json">'
        '{"@type": "Person", "name": "Ada Lovelace"}</script></html>',
    ),
    # title only (the fallback every page has)
    ("u2", "<html><title>Plain Page</title></html>"),
    # JSON-LD without a name contributes nothing; og without og:title
    # contributes nothing -> u3 has only its title row
    (
        "u3",
        '<html><title>T3</title>'
        '<meta property="og:type" content="article">'
        '<script type="application/ld+json">{"@type": "WebSite"}</script>'
        "</html>",
    ),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "url string, html string")


def test_sources(spark, pages):
    got = {tuple(r) for r in page_entities(pages).collect()}
    assert got == {
        ("u1", "jsonld", "Person", "Ada Lovelace"),
        ("u1", "og", "profile", "ada lovelace"),
        ("u1", "title", None, "ada — bio"),
        ("u2", "title", None, "plain page"),
        ("u3", "title", None, "t3"),
    }


def test_oracle_twin(spark, pages):
    got = sorted(
        tuple("" if v is None else v for v in r)
        for r in page_entities(pages).collect()
    )
    pv = ", ".join(f"('{u}', '{h.replace(chr(39), chr(39)*2)}')" for u, h in PAGES)
    sql = page_entities_oracle_sql(f"SELECT * FROM (VALUES {pv}) v(url, html)")
    want = sorted(
        tuple("" if v is None else v for v in r)
        for r in duckdb.sql(sql).fetchall()
    )
    assert got == want
