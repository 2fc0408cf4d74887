"""sameAs alignment-edge extraction (webtext.extract_sameas)."""

import duckdb
import pytest

from easyner_spark.operators.webtext import (
    extract_sameas,
    extract_sameas_oracle_sql,
)

P1 = (
    '<html><script type="application/ld+json">'
    '{"@type": "Person", "name": "Ada Lovelace", '
    '"sameAs": ["https://en.wikipedia.org/wiki/Ada_Lovelace", '
    '"https://www.wikidata.org/wiki/Q7259"]}'
    "</script></html>"
)
# single-string form, no name
P2 = (
    '<html><script type="application/ld+json">'
    '{"@type": "Organization", '
    '"sameAs": "https://www.wikidata.org/wiki/Q95"}</script></html>'
)
# block without sameAs contributes nothing
P3 = (
    '<html><script type="application/ld+json">'
    '{"@type": "WebSite", "name": "Site"}</script></html>'
)

PAGES = [("u1", P1), ("u2", P2), ("u3", P3)]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "url string, html string")


def test_edges(spark, pages):
    got = {tuple(r) for r in extract_sameas(pages).collect()}
    assert got == {
        ("u1", 0, "Ada Lovelace", 0,
         "https://en.wikipedia.org/wiki/Ada_Lovelace"),
        ("u1", 0, "Ada Lovelace", 1, "https://www.wikidata.org/wiki/Q7259"),
        ("u2", 0, None, 0, "https://www.wikidata.org/wiki/Q95"),
    }


def test_oracle_twin(spark, pages):
    got = sorted(
        tuple("" if v is None else v for v in r)
        for r in extract_sameas(pages).collect()
    )
    pv = ", ".join(f"('{u}', '{h.replace(chr(39), chr(39)*2)}')" for u, h in PAGES)
    sql = extract_sameas_oracle_sql(f"SELECT * FROM (VALUES {pv}) v(url, html)")
    want = sorted(
        tuple("" if v is None else v for v in r)
        for r in duckdb.sql(sql).fetchall()
    )
    assert got == want
