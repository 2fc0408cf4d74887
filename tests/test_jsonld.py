"""JSON-LD extraction (webtext.extract_jsonld)."""

import duckdb
import pytest

from easyner_spark.operators.webtext import (
    extract_jsonld,
    extract_jsonld_oracle_sql,
)

P1 = (
    '<html><script type="application/ld+json">'
    '{"@context": "https://schema.org", "@type": "Person", "name": "Ada Lovelace"}'
    "</script><p>x</p>"
    '<script type="application/ld+json">{"@type":"Book","name":"Notes"}</script>'
    "</html>"
)
# type present, name absent; plain script ignored
P2 = (
    '<html><script type="application/ld+json">{"@type": "WebSite"}</script>'
    "<script>var x = 1;</script></html>"
)
P3 = "<html><p>nothing structured</p></html>"

PAGES = [("u1", P1), ("u2", P2), ("u3", P3)]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "url string, html string")


def test_blocks(spark, pages):
    got = {
        (r.url, r.block_idx, r.type, r.name)
        for r in extract_jsonld(pages).collect()
    }
    assert got == {
        # case-preserving: "Person", not "person"
        ("u1", 0, "Person", "Ada Lovelace"),
        ("u1", 1, "Book", "Notes"),
        ("u2", 0, "WebSite", None),
    }
    payloads = {r.block_idx: r.payload for r in extract_jsonld(pages).where("url = 'u1'").collect()}
    assert payloads[1] == '{"@type":"Book","name":"Notes"}'


def test_oracle_twin(spark, pages):
    got = sorted(
        tuple("" if v is None else v for v in r)
        for r in extract_jsonld(pages).collect()
    )
    pv = ", ".join(f"('{u}', '{h.replace(chr(39), chr(39)*2)}')" for u, h in PAGES)
    sql = extract_jsonld_oracle_sql(f"SELECT * FROM (VALUES {pv}) v(url, html)")
    want = sorted(
        tuple("" if v is None else v for v in r)
        for r in duckdb.sql(sql).fetchall()
    )
    assert got == want
