"""Generic JSON-LD field pulls (webtext.jsonld_fields)."""

import duckdb
import pytest

from easyner_spark.operators.webtext import (
    jsonld_fields,
    jsonld_fields_oracle_sql,
)

PAGES = [
    (
        "u1",
        '<html><script type="application/ld+json">'
        '{"@type": "Event", "name": "KGC 2026",'
        ' "startDate": "2026-05-05", "location": "Stockholm"}'
        "</script></html>",
    ),
    (
        "u2",
        '<html><script type="application/ld+json">'
        '{"@type": "Product", "name": "Widget", "price": "9.99"}'
        "</script></html>",
    ),
    ("u3", "<html><p>none</p></html>"),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "url string, html string")


def test_fields(spark, pages):
    got = {tuple(r) for r in jsonld_fields(pages).collect()}
    assert got == {
        ("u1", 0, "Event", "startDate", "2026-05-05"),
        ("u1", 0, "Event", "location", "Stockholm"),
        ("u2", 0, "Product", "price", "9.99"),
    }


def test_oracle_twin(spark, pages):
    got = sorted(tuple(r) for r in jsonld_fields(pages).collect())
    pv = ", ".join(f"('{u}', '{h.replace(chr(39), chr(39)*2)}')" for u, h in PAGES)
    sql = jsonld_fields_oracle_sql(f"SELECT * FROM (VALUES {pv}) v(url, html)")
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
