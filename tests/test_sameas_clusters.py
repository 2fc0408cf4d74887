"""sameAs entity clusters (webtext.sameas_clusters)."""

import duckdb
import pytest

from easyner_spark.operators.webtext import (
    sameas_clusters,
    sameas_clusters_oracle_sql,
)


def _pg(block: str) -> str:
    return f'<html><script type="application/ld+json">{block}</script></html>'


# a and b share wiki; b and c share wikidata -> one 5-node chain class;
# d cites its own authority -> separate 2-node class; e has no sameAs
PAGES = [
    ("https://a.com/p", _pg('{"@type":"Person","name":"X",'
                            '"sameAs": ["https://wiki.org/X"]}')),
    ("https://b.com/p", _pg('{"@type":"Person",'
                            '"sameAs": ["https://wiki.org/X", "https://wd.org/Q1"]}')),
    ("https://c.com/p", _pg('{"@type":"Person","sameAs": "https://wd.org/Q1"}')),
    ("https://d.com/p", _pg('{"@type":"Org","sameAs": "https://wd.org/Q9"}')),
    ("https://e.com/p", _pg('{"@type":"Org","name":"no alignment"}')),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "url string, html string")


def test_chain_merge(spark, pages):
    got = {(r.node, r.entity) for r in sameas_clusters(pages).collect()}
    chain = {
        "https://a.com/p", "https://b.com/p", "https://c.com/p",
        "https://wiki.org/X", "https://wd.org/Q1",
    }
    assert {(n, "https://a.com/p") for n in chain} <= got
    assert ("https://d.com/p", "https://d.com/p") in got
    assert ("https://wd.org/Q9", "https://d.com/p") in got
    assert not any(n == "https://e.com/p" for n, _ in got)


def test_oracle_twin(spark, pages):
    got = sorted(tuple(r) for r in sameas_clusters(pages).collect())
    pv = ", ".join(f"('{u}', '{h.replace(chr(39), chr(39)*2)}')" for u, h in PAGES)
    sql = sameas_clusters_oracle_sql(f"SELECT * FROM (VALUES {pv}) v(url, html)")
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
