"""HTML list extraction (webtext.extract_lists)."""

import duckdb
import pytest

from easyner_spark.operators.webtext import (
    extract_lists,
    extract_lists_oracle_sql,
)

PAGES = [
    (
        "u1",
        '<html><ul class="nav"><li>Home</li><li>About</li></ul>'
        "<p>x</p><ol><li>First</li><li></li><li>Third</li></ol></html>",
    ),
    ("u2", "<html><p>no lists</p></html>"),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "url string, html string")


def test_items(spark, pages):
    got = {tuple(r) for r in extract_lists(pages).collect()}
    assert got == {
        ("u1", 0, 0, False, "home"),
        ("u1", 0, 1, False, "about"),
        ("u1", 1, 0, True, "first"),
        # the empty <li> keeps its positional slot (idx 1) but is
        # dropped from the output; "third" stays at idx 2
        ("u1", 1, 2, True, "third"),
    }


def test_oracle_twin(spark, pages):
    got = sorted(tuple(r) for r in extract_lists(pages).collect())
    pv = ", ".join(f"('{u}', '{h}')" for u, h in PAGES)
    sql = extract_lists_oracle_sql(f"SELECT * FROM (VALUES {pv}) v(url, html)")
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
