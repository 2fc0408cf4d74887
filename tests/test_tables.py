"""HTML table extraction (webtext.extract_tables / infobox_pairs)."""

import duckdb
import pytest

from easyner_spark.operators.webtext import (
    extract_tables,
    extract_tables_oracle_sql,
    infobox_pairs,
    infobox_pairs_oracle_sql,
)

INFOBOX = (
    '<html><body><table class="infobox">'
    "<tr><th>Born</th><td>1912</td></tr>"
    "<tr><th>Field</th><td>Logic</td></tr>"
    "</table><p>prose</p>"
    "<table><tr><td>a</td><td>b</td><td>c</td></tr>"
    "<tr><td>d</td><td>e</td><td>f</td></tr></table></body></html>"
)
NESTED_MARKUP = (
    "<html><table><tr><th>Site</th><td><a href='x'>link</a></td></tr>"
    "<tr><th>Lang</th><td>en</td></tr></table></html>"
)
NO_TABLE = "<html><p>nothing tabular</p></html>"

PAGES = [("u1", INFOBOX), ("u2", NESTED_MARKUP), ("u3", NO_TABLE)]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "url string, html string")


def test_cells(spark, pages):
    got = {tuple(r) for r in extract_tables(pages).collect()}
    # u1: 2x2 infobox + 2x3 layout table; u3 absent entirely
    assert ("u1", 0, 0, 0, "born") in got
    assert ("u1", 0, 1, 1, "logic") in got
    assert ("u1", 1, 1, 2, "f") in got
    assert not any(r[0] == "u3" for r in got)
    # nested markup ends the cell: the <a>-wrapped cell yields no
    # [^<]* run, so that row parses as a single <th> cell
    assert ("u2", 0, 0, 0, "site") in got
    assert ("u2", 0, 1, 1, "en") in got


def test_infobox_arity_gate(spark, pages):
    got = {tuple(r) for r in infobox_pairs(pages).collect()}
    assert got == {
        ("u1", 0, 0, "born", "1912"),
        ("u1", 0, 1, "field", "logic"),
        ("u2", 0, 1, "lang", "en"),
    }


def test_oracle_twins(spark, pages):
    pv = ", ".join(f"('{u}', '{h.replace(chr(39), chr(39) * 2)}')" for u, h in PAGES)
    src = f"SELECT * FROM (VALUES {pv}) v(url, html)"
    for op, osql in (
        (extract_tables, extract_tables_oracle_sql),
        (infobox_pairs, infobox_pairs_oracle_sql),
    ):
        got = sorted(tuple(r) for r in op(pages).collect())
        want = sorted(tuple(r) for r in duckdb.sql(osql(src)).fetchall())
        assert got == want, op.__name__
