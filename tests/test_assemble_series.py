"""Series text assembly (webtext.assemble_series)."""

import duckdb
import pytest

from easyner_spark.operators.webtext import (
    assemble_series,
    assemble_series_oracle_sql,
)

PAGES = [
    ("a1", "part one."),
    ("a2", "part two."),
    ("a3", "part three."),
    ("solo", "standalone doc."),
    ("cyc", "cycle page."),
]
# (url, series, page_ord, status)
SERIES = [
    ("a1", "a1", 0, "resolved"),
    ("a2", "a1", 1, "resolved"),
    ("a3", "a1", 2, "resolved"),
    ("cyc", "cyc", 4, "unresolved"),
]


@pytest.fixture(scope="module")
def frames(spark):
    p = spark.createDataFrame(PAGES, "url string, text string")
    s = spark.createDataFrame(
        SERIES, "url string, series string, page_ord long, status string"
    )
    return p, s


def test_assembly(spark, frames):
    p, s = frames
    got = {tuple(r) for r in assemble_series(p, s).collect()}
    assert got == {
        ("a1", 3, "part one.\npart two.\npart three."),
        ("solo", 1, "standalone doc."),
        # the unresolved cycle page passes through as its own doc
        ("cyc", 1, "cycle page."),
    }


def test_oracle_twin(spark, frames):
    p, s = frames
    got = sorted(tuple(r) for r in assemble_series(p, s).collect())
    pv = ", ".join(f"('{u}', '{t}')" for u, t in PAGES)
    sv = ", ".join(f"('{u}', '{se}', {o}, '{st}')" for u, se, o, st in SERIES)
    sql = assemble_series_oracle_sql(
        f"SELECT * FROM (VALUES {pv}) v(url, text)",
        f"SELECT * FROM (VALUES {sv}) w(url, series, page_ord, status)",
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
