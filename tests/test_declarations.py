"""Self-declared page metadata (webtext.page_declarations)."""

import duckdb
import pytest

from easyner_spark.operators.webtext import (
    page_declarations,
    page_declarations_oracle_sql,
)

PAGES = [
    ("u1", '<html lang="EN-us"><head><meta charset="UTF-8">'
           '<meta property="og:locale" content="en_US"></head></html>'),
    # lang attr must sit on the <html> tag, not any element
    ("u2", '<html><div lang="de">x</div></html>'),
    ("u3", "<html><p>nothing declared</p></html>"),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "url string, html string")


def test_declarations(spark, pages):
    got = {tuple(r) for r in page_declarations(pages).collect()}
    assert got == {
        ("u1", "en-us", "en_us", "utf-8"),
        ("u2", None, None, None),
        ("u3", None, None, None),
    }


def test_oracle_twin(spark, pages):
    got = sorted(
        tuple("" if v is None else v for v in r)
        for r in page_declarations(pages).collect()
    )
    pv = ", ".join(f"('{u}', '{h}')" for u, h in PAGES)
    sql = page_declarations_oracle_sql(
        f"SELECT * FROM (VALUES {pv}) v(url, html)"
    )
    want = sorted(
        tuple("" if v is None else v for v in r)
        for r in duckdb.sql(sql).fetchall()
    )
    assert got == want
