"""Trap-aware frontier capping (webtext.template_cap)."""

import duckdb
import pytest

from easyner_spark.operators.webtext import (
    template_cap,
    template_cap_oracle_sql,
)

PAGES = [(f"https://trap.com/cal/{i}/day",) for i in range(10)] + [
    ("https://ok.com/about",),
    ("https://ok.com/contact",),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "url string")


def test_cap(spark, pages):
    out = template_cap(pages, cap=3).collect()
    trap = [r for r in out if r.host == "trap.com"]
    assert len(trap) == 3
    assert all(r.template == "/cal/{N}/day" for r in trap)
    # small templates pass through untouched
    assert {r.url for r in out if r.host == "ok.com"} == {
        "https://ok.com/about", "https://ok.com/contact",
    }


def test_deterministic(spark, pages):
    a = {r.url for r in template_cap(pages, cap=3).collect()}
    b = {r.url for r in template_cap(pages, cap=3).collect()}
    assert a == b


def test_oracle_twin(spark, pages):
    got = sorted(tuple(r) for r in template_cap(pages, cap=3).collect())
    pv = ", ".join(f"('{u}')" for (u,) in PAGES)
    sql = template_cap_oracle_sql(f"SELECT * FROM (VALUES {pv}) v(url)", cap=3)
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
