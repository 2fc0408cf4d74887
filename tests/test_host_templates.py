"""Per-host template detection and stripping."""

import duckdb
import pytest

from easyner_spark.operators.webtext import (
    host_templates,
    host_templates_oracle_sql,
    strip_host_templates,
)

PAGES = [
    # host a.com: 4 pages, footer on all 4 (100%), promo on 2 (50%),
    # and a unique body line per page. One page repeats the footer
    # twice WITHIN the page (must still count once).
    ("https://a.com/1", "body one\nfooter line\npromo"),
    ("https://a.com/2", "body two\nfooter line"),
    ("https://a.com/3", "body three\nfooter line\npromo"),
    ("https://a.com/4", "footer line\nbody four\nfooter line"),
    # host b.com: only 2 pages -> below min_host_pages, never reported
    ("https://b.com/1", "shared\nx"),
    ("https://b.com/2", "shared\ny"),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "url string, text string")


def test_templates_detected(spark, pages):
    out = sorted(
        tuple(r)
        for r in host_templates(pages, min_host_pages=3, min_frac_pct=50).collect()
    )
    assert out == [
        ("a.com", "footer line", 4, 4),
        ("a.com", "promo", 2, 4),
    ]


def test_frac_gate(spark, pages):
    out = host_templates(pages, min_host_pages=3, min_frac_pct=75)
    assert [tuple(r) for r in out.collect()] == [("a.com", "footer line", 4, 4)]


def test_strip(spark, pages):
    tmpl = host_templates(pages, min_host_pages=3, min_frac_pct=50)
    out = {
        r["url"]: (r["text_stripped"], r["n_paras"], r["n_kept"])
        for r in strip_host_templates(pages, tmpl).collect()
    }
    assert out["https://a.com/1"] == ("body one", 3, 1)
    assert out["https://a.com/4"] == ("body four", 3, 1)
    # untouched host keeps everything
    assert out["https://b.com/1"] == ("shared\nx", 2, 2)


def test_pure_template_page(spark):
    pages = spark.createDataFrame(
        [(f"https://c.com/{i}", "only footer") for i in range(3)],
        "url string, text string",
    )
    tmpl = host_templates(pages, min_host_pages=3, min_frac_pct=50)
    out = strip_host_templates(pages, tmpl).collect()
    assert all(r["text_stripped"] == "" and r["n_kept"] == 0 for r in out)


def test_oracle_twin(spark, pages):
    got = sorted(
        tuple(r)
        for r in host_templates(pages, min_host_pages=3, min_frac_pct=50).collect()
    )
    vals = ", ".join(
        "('{}', '{}')".format(u, t.replace("\n", "' || chr(10) || '"))
        for u, t in PAGES
    )
    sql = host_templates_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) v(url, text)",
        min_host_pages=3,
        min_frac_pct=50,
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
