"""Social-profile extraction (webtext.social_profiles)."""

import duckdb
import pytest

from easyner_spark.operators.webtext import (
    social_profiles,
    social_profiles_oracle_sql,
)

PAGES = [
    (
        "https://a.com/p",
        '<html><a href="https://twitter.com/AdaL">t</a>'
        '<a href="https://x.com/AdaL">x</a>'
        '<a href="https://www.github.com/ada-l">g</a>'
        '<a href="https://youtube.com/@ada">y</a>'
        '<a href="https://linkedin.com/in/ada.l">l</a>'
        '<a href="https://github.com/ada-l">dup</a>'
        '<a href="https://example.org/not-social">n</a></html>',
    ),
    ("https://b.com/p", '<html><a href="/local">rel</a></html>'),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "url string, html string")


def test_profiles(spark, pages):
    got = {tuple(r) for r in social_profiles(pages).collect()}
    assert got == {
        # twitter.com and x.com both map to 'twitter'; handle lowercased
        ("https://a.com/p", "twitter", "adal"),
        ("https://a.com/p", "github", "ada-l"),
        ("https://a.com/p", "youtube", "ada"),
        ("https://a.com/p", "linkedin", "ada.l"),
    }


def test_oracle_twin(spark, pages):
    got = sorted(tuple(r) for r in social_profiles(pages).collect())
    pv = ", ".join(f"('{u}', '{h}')" for u, h in PAGES)
    sql = social_profiles_oracle_sql(f"SELECT * FROM (VALUES {pv}) v(url, html)")
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
