"""Per-host language mixture (textstats.host_lang_mix)."""

import duckdb
import pytest

from easyner_spark.operators.textstats import (
    host_lang_mix,
    host_lang_mix_oracle_sql,
)

ROWS = [
    ("a.com", "en"), ("a.com", "en"), ("a.com", "de"),
    ("b.com", "fr"),
]


@pytest.fixture(scope="module")
def rows(spark):
    return spark.createDataFrame(ROWS, "host string, lang_pred string")


def test_mix(spark, rows):
    got = {tuple(r) for r in host_lang_mix(rows).collect()}
    assert got == {
        ("a.com", "en", 2, 666666),
        ("a.com", "de", 1, 333333),
        ("b.com", "fr", 1, 1000000),
    }


def test_oracle_twin(spark, rows):
    got = sorted(tuple(r) for r in host_lang_mix(rows).collect())
    rv = ", ".join(f"('{h}', '{l}')" for h, l in ROWS)
    sql = host_lang_mix_oracle_sql(
        f"SELECT * FROM (VALUES {rv}) v(host, lang)"
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
