"""Link-farm / spam-host signals (webtext.host_spam_signals)."""

import duckdb
import pytest

from easyner_spark.operators.webtext import (
    host_spam_signals,
    host_spam_signals_oracle_sql,
)

EDGES = [
    ("farm.com", "promo.com", 90),
    ("farm.com", "x.com", 5),
    ("farm.com", "y.com", 5),
    ("promo.com", "farm.com", 10),
    ("x.com", "a.com", 3),
    ("x.com", "b.com", 3),
    ("x.com", "c.com", 4),
    ("y.com", "y.com", 50),
    ("y.com", "x.com", 2),
]

WANT = {
    # farm pushes 90% of links at one target; 1 of 3 targets links back
    ("farm.com", 100, 3, 90, 33),
    ("promo.com", 10, 1, 100, 100),
    ("x.com", 10, 3, 40, 0),
    # y's self-loop dropped; remaining single target doesn't link back
    ("y.com", 2, 1, 100, 0),
}


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(
        EDGES, "src_host string, dst_host string, n_links long"
    )


def test_signals(spark, edges):
    got = {tuple(r) for r in host_spam_signals(edges).collect()}
    assert got == WANT


def test_keep_self(spark, edges):
    got = {
        r.host: (r.n_out, r.top_share_pct)
        for r in host_spam_signals(edges, drop_self=False).collect()
    }
    # y's self-loop now dominates, and counts as a reciprocated target
    assert got["y.com"] == (52, 50 * 100 // 52)


def test_oracle_twin(spark, edges):
    got = sorted(tuple(r) for r in host_spam_signals(edges).collect())
    ev = ", ".join(f"('{s}', '{d}', {n})" for s, d, n in EDGES)
    sql = host_spam_signals_oracle_sql(
        f"WITH hg AS (SELECT * FROM (VALUES {ev}) v(src_host, dst_host, n_links))"
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
