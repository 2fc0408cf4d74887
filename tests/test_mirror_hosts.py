"""Cross-host mirror detection (webtext.mirror_hosts)."""

import duckdb
import pytest

from easyner_spark.operators.webtext import (
    mirror_hosts,
    mirror_hosts_oracle_sql,
)

# (url, text): m.example mirrors 3 of a.example's 4 pages; b.example
# shares only 1 page with a.example (below min_shared); every host
# serves the ubiquitous parked-domain page "parked" which the
# max_hosts_per_digest cap must exclude from mirror evidence.
PAGES = [
    ("http://a.example/1", "alpha"),
    ("http://a.example/2", "beta"),
    ("http://a.example/3", "gamma"),
    ("http://a.example/4", "delta"),
    ("http://a.example/p", "parked"),
    ("http://m.example/1", "alpha"),
    ("http://m.example/2", "beta"),
    ("http://m.example/3", "gamma"),
    ("http://m.example/p", "parked"),
    ("http://b.example/1", "alpha"),
    ("http://b.example/2", "epsilon"),
    ("http://b.example/p", "parked"),
    ("http://c.example/1", "zeta"),
    ("http://c.example/p", "parked"),
    # same page served twice by one host (recrawl dup url path):
    # distinct (host, digest) counts it once
    ("http://m.example/1bis", "alpha"),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "url string, text string")


def test_mirror_pair_flagged(spark, pages):
    out = {tuple(r) for r in mirror_hosts(pages, max_hosts_per_digest=3).collect()}
    # a: {alpha,beta,gamma,delta,parked}=5 digests, m: {alpha,beta,
    # gamma,parked}=4; "parked" is on 4 hosts > cap 3 -> excluded, so
    # shared=3 and 3*100 >= 50*min(5,4) -> flagged. (a,b) share only
    # alpha (1 < min_shared 2); c shares nothing eligible.
    assert out == {("a.example", "m.example", 3, 5, 4)}


def test_containment_not_jaccard(spark, pages):
    # with the gate at 75%: shared=3 vs smaller side 4 -> 75% passes
    # even though Jaccard 3/6 = 50% would not
    out = mirror_hosts(pages, min_overlap_pct=75, max_hosts_per_digest=3)
    assert out.count() == 1


def test_cap_excludes_ubiquitous_digest(spark, pages):
    # raising the cap lets "parked" count as mirror evidence: (a,m)
    # shared becomes 4, and 2-page hosts now pair via parked+alpha
    out = {
        (r.host_a, r.host_b, r.shared)
        for r in mirror_hosts(pages, max_hosts_per_digest=32).collect()
    }
    assert ("a.example", "m.example", 4) in out
    assert ("a.example", "b.example", 2) in out


def test_oracle_twin(spark, pages):
    got = sorted(
        tuple(r) for r in mirror_hosts(pages, max_hosts_per_digest=3).collect()
    )
    pv = ", ".join(f"('{u}', '{t}')" for u, t in PAGES)
    sql = mirror_hosts_oracle_sql(
        f"SELECT * FROM (VALUES {pv}) v(url, text)", max_hosts_per_digest=3
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
