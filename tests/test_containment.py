"""Asymmetric containment detection (dedup.containment_pairs)."""

import duckdb
import pytest

from easyner_spark.operators.dedup import (
    containment_pairs,
    containment_pairs_oracle_sql,
)

ARTICLE = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
)
# portal embeds the whole article between its own chrome -> every
# article shingle appears in the portal; the reverse direction fails
# the 80% gate (the portal has its own chrome shingles)
PORTAL = "portal home news weather sports " + ARTICLE + " contact about terms privacy legal"
OTHER = (
    "uniform victor whiskey xray yankee zulu one two three four five "
    "six seven eight nine ten eleven twelve thirteen fourteen"
)

DOCS = [(1, ARTICLE), (2, PORTAL), (3, OTHER)]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_asymmetric_containment(spark, docs):
    out = {
        (r.container, r.contained): (r.shared, r.n_container, r.n_contained)
        for r in containment_pairs(docs, k=5).collect()
    }
    # article: 20 words -> 16 distinct 5-shingles, all inside the portal
    assert (2, 1) in out
    shared, n_portal, n_article = out[(2, 1)]
    assert shared == n_article == 16
    # reverse direction gated out: portal has 16 + chrome shingles
    assert (1, 2) not in out
    assert n_portal > n_article
    # the unrelated doc pairs with nothing
    assert all(3 not in pair for pair in out)


def test_mutual_containment_emits_both(spark, docs):
    # drop the gate to 40%: the portal side (16 shared of 26 total =
    # ~62%) now passes too -> both directions emitted
    out = {
        (r.container, r.contained)
        for r in containment_pairs(docs, k=5, min_containment_pct=40).collect()
    }
    assert {(2, 1), (1, 2)} <= out


def test_oracle_twin(spark, docs):
    got = sorted(tuple(r) for r in containment_pairs(docs, k=5).collect())
    dv = ", ".join(f"({i}, '{t}')" for i, t in DOCS)
    sql = containment_pairs_oracle_sql(
        f"SELECT * FROM (VALUES {dv}) v(id, text)", k=5
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
