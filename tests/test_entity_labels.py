"""Preferred-label selection (nel.entity_labels)."""

import duckdb
import pytest

from easyner_spark.operators.nel import (
    entity_labels,
    entity_labels_oracle_sql,
)

# mentions: (entity_id, mention_lc). ids m1/m2 merge into component m1.
MENTIONS = [
    ("m1", "mtor"),
    ("m1", "mtor"),
    ("m2", "m-tor"),
    ("m1", "mammalian target of rapamycin"),
    # tie at count 1 within entity t9 -> lexicographic winner
    ("t9", "tsc1"),
    ("t9", "hamartin"),
    # empty id dropped
    ("", "noise"),
]
COMPONENTS = [("m1", "m1"), ("m2", "m1")]


@pytest.fixture(scope="module")
def frames(spark):
    m = spark.createDataFrame(MENTIONS, "entity_id string, mention_lc string")
    c = spark.createDataFrame(COMPONENTS, "node string, component string")
    return m, c


def test_labels(spark, frames):
    m, c = frames
    got = {tuple(r) for r in entity_labels(m, c).collect()}
    assert got == {
        # merged entity m1: 'mtor' x2 beats the others; 3 surfaces, 4 mentions
        ("m1", "mtor", 2, 3, 4),
        # unmapped id labels itself; tie -> 'hamartin' < 'tsc1'
        ("t9", "hamartin", 1, 2, 2),
    }


def test_oracle_twin(spark, frames):
    m, c = frames
    got = sorted(tuple(r) for r in entity_labels(m, c).collect())
    mv = ", ".join(
        f"('{i}', '{s}')" for i, s in MENTIONS if i != ""
    )
    cv = ", ".join(f"('{n}', '{x}')" for n, x in COMPONENTS)
    sql = entity_labels_oracle_sql(
        f"SELECT * FROM (VALUES {mv}) m(node, surface)",
        f"SELECT * FROM (VALUES {cv}) c(node, component)",
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
