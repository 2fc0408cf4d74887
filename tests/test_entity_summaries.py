"""Entity cards: informativeness-ranked top-k facts per entity
(triples.entity_summaries)."""

import duckdb

from easyner_spark.operators.triples import (
    entity_summaries,
    entity_summaries_oracle_sql,
)

KG = [
    # located_in is ubiquitous (4 edges), ceo_of is rare (1)
    ("acme", "located_in", "berlin"),
    ("bcorp", "located_in", "paris"),
    ("ccorp", "located_in", "paris"),
    ("dcorp", "located_in", "rome"),
    ("acme", "employs", "alice"),
    ("acme", "employs", "bob"),
    ("alice", "ceo_of", "acme"),
    ("acme", "employs", "alice"),   # duplicate fact: deduped
]


def _frame(spark):
    return spark.createDataFrame(KG, "subj string, pred string, obj string")


def test_rarity_ranking_and_k(spark):
    rows = sorted(
        (r.entity_id, r.rank, r.pred, r.obj)
        for r in entity_summaries(_frame(spark), k=2).collect()
    )
    by_entity = {}
    for eid, rank, pred, obj in rows:
        by_entity.setdefault(eid, []).append((rank, pred, obj))
    # acme: employs (2 edges) beats located_in (4); ties on obj asc
    assert by_entity["acme"] == [
        (1, "employs", "alice"),
        (2, "employs", "bob"),
    ]
    # alice's single rare fact ranks first and is her only card row
    assert by_entity["alice"] == [(1, "ceo_of", "acme")]
    assert all(len(v) <= 2 for v in by_entity.values())


def test_oracle_twin(spark):
    vals = ", ".join(f"('{s}', '{p}', '{o}')" for s, p, o in KG)
    sql = entity_summaries_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(subj, pred, obj)", k=3
    )
    got = sorted(
        tuple(r) for r in entity_summaries(_frame(spark), k=3).collect()
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
