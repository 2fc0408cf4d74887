"""Signature-vote type propagation to untyped entities
(triples.infer_entity_types)."""

import duckdb

from easyner_spark.operators.triples import (
    infer_entity_types,
    infer_entity_types_oracle_sql,
)

KG = [
    ("c1", "inhibits", "g1"),
    ("c2", "inhibits", "g2"),
    ("u1", "inhibits", "g1"),   # untyped subject: inherits chemical votes
    ("u1", "treats", "d1"),
    ("c1", "treats", "d2"),
    ("g1", "part_of", "u2"),    # u2's only role has no typed participants
    # likes: one chemical + one disease typed subject -> u4 vote tie
    ("c1", "likes", "g1"),
    ("d1", "likes", "g2"),
    ("u4", "likes", "g1"),
]
TYPES = [
    ("c1", "chemical"),
    ("c2", "chemical"),
    ("g1", "gene"),
    ("g2", "gene"),
    ("d1", "disease"),
    ("d2", "disease"),
]


def _frames(spark):
    e = spark.createDataFrame(KG, "subj string, pred string, obj string")
    t = spark.createDataFrame(TYPES, "entity_id string, ent_type string")
    return e, t


def test_vote_accumulation_and_ties(spark):
    e, t = _frames(spark)
    rows = {
        (r.entity_id, r.ent_type): r
        for r in infer_entity_types(e, t).collect()
    }
    # u1 subj-of-inhibits (2 chemical votes) + subj-of-treats (1) = 3/3
    u1 = rows[("u1", "chemical")]
    assert (u1.votes, u1.total, u1.share_micro, u1.is_best) == (
        3, 3, 1_000_000, True,
    )
    # u4: likes has 1 chemical + 1 disease typed subject -> exact tie,
    # broken on ent_type ascending
    assert rows[("u4", "chemical")].is_best
    assert not rows[("u4", "disease")].is_best
    assert rows[("u4", "chemical")].share_micro == 500_000
    # u2: object-of-part_of has zero typed participants -> no row, and
    # typed entities never appear
    ids = {eid for eid, _ in rows}
    assert ids == {"u1", "u4"}


def test_oracle_twin(spark):
    e, t = _frames(spark)
    got = sorted(tuple(r) for r in infer_entity_types(e, t).collect())
    kv = ", ".join(f"('{s}', '{p}', '{o}')" for s, p, o in KG)
    tv = ", ".join(f"('{n}', '{ty}')" for n, ty in TYPES)
    sql = infer_entity_types_oracle_sql(
        f"SELECT * FROM (VALUES {kv}) AS v(subj, pred, obj)",
        f"SELECT * FROM (VALUES {tv}) AS w(entity_id, ent_type)",
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
