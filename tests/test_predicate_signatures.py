"""Predicate argument-type signature induction
(triples.predicate_signatures)."""

import duckdb

from easyner_spark.operators.triples import (
    predicate_signatures,
    predicate_signatures_oracle_sql,
)

KG = [
    ("c1", "inhibits", "g1"),
    ("c1", "inhibits", "g2"),
    ("c2", "inhibits", "g1"),
    ("c2", "inhibits", "d1"),   # minority signature (chem -> disease)
    ("c1", "treats", "d1"),
    ("x9", "treats", "d1"),     # untyped subject -> unknown bucket
]
TYPES = [
    ("c1", "chemical"),
    ("c2", "chemical"),
    ("g1", "gene"),
    ("g2", "gene"),
    ("d1", "disease"),
]


def _frames(spark):
    e = spark.createDataFrame(KG, "subj string, pred string, obj string")
    t = spark.createDataFrame(TYPES, "entity_id string, ent_type string")
    return e, t


def test_signatures(spark):
    e, t = _frames(spark)
    rows = {
        (r.pred, r.subj_type, r.obj_type): r
        for r in predicate_signatures(e, t).collect()
    }
    dom = rows[("inhibits", "chemical", "gene")]
    assert (dom.n, dom.total, dom.share_micro, dom.is_dominant) == (
        3, 4, 750_000, True,
    )
    minority = rows[("inhibits", "chemical", "disease")]
    assert (minority.n, minority.share_micro, minority.is_dominant) == (
        1, 250_000, False,
    )
    unk = rows[("treats", "unknown", "disease")]
    assert unk.n == 1 and not unk.is_dominant
    # treats tie (1 vs 1) breaks on (subj_type, obj_type) ascending
    assert rows[("treats", "chemical", "disease")].is_dominant


def test_oracle_twin(spark):
    e, t = _frames(spark)
    got = sorted(tuple(r) for r in predicate_signatures(e, t).collect())
    kv = ", ".join(f"('{s}', '{p}', '{o}')" for s, p, o in KG)
    tv = ", ".join(f"('{n}', '{ty}')" for n, ty in TYPES)
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            predicate_signatures_oracle_sql(
                f"SELECT * FROM (VALUES {kv}) kg(subj, pred, obj)",
                f"SELECT * FROM (VALUES {tv}) ty(entity_id, ent_type)",
            )
        ).fetchall()
    )
    assert got == want
