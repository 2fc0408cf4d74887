"""Predicate synonym / inverse / symmetry detection
(triples.predicate_equivalences)."""

import duckdb

from easyner_spark.operators.triples import (
    predicate_equivalences,
    predicate_equivalences_oracle_sql,
)

KG = [
    # buys: 3 pairs; acquires: subset of 2 (synonym candidate)
    ("a", "buys", "x"),
    ("b", "buys", "y"),
    ("c", "buys", "z"),
    ("a", "acquires", "x"),
    ("b", "acquires", "y"),
    ("a", "acquires", "x"),      # duplicate edge — pair-set dedup
    # owned_by: one reversed buys pair (inverse candidate)
    ("x", "owned_by", "a"),
    # near: symmetric on (p, q) only
    ("p", "near", "q"),
    ("q", "near", "p"),
    ("p", "near", "r"),
]


def _frame(spark):
    return spark.createDataFrame(KG, "subj string, pred string, obj string")


def test_equiv_inverse_symmetry(spark):
    rows = {
        (r.pred_a, r.pred_b, r.kind): r
        for r in predicate_equivalences(_frame(spark)).collect()
    }
    assert len(rows) == 4
    eq = rows[("acquires", "buys", "equiv")]
    assert (eq.n_a, eq.n_b, eq.n_both) == (2, 3, 2)
    assert (eq.jaccard_micro, eq.a_in_b_micro, eq.b_in_a_micro) == (
        666_666, 1_000_000, 666_666,
    )
    inv = rows[("buys", "owned_by", "inverse")]
    assert (inv.n_a, inv.n_b, inv.n_both, inv.b_in_a_micro) == (
        3, 1, 1, 1_000_000,
    )
    # acquires(a,x) reversed by owned_by(x,a) too
    assert rows[("acquires", "owned_by", "inverse")].n_both == 1
    # symmetric predicate: directed pairs whose reverse also exists
    sym = rows[("near", "near", "inverse")]
    assert (sym.n_a, sym.n_both, sym.jaccard_micro) == (3, 2, 500_000)


def test_min_overlap_gate(spark):
    got = predicate_equivalences(_frame(spark), min_overlap=2).collect()
    kinds = {(r.pred_a, r.pred_b, r.kind) for r in got}
    assert kinds == {
        ("acquires", "buys", "equiv"),
        ("near", "near", "inverse"),
    }


def test_oracle_twin(spark):
    got = sorted(
        tuple(r) for r in predicate_equivalences(_frame(spark)).collect()
    )
    vals = ", ".join(f"('{s}', '{p}', '{o}')" for s, p, o in KG)
    sql = predicate_equivalences_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS v(subj, pred, obj)"
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
