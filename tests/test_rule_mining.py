"""AMIE-style horn-rule mining + application (triples.mine_rules /
rule_predictions) — semantics on a hand-built family KG with known
expected rules, DuckDB oracle parity, and the chain-degree cap."""

import duckdb

from easyner_spark.operators.triples import (
    mine_rules,
    mine_rules_oracle_sql,
    rule_predictions,
    rule_predictions_oracle_sql,
)

# Family KG: parent/child are mutual inverses, spouse is symmetric,
# grandparent == parent o parent, and (grandparent o child) == parent.
KG = [
    ("a", "parent", "b"),
    ("b", "parent", "c"),
    ("a", "parent", "d"),
    ("d", "parent", "e"),
    ("a", "grandparent", "c"),
    ("a", "grandparent", "e"),
    ("b", "child", "a"),
    ("c", "child", "b"),
    ("d", "child", "a"),
    ("e", "child", "d"),
    ("m", "spouse", "n"),
    ("n", "spouse", "m"),
]

MICRO = 1_000_000


def _kg_df(spark):
    return spark.createDataFrame(KG, "subj string, pred string, obj string")


def _values_sql():
    vals = ", ".join(f"('{s}', '{p}', '{o}')" for s, p, o in KG)
    return f"SELECT * FROM (VALUES {vals}) kg(subj, pred, obj)"


def test_expected_rules(spark):
    rows = mine_rules(_kg_df(spark), min_support=2).collect()
    rules = {
        (r.rule_type, r.body_p, r.body_q, r.head_r): r for r in rows
    }
    assert set(rules) == {
        ("inv", "parent", "", "child"),
        ("inv", "child", "", "parent"),
        ("inv", "spouse", "", "spouse"),
        ("chain", "parent", "parent", "grandparent"),
        ("chain", "grandparent", "child", "parent"),
        # child(x,y) AND grandparent(y,z) => parent(x,z): fires for
        # (b,c) and (d,e) out of 4 bodies -> confidence 0.5
        ("chain", "child", "grandparent", "parent"),
    }
    half = rules[("chain", "child", "grandparent", "parent")]
    assert (half.support, half.body_size) == (2, 4)
    assert half.conf_micro == 500_000
    gp = rules[("chain", "parent", "parent", "grandparent")]
    assert (gp.support, gp.body_size, gp.head_size) == (2, 2, 2)
    assert gp.conf_micro == MICRO
    assert gp.pca_conf_micro == MICRO
    assert gp.hc_micro == MICRO
    sym = rules[("inv", "spouse", "", "spouse")]
    assert (sym.support, sym.body_size) == (2, 2)


def test_partial_confidence(spark):
    # Break one inverse: drop child(e, d) -> inv parent=>child support 3
    # of body 4 (750000 ppm); PCA denominator drops to 3 because
    # subject e now has NO child edge -> PCA confidence stays 1e6.
    kg = [t for t in KG if t != ("e", "child", "d")]
    df = spark.createDataFrame(kg, "subj string, pred string, obj string")
    rows = {
        (r.rule_type, r.body_p, r.head_r): r
        for r in mine_rules(df, min_support=2).collect()
    }
    r = rows[("inv", "parent", "child")]
    assert (r.support, r.body_size, r.pca_size) == (3, 4, 3)
    assert r.conf_micro == 750_000
    assert r.pca_conf_micro == MICRO


def test_oracle_twin(spark):
    got = sorted(tuple(r) for r in mine_rules(_kg_df(spark), min_support=2).collect())
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            mine_rules_oracle_sql(_values_sql(), min_support=2)
        ).fetchall()
    )
    assert got == want


def test_predictions(spark):
    # Add a parent edge whose inverse child edge is missing: the
    # inv parent=>child rule (PCA 1e6) must predict it.
    kg = KG + [("f", "parent", "g")]
    df = spark.createDataFrame(kg, "subj string, pred string, obj string")
    preds = {
        (r.subj, r.pred, r.obj): (r.score_micro, r.n_rules)
        for r in rule_predictions(df, min_support=2, min_pca_micro=900_000).collect()
    }
    assert ("g", "child", "f") in preds
    score, n = preds[("g", "child", "f")]
    assert score == MICRO and n >= 1
    # no prediction may duplicate a known fact
    assert not (set(preds) & set((s, p, o) for s, p, o in kg))


def test_predictions_oracle_twin(spark):
    got = sorted(
        tuple(r)
        for r in rule_predictions(
            _kg_df(spark), min_support=2, min_pca_micro=500_000
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            rule_predictions_oracle_sql(
                _values_sql(), min_support=2, min_pca_micro=500_000
            )
        ).fetchall()
    )
    assert got == want


def test_chain_degree_cap(spark):
    # Hub pivot: 'h' has parent in-degree 3 > cap 2, so every chain
    # body through h is dropped on both sides — Spark and oracle agree.
    kg = KG + [
        ("p1", "parent", "h"),
        ("p2", "parent", "h"),
        ("p3", "parent", "h"),
        ("h", "parent", "k1"),
        ("p1", "grandparent", "k1"),
        ("p2", "grandparent", "k1"),
        ("p3", "grandparent", "k1"),
    ]
    df = spark.createDataFrame(kg, "subj string, pred string, obj string")
    vals = ", ".join(f"('{s}', '{p}', '{o}')" for s, p, o in kg)
    vsql = f"SELECT * FROM (VALUES {vals}) kg(subj, pred, obj)"
    for cap in (None, 2):
        got = sorted(
            tuple(r)
            for r in mine_rules(df, min_support=2, max_chain_degree=cap).collect()
        )
        want = sorted(
            tuple(r)
            for r in duckdb.sql(
                mine_rules_oracle_sql(vsql, min_support=2, max_chain_degree=cap)
            ).fetchall()
        )
        assert got == want
    capped = {
        (r.rule_type, r.body_p, r.body_q, r.head_r): r.support
        for r in mine_rules(df, min_support=2, max_chain_degree=2).collect()
    }
    uncapped = {
        (r.rule_type, r.body_p, r.body_q, r.head_r): r.support
        for r in mine_rules(df, min_support=2).collect()
    }
    key = ("chain", "parent", "parent", "grandparent")
    assert uncapped[key] == 5  # (a,c) (a,e) + the 3 hub groundings
    assert capped[key] == 2  # hub pivot h dropped
