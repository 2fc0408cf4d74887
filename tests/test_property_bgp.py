"""Property test for the full BGP query surface: random small edge
tables x random pattern shapes (literals, shared vars, OPTIONAL
groups, '+' property paths) — Spark's planned execution must equal
the DuckDB naive/recursive twin row-for-row under bag semantics
(the test_property_round3_ops pattern: few examples, each a full
Spark plan, deadline off)."""

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from easyner_spark.operators.triples import (
    match_patterns,
    match_patterns_oracle_sql,
)

NODES = [f"n{i}" for i in range(5)]
PREDS = ["p", "q", "r"]

edges_strat = st.lists(
    st.tuples(
        st.sampled_from(NODES),
        st.sampled_from(PREDS),
        st.sampled_from(NODES),
    ),
    min_size=1,
    max_size=18,
)

# pattern shapes: connected chains over ?x ?y ?z with a literal
# anchor choice and optional '+' on the middle predicate
shape_strat = st.tuples(
    st.sampled_from(PREDS),           # pred 1
    st.sampled_from(PREDS),           # pred 2
    st.booleans(),                    # '+' on pred 2
    st.sampled_from([None, *NODES]),  # literal anchor for ?x (or var)
    st.booleans(),                    # add an OPTIONAL group
    st.sampled_from(PREDS),           # optional group pred
    st.booleans(),                    # add a MINUS group
    st.sampled_from(PREDS),           # minus group pred
)


def _sorted(tuples):
    # None-safe total order (OPTIONAL rows carry NULLs)
    return sorted(
        tuples, key=lambda t: tuple((v is None, v or "") for v in t)
    )


def _run_both(spark, rows, shape):
    p1, p2, plus, anchor, with_opt, opred, with_minus, mpred = shape
    p2_term = p2 + "+" if plus else p2
    x_term = anchor if anchor is not None else "?x"
    pats = [(x_term, p1, "?y"), ("?y", p2_term, "?z")]
    opts = [[("?z", opred, "?w")]] if with_opt else None
    mins = [[("?y", mpred, "?m")]] if with_minus else None

    edges = spark.createDataFrame(
        rows, "subj_id string, pred string, obj_id string"
    )
    got = _sorted(
        tuple(r)
        for r in match_patterns(
            edges, pats, optionals=opts, minus=mins, max_closure_depth=4
        ).collect()
    )
    vals = ", ".join(f"('{s}', '{p}', '{o}')" for s, p, o in rows)
    sql = match_patterns_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) v(subj_id, pred, obj_id)",
        pats,
        optionals=opts,
        minus=mins,
        max_closure_depth=4,
    )
    want = _sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    return got, want


@settings(max_examples=12, deadline=None)
@given(rows=edges_strat, shape=shape_strat)
def test_bgp_matches_duckdb_oracle(spark, rows, shape):
    got, want = _run_both(spark, rows, shape)
    assert got == want


# --- r5 surface: FILTER + aggregation + top-k -------------------------

filter_strat = st.lists(
    st.tuples(
        st.sampled_from(["x", "y"]),
        st.sampled_from(
            ["=", "!=", "<", "<=", ">", ">=", "prefix", "contains", "regex"]
        ),
        st.sampled_from(["n", "n1", "n2", "1", "[13]$"]),
    ),
    max_size=3,
)

agg_strat = st.tuples(
    st.booleans(),                               # group by y (else global)
    st.sampled_from(
        [
            {"n": ("count", "*")},
            {"n": ("count", "*"), "xs": ("count_distinct", "x")},
            {"lo": ("min", "x"), "hi": ("max", "x")},
        ]
    ),
    st.sampled_from([None, 1, 3]),               # top-k limit (None = no)
)


@settings(max_examples=12, deadline=None)
@given(rows=edges_strat, filts=filter_strat, agg=agg_strat)
def test_bgp_filter_agg_topk_matches_duckdb_oracle(spark, rows, filts, agg):
    """The r5 additions under random inputs: FILTER predicates, GROUP
    BY aggregates, and the deterministic ORDER/LIMIT top-k must match
    the DuckDB twin row-for-row (same construction on both sides)."""
    with_gb, aggs, k = agg
    pats = [("?x", "p", "?y")]
    filters: dict = {}
    for var, op, val in filts:
        filters.setdefault(var, []).append((op, val))
    kw = dict(
        filters=filters or None,
        group_by=["y"] if with_gb else [],
        aggregates=aggs,
    )
    if k is not None:
        first = next(iter(aggs))
        kw["order_by"] = [(first, "desc")]
        kw["limit"] = k
    edges = spark.createDataFrame(
        rows, "subj_id string, pred string, obj_id string"
    )
    got = _sorted(tuple(r) for r in match_patterns(edges, pats, **kw).collect())
    vals = ", ".join(f"('{s}', '{p}', '{o}')" for s, p, o in rows)
    sql = match_patterns_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) v(subj_id, pred, obj_id)",
        pats,
        **kw,
    )
    want = _sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
