"""Property-based checks for the curation operators (round 3).

Two tiers: pure-Python properties of the sampling threshold (hundreds
of examples, no Spark) and randomized Spark-vs-plain-Python
cross-validation for paragraph_dedup / token_budget_select (few
examples — each costs a Spark job — but each example is an arbitrary
adversarial corpus, which fixed fixtures can't be)."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from easyner_spark.operators.sampling import (
    SAMPLE_NIBBLES,
    sample_threshold,
)

# --- pure-Python tier -------------------------------------------------

rates = st.floats(min_value=0.0, max_value=1.0, allow_nan=False)


@given(rates, rates)
@settings(max_examples=300)
def test_threshold_monotone(r1, r2):
    """A lower keep-rate can never admit a key a higher rate rejects:
    thresholds are monotone in the rate, so rate-r1 samples are always
    subsets of rate-r2 samples for r1 <= r2 (the property the subset
    pytest pins on one corpus, here for arbitrary rates)."""
    lo, hi = sorted((r1, r2))
    assert sample_threshold(lo) <= sample_threshold(hi)


@given(st.text(max_size=30), rates)
@settings(max_examples=300)
def test_threshold_gate_is_prefix_decided(key, rate):
    """Comparing the FULL 32-char digest against the 12-char threshold
    decides identically to comparing the 12-char prefix (h[:12] == t
    implies h > t since t is then a proper prefix; any difference
    resolves before position 12 otherwise) — the property that lets
    the Spark side hash only 12 chars while a naive full-digest
    comparison would agree."""
    h = hashlib.md5(key.encode()).hexdigest()
    t = sample_threshold(rate)
    assert (h < t) == (h[:SAMPLE_NIBBLES] < t)
    # threshold is always 12 hex chars or the max sentinel 'g'
    assert t == "g" or (
        len(t) == SAMPLE_NIBBLES and all(c in "0123456789abcdef" for c in t)
    )


# --- Spark tier -------------------------------------------------------

PARA_ALPHABET = ["a", "bb", "ccc", "", "dd d", "bb"]  # dupes on purpose

corpora = st.lists(
    st.lists(st.sampled_from(PARA_ALPHABET), min_size=1, max_size=5),
    min_size=1,
    max_size=6,
)


def py_paragraph_dedup(docs):
    seen = {}
    out = {}
    for did, paras in docs:
        kept = []
        for i, p in enumerate(paras):
            if p not in seen:
                seen[p] = (did, i)
            if seen[p] == (did, i):
                kept.append(p)
        out[did] = ("\n".join(kept), len(paras), len(kept))
    return out


@settings(max_examples=8, deadline=None)
@given(corpora)
def test_paragraph_dedup_random_corpora(spark, corpus):
    from easyner_spark.operators.dedup import paragraph_dedup

    docs = [(i, "\n".join(paras)) for i, paras in enumerate(corpus)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_dedup"], r["n_paras"], r["n_kept"])
        for r in paragraph_dedup(df).collect()
    }
    assert got == py_paragraph_dedup([(i, paras) for i, paras in enumerate(corpus)])


budget_docs = st.lists(
    st.tuples(
        st.floats(min_value=0.0, max_value=8.0, allow_nan=False).map(
            lambda x: round(x * 4) / 4.0  # dyadic — exact in both paths
        ),
        st.integers(min_value=0, max_value=50),
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None)
@given(budget_docs, st.integers(min_value=0, max_value=300))
def test_token_budget_strategies_random(spark, rows, budget):
    from easyner_spark.operators.sampling import token_budget_select

    docs = [(i, q, t) for i, (q, t) in enumerate(rows)]
    df = spark.createDataFrame(docs, "doc_id long, quality double, n_tokens long")
    dist = {
        r["doc_id"]: r["cum_tokens"]
        for r in token_budget_select(df, budget, num_partitions=3).collect()
    }
    win = {
        r["doc_id"]: r["cum_tokens"]
        for r in token_budget_select(df, budget, strategy="window").collect()
    }
    acc, want = 0, {}
    for i, q, t in sorted(docs, key=lambda d: (-d[1], d[0])):
        acc += t
        if acc > budget:
            break
        want[i] = acc
    assert dist == win == want


# ---------------------------------------------------------------------------
# asof_join vs a brute-force per-row reference
# ---------------------------------------------------------------------------

asof_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),     # user (few keys -> ties)
        st.integers(min_value=0, max_value=20),    # ts minute (dense -> ties)
        st.booleans(),                             # is_view
    ),
    min_size=1,
    max_size=24,
)


def py_asof(views, clicks):
    """Contract reference: per view, the click with the same key, max
    (ts, event_id) among clicks with ts <= view ts."""
    out = {}
    for vid, vu, vt in views:
        cands = [(ct, cid) for cid, cu, ct in clicks if cu == vu and ct <= vt]
        out[vid] = max(cands)[1] if cands else None
    return out


@settings(max_examples=8, deadline=None)
@given(asof_events)
def test_asof_join_random_events(spark, events):
    from datetime import datetime, timedelta

    from easyner_spark.operators.events import asof_join

    t0 = datetime(2024, 1, 1)
    views, clicks = [], []
    for i, (user, minute, is_view) in enumerate(events):
        (views if is_view else clicks).append((i, user, minute))
    if not views:
        views = [(len(events), 1, 0)]
    schema = "event_id long, user_id long, ts timestamp_ntz"
    v = spark.createDataFrame(
        [(i, u, t0 + timedelta(minutes=m)) for i, u, m in views], schema
    )
    c_rows = [(i, u, t0 + timedelta(minutes=m)) for i, u, m in clicks]
    c = spark.createDataFrame(c_rows, schema) if c_rows else \
        spark.createDataFrame([], schema)
    got = {r["event_id"]: r["event_id_right"]
           for r in asof_join(v, c).collect()}
    assert got == py_asof(views, clicks)
