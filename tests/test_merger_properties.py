"""Property-based check of the conflict-resolution semantics (J3).

Two INDEPENDENT formulations of reference entity_merger2.py:99-146:
  1. `merger._resolve_rows` — the faithful port: scan i last-to-first,
     inner j-scan with delete-and-break;
  2. a declarative alive-set model (the derivation behind the SQL
     oracle): processing i descending, row i dies iff SOME currently
     alive j beats it (same-span priority, strict containment, or
     longer strict overlap) — no mutation, no break.

Hypothesis drives random span/class/mention sets through both; any
divergence would falsify the oracle's reduction of the sequential
loop. Pure Python — no Spark session, so hundreds of examples are
cheap.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from easyner_spark.operators.merger import DEFAULT_PRIORITY, _resolve_rows

CLASSES = list(DEFAULT_PRIORITY) + ["unknown_class"]


def declarative_resolve(rows: list[dict], prio: dict[str, int]) -> list[dict]:
    """Alive-set model: i descending; delete i iff an alive j beats it.
    Alive = indices < i (not yet visited) plus survivors > i."""
    worst = max(prio.values(), default=0) + 1
    n = len(rows)
    alive = set(range(n))

    def beats(j: int, i: int) -> bool:
        ri, rj = rows[i], rows[j]
        same = ri["begin"] == rj["begin"] and ri["end"] == rj["end"]
        if same and ri["class"] != rj["class"]:
            return prio.get(ri["class"], worst) > prio.get(rj["class"], worst)
        if not same and ri["begin"] >= rj["begin"] and ri["end"] <= rj["end"]:
            return True
        if (ri["begin"] < rj["begin"] < ri["end"] < rj["end"]) or (
            rj["begin"] < ri["begin"] < rj["end"] < ri["end"]
        ):
            return len(ri["mention"]) < len(rj["mention"])
        return False

    for i in range(n - 1, -1, -1):
        if any(j != i and j in alive and beats(j, i) for j in range(n)):
            alive.discard(i)
    return [rows[i] for i in sorted(alive)]


spans = st.tuples(
    st.integers(min_value=0, max_value=12),
    st.integers(min_value=1, max_value=8),
    st.sampled_from(CLASSES),
)


@given(st.lists(spans, min_size=0, max_size=9))
@settings(max_examples=400, deadline=None)
def test_loop_equals_alive_set_model(items):
    rows = []
    for begin, width, cls in items:
        end = begin + width
        # mention length tracks span width (token-aligned surfaces do)
        rows.append(
            {"begin": begin, "end": end, "class": cls, "mention": "x" * (end - begin)}
        )
    # the engine sorts (begin, end, class, mention) before resolving
    rows.sort(key=lambda r: (r["begin"], r["end"], r["class"], r["mention"]))
    got = _resolve_rows([dict(r) for r in rows], DEFAULT_PRIORITY)
    want = declarative_resolve([dict(r) for r in rows], DEFAULT_PRIORITY)
    assert got == want


@given(
    st.lists(spans, min_size=0, max_size=9),
    st.lists(st.integers(min_value=1, max_value=5), min_size=5, max_size=5),
)
@settings(max_examples=150, deadline=None)
def test_property_holds_for_any_priority_map(items, prios):
    prio = dict(zip(list(DEFAULT_PRIORITY), prios))
    rows = []
    for begin, width, cls in items:
        end = begin + width
        rows.append(
            {"begin": begin, "end": end, "class": cls, "mention": "m" * (end - begin)}
        )
    rows.sort(key=lambda r: (r["begin"], r["end"], r["class"], r["mention"]))
    got = _resolve_rows([dict(r) for r in rows], prio)
    want = declarative_resolve([dict(r) for r in rows], prio)
    assert got == want


def test_resolve_oracle_mask_guard_fires():
    """The DuckDB oracle refuses (visibly) a sentence with >= 64
    mentions instead of silently overflowing the survivor bitmask."""
    import duckdb
    import pytest

    import __spark_entry__ as e

    con = duckdb.connect()
    text = " ".join(["spark"] * 70)  # 70 unigram mentions, one sentence
    con.execute(
        f"CREATE VIEW documents AS SELECT 1::BIGINT AS doc_id, '{text}' AS text"
    )
    with pytest.raises(duckdb.Error, match="64 mentions"):
        con.execute(e.oracle_sql()["resolve_conflicts"]).fetchall()
    con.execute("DROP VIEW documents")
    # and a normal-sized sentence still resolves
    con.execute(
        "CREATE VIEW documents AS SELECT 1::BIGINT AS doc_id, 'spark beats hash' AS text"
    )
    rows = con.execute(e.oracle_sql()["resolve_conflicts"]).fetchall()
    assert len(rows) == 2
