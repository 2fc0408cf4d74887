"""resolve_redirects: pointer-doubling semantics pinned on a closed
hand graph — chains (incl. one exactly max_steps long and one longer),
terminals, a 2-cycle, a self-loop, and a chain that ENTERS a cycle."""

import pytest

from easyner_spark.operators.webtext import resolve_redirects


def _rows(df):
    return {r["url"]: (r["final_url"], r["hops"], r["status"]) for r in df.collect()}


def test_chains_cycles_and_caps(spark):
    edges = [
        # 4-hop chain c4 -> c3 -> c2 -> c1 -> t (t has no outgoing row)
        ("c4", "c3"),
        ("c3", "c2"),
        ("c2", "c1"),
        ("c1", "t"),
        # 2-cycle
        ("x", "y"),
        ("y", "x"),
        # self-loop
        ("s", "s"),
        # chain entering the cycle: e -> x -> y -> x ...
        ("e", "x"),
        # chain exactly max_steps long (4 with max_steps=4):
        # m4 -> m3 -> m2 -> m1 -> mt
        ("m4", "m3"),
        ("m3", "m2"),
        ("m2", "m1"),
        ("m1", "mt"),
        # chain longer than max_steps=4: l5 -> l4 -> ... -> l0(term)
        ("l5", "l4"),
        ("l4", "l3"),
        ("l3", "l2"),
        ("l2", "l1"),
        ("l1", "l0"),
    ]
    r = spark.createDataFrame(edges, "url string, target string")
    got = _rows(resolve_redirects(r, max_steps=4))

    # exact hop counts down the chain
    assert got["c1"] == ("t", 1, "resolved")
    assert got["c2"] == ("t", 2, "resolved")
    assert got["c3"] == ("t", 3, "resolved")
    assert got["c4"] == ("t", 4, "resolved")
    # chain exactly max_steps long still resolves
    assert got["m4"] == ("mt", 4, "resolved")
    # one longer than the cap: after exactly 4 steps we sit at l1
    assert got["l5"] == ("l1", 4, "unresolved")
    # cycles exhaust the cap; position after exactly 4 steps is exact
    assert got["x"] == ("x", 4, "unresolved")
    assert got["y"] == ("y", 4, "unresolved")
    assert got["s"] == ("s", 4, "unresolved")
    # entering the cycle: e -> x -> y -> x -> y
    assert got["e"] == ("y", 4, "unresolved")
    # only redirecting urls appear (terminals have no row)
    assert "t" not in got and "mt" not in got and "l0" not in got
    assert len(got) == len(edges)


def test_max_steps_must_be_power_of_two(spark):
    r = spark.createDataFrame([("a", "b")], "url string, target string")
    with pytest.raises(ValueError):
        resolve_redirects(r, max_steps=6)
    with pytest.raises(ValueError):
        resolve_redirects(r, max_steps=0)


def test_single_step_cap(spark):
    """max_steps=1 is zero doubling rounds: J_0 alone."""
    r = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "t")], "url string, target string"
    )
    got = _rows(resolve_redirects(r, max_steps=1))
    assert got["c"] == ("t", 1, "resolved")
    assert got["a"] == ("b", 1, "unresolved")
    assert got["b"] == ("c", 1, "unresolved")
