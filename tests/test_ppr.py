"""Personalized PageRank (random walk with restart, all-BIGINT
micro-unit iteration — the textrank integer recipe on the graph
family).

Reference parity: EasyNER has no graph analytics (scripts/analysis.py
stops at entity frequency); seed-relative relatedness is north_star KG
surface beyond global pagerank.
"""

import pytest

from easyner_spark.operators.graph import ppr

UNIT = 10**9


def _py_ppr(edges, seeds, iters=3):
    nodes = {s for s, _ in edges} | {d for _, d in edges} | set(seeds)
    share = UNIT // len(seeds)
    restart = {n: (share if n in seeds else 0) for n in nodes}
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    sc = dict(restart)
    for _ in range(iters):
        inc = {n: 0 for n in nodes}
        for s, d in edges:
            inc[d] += sc[s] // deg[s]
        sc = {
            n: (3 * restart[n]) // 20 + (17 * inc[n]) // 20 for n in nodes
        }
    return sc


@pytest.fixture(scope="module")
def graph(spark):
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),     # cycle near the seed
        ("a", "d"), ("d", "e"),                 # chain off the seed
        ("x", "y"), ("y", "x"),                 # disconnected pair
    ]
    return edges, spark.createDataFrame(edges, "src string, dst string")


def test_matches_independent_python_model(spark, graph):
    edges, df = graph
    want = _py_ppr(edges, ("a",))
    got = {r.node: r.score for r in ppr(df, seeds=("a",)).collect()}
    assert got == {n: s / float(UNIT) for n, s in want.items()}


def test_mass_localizes_near_seed(spark, graph):
    _, df = graph
    out = {r.node: (r.score, r.is_seed) for r in ppr(df, seeds=("a",)).collect()}
    assert out["a"][1] is True
    # disconnected component gets zero mass; seed-side nodes get some
    assert out["x"][0] == 0.0 and out["y"][0] == 0.0
    assert out["b"][0] > 0.0 and out["d"][0] > 0.0
    # the seed keeps the largest score under restart
    assert out["a"][0] == max(s for s, _ in out.values())


def test_isolated_seed_still_appears(spark, graph):
    _, df = graph
    out = {r.node: (r.score, r.is_seed) for r in ppr(df, seeds=("zzz",)).collect()}
    # seed absent from the edge list is unioned in; keeps restart mass
    assert out["zzz"] == ((3 * UNIT // 20) / float(UNIT), True)


def test_two_seeds_split_restart(spark, graph):
    _, df = graph
    out = {r.node: r.is_seed for r in ppr(df, seeds=("a", "x")).collect()}
    assert out["a"] and out["x"] and not out["b"]


def test_validation(spark, graph):
    _, df = graph
    with pytest.raises(ValueError):
        ppr(df, seeds=())
    with pytest.raises(ValueError):
        ppr(df, seeds=("a",), iters=0)
