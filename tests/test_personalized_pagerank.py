"""personalized_pagerank: seed-restricted teleport semantics on a
closed graph, cross-checked against a pure-Python replica."""

import pytest

from easyner_spark.operators.graph import personalized_pagerank

EDGES = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]


def _replica(edges, seeds, iters, d=0.85):
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {t for _, t in e})
    s = sorted(set(seeds) & set(nodes))
    deg = {}
    for a, _ in e:
        deg[a] = deg.get(a, 0) + 1
    tele = {n: (1.0 / len(s) if n in s else 0.0) for n in nodes}
    r = {n: round(tele[n], 9) for n in nodes}
    for _ in range(iters):
        inflow = {}
        for a, b in e:
            inflow[b] = inflow.get(b, 0.0) + r[a] / float(deg[a])
        r = {
            n: round((1.0 - d) * tele[n] + d * inflow.get(n, 0.0), 9)
            for n in nodes
        }
    return {n: round(v, 6) for n, v in r.items()}


def test_matches_replica_and_seed_mass(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("zzz-not-in-graph",)], "node string")
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(e, seeds, iters=3).collect()
    }
    assert got == _replica(EDGES, ["a"], 3)
    # teleport is seed-restricted: d (points at the graph but nothing
    # points at it, and it is not a seed) holds NO rank
    assert got["d"] == 0.0
    assert got["a"] > got["b"] > 0


def test_all_seeds_outside_graph_raises(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    seeds = spark.createDataFrame([("nope",)], "node string")
    with pytest.raises(ValueError):
        personalized_pagerank(e, seeds)
