"""Property tests for the session's graph/eval operators: random
inputs vs independent pure-Python models (the test_property_round3_ops
pattern — few examples, each a full Spark plan, deadline off)."""

from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

NODES = [f"n{i}" for i in range(6)]

edges_strat = st.lists(
    st.tuples(st.sampled_from(NODES), st.sampled_from(NODES)),
    min_size=1,
    max_size=15,
)

assign_strat = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=11),  # record
        st.integers(min_value=0, max_value=3),   # pred cluster
        st.integers(min_value=0, max_value=3),   # gold cluster
    ),
    min_size=1,
    max_size=20,
)


def _py_shortest(pairs, landmarks, k):
    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
    out = {}
    # reverse BFS from each landmark
    radj = defaultdict(set)
    for a, bs in adj.items():
        for b in bs:
            radj[b].add(a)
    for m in landmarks:
        dist = {m: 0}
        frontier = [m]
        for d in range(1, k + 1):
            nxt = []
            for n in frontier:
                for p in radj[n]:
                    if p not in dist:
                        dist[p] = d
                        nxt.append(p)
            frontier = nxt
        for n, d in dist.items():
            out[(n, m)] = d
    return out


@settings(max_examples=10, deadline=None)
@given(pairs=edges_strat, k=st.integers(min_value=1, max_value=3))
def test_shortest_paths_matches_python_bfs(spark, pairs, k):
    from easyner_spark.operators.graph import shortest_paths

    e = spark.createDataFrame(pairs, ["src", "dst"])
    landmarks = ("n0", "n3")
    got = {
        (r.node, r.landmark): r.dist
        for r in shortest_paths(e, landmarks, k=k).collect()
    }
    assert got == _py_shortest(pairs, landmarks, k)


def _py_bcubed(rows):
    # model: per-record ratios with micro floors, floor-before-average
    rows = [(f"r{r}", f"p{p}", f"g{g}") for r, p, g in rows]
    n_pg = defaultdict(int)
    n_p = defaultdict(int)
    n_g = defaultdict(int)
    for _, p, g in rows:
        n_pg[(p, g)] += 1
        n_p[p] += 1
        n_g[g] += 1
    n = len(rows)
    ps = sum(
        (1_000_000 * n_pg[(p, g)]) // n_p[p] for _, p, g in rows
    )
    rs = sum(
        (1_000_000 * n_pg[(p, g)]) // n_g[g] for _, p, g in rows
    )
    P, R = ps // n, rs // n
    f1 = (2 * P * R) // (P + R) if P + R > 0 else 0
    return n, P, R, f1


@settings(max_examples=10, deadline=None)
@given(rows=assign_strat)
def test_bcubed_matches_python_model(spark, rows):
    from easyner_spark.operators.dedup import bcubed_quality

    # records must be unique per assignment row for the group-size
    # identity |pred∩gold| = n_pg to hold; dedupe by record id
    seen = {}
    for r, p, g in rows:
        seen[r] = (r, p, g)
    rows = sorted(seen.values())
    df = spark.createDataFrame(
        [(f"r{r}", f"p{p}", f"g{g}") for r, p, g in rows],
        ["record", "pred_cluster", "gold_cluster"],
    )
    row = bcubed_quality(df).collect()[0]
    n, P, R, f1 = _py_bcubed(rows)
    assert (
        row.n_records,
        row.bcubed_precision_micro,
        row.bcubed_recall_micro,
        row.bcubed_f1_micro,
    ) == (n, P, R, f1)


def _py_kcenter(vecs, k, unit=1000):
    import math

    q = {
        i: [math.floor(v * unit) for v in vec] for i, vec in vecs
    }
    ids = sorted(q)
    sel = [min(ids)]
    out = [(0, sel[0], 0)]
    for rank in range(1, k):
        best = None
        for i in ids:
            d = min(
                sum((a - b) * (a - b) for a, b in zip(q[i], q[s]))
                for s in sel
            )
            if best is None or d > best[0] or (d == best[0] and i < best[1]):
                best = (d, i)
        if best[0] == 0:
            break
        out.append((rank, best[1], best[0]))
        sel.append(best[1])
    return out


@settings(max_examples=8, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.lists(
                st.floats(
                    min_value=-2.0, max_value=2.0,
                    allow_nan=False, allow_infinity=False,
                ),
                min_size=3,
                max_size=3,
            ),
        ),
        min_size=2,
        max_size=12,
    )
)
def test_kcenter_matches_python_greedy(spark, data):
    from easyner_spark.operators.similarity import kcenter_select

    seen = {}
    for i, v in data:
        seen[i] = (i, v)
    vecs = sorted(seen.values())
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    got = [(r, i, d) for r, i, d in kcenter_select(df, k=4)]
    assert got == _py_kcenter(vecs, k=4)


def _py_paths(pairs, sources, targets, max_len):
    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
    out = set()

    def walk(node, path):
        if len(path) - 1 >= max_len:
            return
        for nxt in adj[node]:
            if nxt in path:
                continue
            p2 = path + [nxt]
            if nxt in targets:
                out.add((p2[0], nxt, ">".join(p2), len(p2) - 1))
            walk(nxt, p2)

    for s in sources:
        walk(s, [s])
    return out


@settings(max_examples=10, deadline=None)
@given(pairs=edges_strat, ml=st.integers(min_value=1, max_value=3))
def test_kg_paths_matches_python_dfs(spark, pairs, ml):
    from easyner_spark.operators.graph import kg_paths

    e = spark.createDataFrame(pairs, ["src", "dst"])
    sources, targets = ("n0", "n1"), ("n4", "n5")
    got = {
        (r.src, r.dst, r.path, r.hops)
        for r in kg_paths(
            e, sources=sources, targets=targets, max_len=ml
        ).collect()
    }
    assert got == _py_paths(pairs, sources, set(targets), ml)
