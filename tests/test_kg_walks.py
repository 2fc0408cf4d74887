"""kg_random_walks: deterministic walk semantics pinned against a
pure-Python replica (md5 neighbor choice, dangling early stop)."""

import hashlib

from easyner_spark.operators.graph import kg_random_walks

EDGES = [
    ("a", "b"),
    ("a", "c"),
    ("b", "c"),
    ("c", "a"),
    ("c", "d"),
    # d is dangling: walks reaching d stop there
]


def _replica(edges, walk_len, walks_per_node):
    adj = {}
    for s, t in sorted(set(edges)):
        adj.setdefault(s, []).append(t)
    out = set()
    for start in sorted(adj):
        for w in range(walks_per_node):
            cur = start
            out.add((start, w, 0, cur))
            for t in range(1, walk_len + 1):
                if cur not in adj:
                    break
                h = hashlib.md5(f"{start}|{w}|{t}|{cur}".encode()).hexdigest()
                cur = adj[cur][int(h[:8], 16) % len(adj[cur])]
                out.add((start, w, t, cur))
    return out


def test_matches_pure_python_replica(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    got = {
        (r["start"], r["walk"], r["step"], r["node"])
        for r in kg_random_walks(e, walk_len=4, walks_per_node=3).collect()
    }
    want = _replica(EDGES, 4, 3)
    assert got == want
    # every start emits step 0; d never starts a walk (no outgoing)
    starts = {s for s, _, st, _ in got if st == 0}
    assert starts == {"a", "b", "c"}
    # contiguity: a (start, walk) present at step t has steps 0..t
    by_walk = {}
    for s, w, st, _ in got:
        by_walk.setdefault((s, w), set()).add(st)
    for steps in by_walk.values():
        assert steps == set(range(max(steps) + 1))


def test_skipgrams_from_walks(spark):
    from easyner_spark.operators.graph import walk_skipgrams

    # one hand walk: a b c d (steps 0..3), window 2
    walks = spark.createDataFrame(
        [("a", 0, 0, "a"), ("a", 0, 1, "b"), ("a", 0, 2, "c"), ("a", 0, 3, "d")],
        "start string, walk long, step long, node string",
    )
    got = {
        (r["center"], r["context"], r["offset"]): r["cnt"]
        for r in walk_skipgrams(walks, window=2).collect()
    }
    want = set()
    seq = ["a", "b", "c", "d"]
    for i in range(4):
        for j in range(4):
            if i != j and abs(i - j) <= 2:
                want.add((seq[i], seq[j], j - i))
    assert set(got) == want
    assert all(c == 1 for c in got.values())
    # two walks sharing a transition double-count it
    walks2 = walks.unionByName(
        spark.createDataFrame(
            [("a", 1, 0, "a"), ("a", 1, 1, "b")],
            "start string, walk long, step long, node string",
        )
    )
    got2 = {
        (r["center"], r["context"], r["offset"]): r["cnt"]
        for r in walk_skipgrams(walks2, window=2).collect()
    }
    assert got2[("a", "b", 1)] == 2
    assert got2[("b", "a", -1)] == 2
