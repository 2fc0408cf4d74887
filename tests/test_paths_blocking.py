"""Landmark BFS distances, bounded simple-path enumeration, and
ER-blocking quality metrics — hand-graph/hand-count expectations
checked exactly (everything is integer or string)."""

import pyspark.sql.functions as F

from easyner_spark.operators.dedup import blocking_quality
from easyner_spark.operators.graph import kg_paths, shortest_paths


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


#  a -> b -> c -> L      d -> L      L -> e  (e is DOWNSTREAM of L)
#        \-> L           isolated: z never appears
_GRAPH = [
    ("a", "b"),
    ("b", "c"),
    ("c", "L"),
    ("b", "L"),
    ("d", "L"),
    ("L", "e"),
]


def test_shortest_paths_basic(spark):
    out = {
        (r.node, r.landmark): r.dist
        for r in shortest_paths(_edges(spark, _GRAPH), ("L",), k=3).collect()
    }
    assert out[("L", "L")] == 0
    assert out[("c", "L")] == 1
    assert out[("b", "L")] == 1  # direct edge wins over b->c->L
    assert out[("d", "L")] == 1
    assert out[("a", "L")] == 2  # via b
    # e only has an edge FROM L; directed distance to L is undefined
    assert ("e", "L") not in out
    assert len(out) == 5


def test_shortest_paths_bound_and_multi_landmark(spark):
    # k=1 cuts 'a' (dist 2) out
    out1 = {
        r.node
        for r in shortest_paths(_edges(spark, _GRAPH), ("L",), k=1).collect()
    }
    assert out1 == {"L", "c", "b", "d"}
    # second landmark 'c': b at 1, a at 2; c itself at 0
    out2 = {
        (r.node, r.landmark): r.dist
        for r in shortest_paths(
            _edges(spark, _GRAPH), ("L", "c"), k=2
        ).collect()
    }
    assert out2[("c", "c")] == 0 and out2[("b", "c")] == 1
    assert out2[("a", "c")] == 2 and out2[("a", "L")] == 2


def test_kg_paths_enumerates_simple_paths(spark):
    rows = kg_paths(
        _edges(spark, _GRAPH), sources=("a",), targets=("L",), max_len=3
    ).collect()
    got = {(r.path, r.hops) for r in rows}
    assert got == {("a>b>L", 2), ("a>b>c>L", 3)}
    assert all(r.src == "a" and r.dst == "L" for r in rows)
    # max_len=2 drops the 3-hop route
    short = kg_paths(
        _edges(spark, _GRAPH), sources=("a",), targets=("L",), max_len=2
    ).collect()
    assert {(r.path, r.hops) for r in short} == {("a>b>L", 2)}


def test_kg_paths_cycle_guard_and_substring_ids(spark):
    # cycle x->y->x plus exit y->t: the only simple path is x>y>t;
    # id 'x' is a substring of id 'xx' — the fence must not let the
    # xx node block (or be blocked by) x.
    e = _edges(
        spark,
        [("x", "y"), ("y", "x"), ("y", "t"), ("x", "xx"), ("xx", "t")],
    )
    rows = kg_paths(e, sources=("x",), targets=("t",), max_len=4).collect()
    assert {(r.path, r.hops) for r in rows} == {
        ("x>y>t", 2),
        ("x>xx>t", 2),
    }


def test_blocking_quality_hand_counts(spark):
    # 6 records; gold dups: (1,2), (3,4), (5,6); candidates from a
    # "blocker" that found (2,1) [dup order], (3,4), (1,5) [false
    # positive], (3,3) [self, dropped], (3,4) again [duplicate row]
    cand = spark.createDataFrame(
        [("2", "1"), ("3", "4"), ("1", "5"), ("3", "3"), ("3", "4")],
        ["a", "b"],
    )
    gold = spark.createDataFrame(
        [("1", "2"), ("3", "4"), ("5", "6")], ["a", "b"]
    )
    row = blocking_quality(cand, gold, n_records=6).collect()[0]
    assert row.n_cand == 3 and row.n_gold == 3 and row.n_true == 2
    assert row.pc_micro == 666666  # floor(1e6 * 2/3)
    assert row.pq_micro == 666666
    # C(6,2)=15 -> rr = 1e6 - floor(1e6*3/15) = 800000
    assert row.rr_micro == 800000


def test_blocking_quality_empty_candidates(spark):
    cand = spark.createDataFrame([], "a string, b string")
    gold = spark.createDataFrame([("1", "2")], ["a", "b"])
    row = blocking_quality(cand, gold, n_records=4).collect()[0]
    assert row.n_cand == 0 and row.n_true == 0
    assert row.pc_micro == 0 and row.pq_micro is None
    assert row.rr_micro == 1000000


def test_bcubed_quality_hand_counts(spark):
    from easyner_spark.operators.dedup import bcubed_quality

    # gold: {r1,r2,r3} + {r4}; predicted: {r1,r2} + {r3,r4}
    rows_ = [
        ("r1", "pA", "g1"),
        ("r2", "pA", "g1"),
        ("r3", "pB", "g1"),
        ("r4", "pB", "g2"),
    ]
    a = spark.createDataFrame(rows_, ["record", "pred_cluster", "gold_cluster"])
    row = bcubed_quality(a).collect()[0]
    assert row.n_records == 4
    # per record precision: r1,r2: 2/2=1; r3: 1/2; r4: 1/2
    # avg = (1e6+1e6+500000+500000)/4 = 750000
    assert row.bcubed_precision_micro == 750000
    # recall: r1,r2: 2/3; r3: 1/3; r4: 1/1
    # micro floors: 666666,666666,333333,1000000 -> avg 666666 (floor)
    assert row.bcubed_recall_micro == 666666
    # f1 = 2*750000*666666 // (750000+666666)
    assert row.bcubed_f1_micro == (
        2 * 750000 * 666666 // (750000 + 666666)
    )


def test_bcubed_perfect_clustering(spark):
    from easyner_spark.operators.dedup import bcubed_quality

    a = spark.createDataFrame(
        [("r1", "p1", "g1"), ("r2", "p1", "g1"), ("r3", "p2", "g2")],
        ["record", "pred_cluster", "gold_cluster"],
    )
    row = bcubed_quality(a).collect()[0]
    assert row.bcubed_precision_micro == 1000000
    assert row.bcubed_recall_micro == 1000000
    assert row.bcubed_f1_micro == 1000000
