"""kg_negatives: filtered-LCWA semantics + bit-reproducible md5
indexing pinned against a pure-Python replica."""

import hashlib

from easyner_spark.operators.graph import kg_negatives

TRIPLES = [
    ("a", "r1", "b"),
    ("a", "r1", "c"),
    ("b", "r2", "c"),
    ("c", "r1", "a"),
]


def _replica(triples, k):
    vocab = sorted({o for _, _, o in triples})
    true = set(triples)
    out = set()
    for s, p, o in triples:
        for slot in range(k):
            h = hashlib.md5(f"{s}|{p}|{o}|{slot}".encode()).hexdigest()
            ent = vocab[int(h[:8], 16) % len(vocab)]
            if ent != o and (s, p, ent) not in true:
                out.add((s, p, ent, slot))
    return out


def test_matches_pure_python_replica(spark):
    t = spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")
    got = {
        (r["subj"], r["pred"], r["obj_neg"], r["slot"])
        for r in kg_negatives(t, k=4).collect()
    }
    assert got == _replica(TRIPLES, 4)
    # no accidental positives, no self-corruptions survive
    true = set(TRIPLES)
    for s, p, o, _ in got:
        assert (s, p, o) not in true


def test_deterministic_across_runs(spark):
    t = spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")
    a = sorted(map(tuple, kg_negatives(t, k=2).collect()))
    b = sorted(map(tuple, kg_negatives(t, k=2).collect()))
    assert a == b and len(a) > 0
