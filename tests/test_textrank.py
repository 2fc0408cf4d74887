"""TextRank sentence salience (per-doc PageRank over the shared-token
sentence graph, all-BIGINT micro-unit iteration).

Reference parity: EasyNER never ranks sentences (analysis stops at
entity frequency, scripts/analysis.py); this is north_star curation
surface. The integer formulation exists because round-snap floats hit
real-exact half-grid boundaries on this operator (see docstring).
"""

import pytest

from easyner_spark.operators.ranking import textrank_sentences

UNIT = 10**9
BASE_U = (3 * UNIT) // 20  # (1 - 17/20) * U


def _py_textrank(sent_tokens, iters=5):
    # independent reimplementation with plain Python ints
    keys = sorted(sent_tokens)
    edges = {}
    for i in keys:
        for j in keys:
            if i != j:
                w = len(sent_tokens[i] & sent_tokens[j])
                if w:
                    edges[(i, j)] = w
    wsum = {j: sum(w for (jj, _), w in edges.items() if jj == j) for j in keys}
    s = {i: UNIT for i in keys}
    for _ in range(iters):
        inc = {i: 0 for i in keys}
        for (j, i), w in edges.items():
            inc[i] += (s[j] * w) // wsum[j]
        s = {i: BASE_U + (17 * inc[i]) // 20 for i in keys}
    return s


@pytest.fixture(scope="module")
def sents(spark):
    rows = [
        ("d1", 0, "spark shuffles data across executors"),
        ("d1", 1, "executors process data in parallel"),
        ("d1", 2, "parallel shuffles move data fast"),
        ("d1", 3, "unrelated zebra quagga"),
        ("d2", 0, "lonely single sentence"),
    ]
    return spark.createDataFrame(rows, "url string, sent_idx int, sentence string")


def test_matches_independent_python_model(spark, sents):
    toks = {
        0: {"spark", "shuffles", "data", "across", "executors"},
        1: {"executors", "process", "data", "in", "parallel"},
        2: {"parallel", "shuffles", "move", "data", "fast"},
        3: {"unrelated", "zebra", "quagga"},
    }
    want = _py_textrank(toks)
    got = {
        r.sent_idx: r.score
        for r in textrank_sentences(sents).where("url = 'd1'").collect()
    }
    for i, su in want.items():
        assert got[i] == su / float(UNIT)


def test_isolated_sentence_floors_at_one_minus_d(spark, sents):
    out = {
        (r.url, r.sent_idx): (r.score, r.rank)
        for r in textrank_sentences(sents, iters=3).collect()
    }
    floor = BASE_U / float(UNIT)
    assert out[("d1", 3)] == (floor, 4)  # no shared tokens -> last rank
    assert out[("d2", 0)] == (floor, 1)  # singleton doc: floor but rank 1


def test_ranks_are_per_doc_dense(spark, sents):
    out = textrank_sentences(sents, iters=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.url, []).append(r.rank)
    assert sorted(by_doc["d1"]) == [1, 2, 3, 4]
    assert by_doc["d2"] == [1]


def test_validation(spark, sents):
    with pytest.raises(ValueError):
        textrank_sentences(sents, iters=0)
    with pytest.raises(ValueError):
        textrank_sentences(sents, d_num=21, d_den=20)
