"""Sparse tf-idf cosine top-k through the inverted-index self-join.

Reference parity: EasyNER has no document-similarity stage (analysis
ends at entity frequency, scripts/analysis.py); this is the lexical
counterpart of the dense ANN family — candidate pairs only where a
surviving term is shared, integer micro-unit dot/norms for
cross-engine determinism.
"""

import math

import pytest

from easyner_spark.operators.ranking import tfidf_sim_topk


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "apple banana cherry"),
            (3, "cherry durian durian"),
            (4, "unique words only here"),
        ],
        "doc_id int, text string",
    )


def _expected_cos(shared, a_vec, b_vec):
    # mirror the operator: idf rounded to 6, micro-unit integer sums
    def idf(df, n=4):
        return round(math.log((n + 1.0) / (df + 1.0)), 6)

    def u(dfreq):
        return int(round(idf(dfreq) * idf(dfreq) * 1e6))

    dot = sum(ta * tb * u(df) for ta, tb, df in shared)
    na = sum(t * t * u(df) for t, df in a_vec)
    nb = sum(t * t * u(df) for t, df in b_vec)
    return round(dot / math.sqrt(na) / math.sqrt(nb), 6)


def test_topk_values_and_ranks(spark, corpus):
    out = {
        (r.id, r.rank): (r.neighbor_id, r.cos)
        for r in tfidf_sim_topk(corpus, k=2, min_df=2).collect()
    }
    # surviving vocabulary (min_df=2): apple df=2, banana df=2, cherry df=2.
    # doc1 vector: apple tf2, banana tf1; doc2: apple1 banana1 cherry1;
    # doc3: cherry1 (durian is hapax); doc4: empty -> absent entirely.
    c12 = _expected_cos(
        [(2, 1, 2), (1, 1, 2)], [(2, 2), (1, 2)], [(1, 2), (1, 2), (1, 2)]
    )
    c23 = _expected_cos([(1, 1, 2)], [(1, 2), (1, 2), (1, 2)], [(1, 2)])
    assert out[(1, 1)] == (2, c12)
    assert out[(2, 1)] == (1, c12)
    assert out[(2, 2)] == (3, c23)
    assert out[(3, 1)] == (2, c23)
    assert (1, 2) not in out  # doc1 shares no surviving term with doc3
    assert not any(i == 4 for i, _ in out)  # all-hapax doc drops out


def test_max_df_prunes_hot_terms(spark, corpus):
    # max_df=1 removes every surviving term -> no pairs at all
    assert tfidf_sim_topk(corpus, k=3, min_df=1, max_df=1).count() == 0


def test_self_pairs_never_emitted(spark, corpus):
    rows = tfidf_sim_topk(corpus, k=10, min_df=2).collect()
    assert all(r.id != r.neighbor_id for r in rows)
    # symmetric: (a,b) present iff (b,a) present, same cosine
    m = {(r.id, r.neighbor_id): r.cos for r in rows}
    assert all(m[(b, a)] == c for (a, b), c in m.items())


def test_k_validation(spark, corpus):
    with pytest.raises(ValueError):
        tfidf_sim_topk(corpus, k=0)


def test_universal_term_zero_idf_no_crash(spark):
    # 'the' appears in every doc: idf rounds to 0, so its postings are
    # dropped (they contribute 0 to every dot/norm) instead of leaving
    # doc 3 with nsq = 0 and a division by zero under ANSI mode.
    docs = spark.createDataFrame(
        [(1, "the cat the cat"), (2, "the dog the cat"), (3, "the the")],
        "doc_id int, text string",
    )
    rows = tfidf_sim_topk(docs, k=3, min_df=1).collect()
    assert all(r.id != 3 and r.neighbor_id != 3 for r in rows)
    # docs 1 and 2 still pair through 'cat' (df=2 < N=3 -> idf > 0)
    assert {(r.id, r.neighbor_id) for r in rows} == {(1, 2), (2, 1)}
