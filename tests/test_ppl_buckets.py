"""CCNet-style perplexity tercile bucketing (head / middle / tail).

Reference parity: EasyNER has no corpus-quality gate; this is the
north_star curation stage (Wenzek et al. 2020) over the unigram LM in
operators/scoring.py — all-integer ce_nano metric, type-1 exact
quantile thresholds.
"""

import pytest
from pyspark.sql import functions as F

from easyner_spark.operators.scoring import ppl_buckets, unigram_vocab


@pytest.fixture(scope="module")
def corpus(spark):
    # 6 docs spanning three fluency tiers under the corpus's own LM:
    # docs repeating frequent words score low ce; rare-word docs high.
    common = "the cat sat on the mat "
    rows = [
        (1, common * 6),
        (2, common * 5 + "dog "),
        (3, common * 3 + "quantum flux "),
        (4, common * 2 + "zebra qubit vortex "),
        # NB: all-OOV docs tie exactly (ce = -lp_oov regardless of
        # length), so doc 5 keeps one in-vocab word to stay distinct
        (5, "the xylophone quasar nebula"),
        (6, "jabberwock snark boojum frumious"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_terciles_cover_and_order(spark, corpus):
    out = ppl_buckets(corpus, min_count=2).collect()
    assert len(out) == 6
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r.ce_nano)
    assert set(by_bucket) == {"head", "middle", "tail"}
    # bucket boundaries respect the metric order
    assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    assert max(by_bucket["middle"]) <= min(by_bucket["tail"])
    # type-1 thresholds at micro-rounded terciles (333333, 666667) over
    # n=6 distinct milli-nat bins: ranks 2 and 5 -> split 2 / 3 / 1
    assert len(by_bucket["head"]) == 2
    assert len(by_bucket["middle"]) == 3
    assert len(by_bucket["tail"]) == 1


def test_fluent_docs_land_in_head(spark, corpus):
    out = {r.id: r.bucket for r in ppl_buckets(corpus, min_count=2).collect()}
    assert out[1] == "head"
    assert out[6] == "tail"


def test_frozen_vocab_scores_new_docs(spark, corpus):
    vocab = unigram_vocab(corpus, min_count=2).localCheckpoint(eager=True)
    new = spark.createDataFrame(
        [(10, "the cat sat"), (11, "glorp zzyzx wibble"), (12, "the mat")],
        "doc_id int, text string",
    )
    rows = {r.id: r for r in ppl_buckets(new, vocab=vocab).collect()}
    assert len(rows) == 3
    # in-vocab docs beat the all-OOV doc under the frozen reference LM
    assert rows[10].ce_nano < rows[11].ce_nano
    assert rows[12].ce_nano < rows[11].ce_nano
    # type-1 thresholds over n=3: t1 at rank 1 (the best doc = head),
    # t2 at rank 3 (the max -> nothing exceeds it, tail empty)
    best = min(rows.values(), key=lambda r: r.ce_nano)
    assert best.bucket == "head"
    assert rows[11].bucket == "middle"


def test_zero_token_docs_absent(spark):
    docs = spark.createDataFrame(
        [(1, "real words here repeated words here"), (2, ""), (3, "...!!!")],
        "doc_id int, text string",
    )
    out = ppl_buckets(docs, min_count=1)
    assert sorted(r.id for r in out.collect()) == [1]
