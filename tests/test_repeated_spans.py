"""repeated_spans / strip_repeated_spans (dedup.py): Lee-et-al-style
corpus-wide substring flagging. Value parity is pinned by the
repeated_spans oracle query; these tests pin the span semantics on a
corpus with known repeats."""

import pytest

# k=3 windows. The 8-token boilerplate run "one two three four five
# six seven eight" appears in docs 1 and 2 (cross-doc repeat); doc 3
# repeats its own 4-token run twice (within-doc repeat); doc 4 is
# unique; doc 5 is shorter than k.
DOCS = [
    (1, "alpha one two three four five six seven eight beta gamma"),
    (2, "one two three four five six seven eight delta epsilon zeta"),
    (3, "pad red green blue white pad2 pad3 red green blue white end"),
    (4, "totally unique words nothing shared here at all today"),
    (5, "hi yo"),
]


def _spans(spark, **kw):
    from easyner_spark.operators.dedup import repeated_spans

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = repeated_spans(df, k=3, min_count=2, **kw).collect()
    return {r["id"]: sorted((x["span_start"], x["span_end"]) for x in out if x["id"] == r["id"]) for r in out}


class TestRepeatedSpans:
    def test_cross_doc_repeat_merges_to_one_span(self, spark):
        got = _spans(spark)
        # doc 1: tokens 1..8 shared -> windows at pos 1..6 merge to [1, 9)
        assert got[1] == [(1, 9)]
        # doc 2: same run at pos 0 -> [0, 8)
        assert got[2] == [(0, 8)]

    def test_within_doc_repeat_both_occurrences_flagged(self, spark):
        got = _spans(spark)
        # doc 3: 'red green blue white' at pos 1 and 7 -> two windows
        # each ([1,5) and [7,11)); gap of 2 tokens keeps them separate
        assert got[3] == [(1, 5), (7, 11)]

    def test_unique_and_short_docs_absent(self, spark):
        got = _spans(spark)
        assert 4 not in got and 5 not in got

    def test_k_gate(self, spark):
        from easyner_spark.operators.dedup import repeated_spans

        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        with pytest.raises(ValueError):
            repeated_spans(df, k=1)

    def test_no_single_partition_exchange(self, spark):
        from easyner_spark.operators.dedup import repeated_spans

        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        plan = (
            repeated_spans(df, k=3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SinglePartition" not in plan


class TestStrip:
    def test_strip_removes_flagged_tokens_only(self, spark):
        from easyner_spark.operators.dedup import repeated_spans, strip_repeated_spans

        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        spans = repeated_spans(df, k=3, min_count=2)
        out = {r["id"]: r["text"] for r in strip_repeated_spans(df, spans).collect()}
        assert out[1] == "alpha beta gamma"
        assert out[2] == "delta epsilon zeta"
        assert out[3] == "pad pad2 pad3 end"
        # untouched docs come back tokenized-rejoined but complete
        assert out[4] == "totally unique words nothing shared here at all today"
        assert out[5] == "hi yo"
