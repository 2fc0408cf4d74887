"""BM25 ranking: semantic properties + plan shape. Value parity vs
DuckDB is pinned by the bm25_rank oracle query (shared expression
generator bm25_oracle_sql)."""

import pytest


class TestBm25:
    CORPUS = [
        (1, "spark join spark join spark"),       # dense in both terms
        (2, "spark filter scan table row"),       # one term, once
        (3, "filter scan table row group agg"),   # no query terms
        (4, "rare join"),                         # short doc, one term
    ]

    def _run(self, spark, terms, **kw):
        from easyner_spark.operators.ranking import bm25_rank

        df = spark.createDataFrame(self.CORPUS, "doc_id long, text string")
        return {r["id"]: r["score"] for r in bm25_rank(df, terms, **kw).collect()}

    def test_every_doc_scored_and_ordering(self, spark):
        got = self._run(spark, ("spark", "join"))
        assert set(got) == {1, 2, 3, 4}
        # no query terms -> exactly 0; more matched terms -> higher
        assert got[3] == 0.0
        assert got[1] > got[2] > 0
        assert got[1] > got[4] > 0

    def test_shorter_doc_wins_at_equal_tf(self, spark):
        # docs 2 and 4 each contain one query term once ("spark" and
        # "join" have equal df=2 in this corpus); doc 4 is shorter, so
        # BM25's length normalization must rank it higher
        got = self._run(spark, ("spark", "join"))
        assert got[4] > got[2]

    def test_top_k(self, spark):
        from easyner_spark.operators.ranking import bm25_rank

        df = spark.createDataFrame(self.CORPUS, "doc_id long, text string")
        top = bm25_rank(df, ("spark", "join"), top_k=2).collect()
        assert [r["id"] for r in top] == [1, 4]
        assert top[0]["score"] >= top[1]["score"]

    def test_empty_terms_raise(self, spark):
        with pytest.raises(ValueError):
            self._run(spark, ())

    def test_no_data_shuffle_plan(self, spark):
        # corpus-side data never shuffles: the only exchanges are the
        # 1-row scalar stats aggregate (SinglePartition over partial
        # aggs — bounded, one row per task) and its broadcast back
        from easyner_spark.operators.ranking import bm25_rank

        df = spark.createDataFrame(self.CORPUS, "doc_id long, text string")
        out = bm25_rank(df, ("spark", "join"))
        out.collect()
        plan = (
            out._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0]
        )
        assert "Exchange hashpartitioning" not in plan
        assert plan.count("BroadcastExchange") == 1


class TestInvertedPostings:
    DOCS = [
        (1, "spark join spark"),
        (2, "spark filter"),
        (3, "rare"),
    ]

    def _run(self, spark, **kw):
        from easyner_spark.operators.ranking import inverted_postings

        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        return {(r["term"], r["id"]): r for r in inverted_postings(df, **kw).collect()}

    def test_tf_df_idf(self, spark):
        import math

        got = self._run(spark)
        assert got[("spark", 1)]["tf"] == 2
        assert got[("spark", 1)]["df"] == 2
        assert got[("rare", 3)]["df"] == 1
        # idf per-row from exact ints: ln((N+1)/(df+1))
        assert got[("spark", 2)]["idf"] == round(math.log(4 / 3), 6)
        assert got[("rare", 3)]["idf"] == round(math.log(4 / 2), 6)

    def test_df_cuts(self, spark):
        got = self._run(spark, min_df=2)
        assert ("rare", 3) not in got and ("spark", 1) in got
        capped = self._run(spark, max_df=1)
        assert ("spark", 1) not in capped and ("rare", 3) in capped
        import pytest as _pt

        with _pt.raises(ValueError):
            self._run(spark, min_df=0)
