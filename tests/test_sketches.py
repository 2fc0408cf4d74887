"""Corpus-monitoring sketches (operators/sketches.py): linear-counting
cardinality + fixed-bin histograms. Value parity vs DuckDB is pinned
by the distinct_count / length_histogram oracle queries."""

import pytest
from pyspark.sql import functions as F


class TestLinearCount:
    def _est(self, spark, values, m=4096):
        from easyner_spark.operators.sketches import linear_count_distinct

        df = spark.createDataFrame([(v,) for v in values], "k string")
        return linear_count_distinct(df, "k", m=m).collect()[0]

    def test_estimate_tracks_cardinality(self, spark):
        r = self._est(spark, [f"v{i}" for i in range(500)] * 3)  # 500 distinct
        assert r["hit_buckets"] <= 500
        assert abs(r["estimate"] - 500) / 500 < 0.05

    def test_duplicates_do_not_inflate(self, spark):
        a = self._est(spark, ["x", "y", "z"])
        b = self._est(spark, ["x", "y", "z"] * 100)
        assert a["estimate"] == b["estimate"]
        assert a["hit_buckets"] == 3

    def test_saturation_reports_null(self, spark):
        r = self._est(spark, [f"v{i}" for i in range(64)], m=2)
        assert r["hit_buckets"] == 2
        assert r["estimate"] is None

    def test_m_gate(self, spark):
        with pytest.raises(ValueError):
            self._est(spark, ["x"], m=1)


class TestExactQuantiles:
    def _q(self, spark, values, qs):
        from easyner_spark.operators.sketches import exact_quantiles

        df = spark.createDataFrame([(v,) for v in values], "x int")
        rows = exact_quantiles(df, "x", qs=qs).collect()
        return {r["q_micro"]: (r["n"], r["rank"], r["value"]) for r in rows}

    def test_hand_computed_ranks(self, spark):
        # n=10, rank = ceil(q*10): 0.25 -> 3, 0.5 -> 5, 1.0 -> 10
        out = self._q(spark, list(range(1, 11)), (0.25, 0.5, 1.0))
        assert out[250_000] == (10, 3, 3)
        assert out[500_000] == (10, 5, 5)
        assert out[1_000_000] == (10, 10, 10)

    def test_duplicates_and_min_rank_clamp(self, spark):
        # [1,1,1,9]: median rank 2 lands inside the run of 1s; a
        # microscopic q clamps to rank 1 = min
        out = self._q(spark, [1, 1, 1, 9], (0.000001, 0.5))
        assert out[500_000] == (4, 2, 1)
        assert out[1] == (4, 1, 1)

    def test_nulls_excluded_and_empty_input(self, spark):
        from easyner_spark.operators.sketches import exact_quantiles

        df = spark.createDataFrame([(None,), (7,)], "x int")
        rows = exact_quantiles(df, "x", qs=(0.5,)).collect()
        assert [(r["n"], r["value"]) for r in rows] == [(1, 7)]
        assert exact_quantiles(df.where("x < 0"), "x", qs=(0.5,)).count() == 0

    def test_q_gates(self, spark):
        with pytest.raises(ValueError):
            self._q(spark, [1], (0.0,))
        with pytest.raises(ValueError):
            self._q(spark, [1], (1.5,))
        with pytest.raises(ValueError):  # collide after micro rounding
            self._q(spark, [1], (0.5, 0.5000000001))


class TestHistogram:
    def _hist(self, spark, values, **kw):
        from easyner_spark.operators.sketches import histogram_fixed_bins

        df = spark.createDataFrame([(v,) for v in values], "x int")
        rows = histogram_fixed_bins(df, "x", **kw).collect()
        return {r["bin"]: (r["lo"], r["hi"], r["n"]) for r in rows}

    def test_binning_and_tail_absorb(self, spark):
        got = self._hist(spark, [0, 5, 9, 10, 25, 999], bin_width=10, n_bins=3)
        assert got[0] == (0, 10, 3)
        assert got[1] == (10, 20, 1)
        # 25 and the 999 outlier both land in the last bin
        assert got[2] == (20, 30, 2)

    def test_negative_clamps_to_zero_bin(self, spark):
        got = self._hist(spark, [-5, 3], bin_width=10, n_bins=2)
        assert got[0][2] == 2

    def test_empty_bins_absent_and_gates(self, spark):
        got = self._hist(spark, [95], bin_width=10, n_bins=10)
        assert list(got) == [9]
        with pytest.raises(ValueError):
            self._hist(spark, [1], bin_width=0, n_bins=3)


class TestReviewFixes:
    def test_null_metric_rows_excluded(self, spark):
        from easyner_spark.operators.sketches import histogram_fixed_bins

        df = spark.createDataFrame(
            [(5,), (None,), (995,)], "x int"
        )
        got = {r["bin"]: r["n"] for r in
               histogram_fixed_bins(df, "x", bin_width=10, n_bins=3).collect()}
        # NULL must NOT inflate the tail bin (Spark least/greatest
        # skip NULL operands — the silent-tail-count bug class)
        assert got == {0: 1, 2: 1}


class TestCountMin:
    WORDS = ["join"] * 7 + ["hash"] * 3 + ["scan"] * 2 + ["row"]

    @pytest.fixture(scope="class")
    def stream(self, spark):
        return spark.createDataFrame([(w,) for w in self.WORDS], "x string")

    @staticmethod
    def _py_cms(words, w, d):
        """Independent pure-Python replica of the md5-seeded sketch."""
        import hashlib

        cells = {}
        for x in words:
            for r in range(d):
                h = int(hashlib.md5(f"{r}:{x}".encode()).hexdigest()[:8], 16) % w
                cells[(r, h)] = cells.get((r, h), 0) + 1
        return cells

    def test_sketch_matches_python_replica(self, spark, stream):
        from easyner_spark.operators.sketches import cms_sketch

        got = {(r.r, r.b): r.cnt for r in cms_sketch(stream, "x", w=64, d=3).collect()}
        assert got == self._py_cms(self.WORDS, 64, 3)

    def test_estimates_one_sided_and_exact_here(self, spark, stream):
        """CMS guarantee: est >= true always; with this tiny stream the
        python replica gives the exact expected min per term, absent
        term included (its cells may collide — whatever the replica
        says is what the engine must say)."""
        import hashlib

        from easyner_spark.operators.sketches import cms_estimate, cms_sketch

        w, d = 64, 3
        cand = ["join", "hash", "scan", "row", "absent"]
        cells = self._py_cms(self.WORDS, w, d)
        want = {
            t: min(
                cells.get(
                    (r, int(hashlib.md5(f"{r}:{t}".encode()).hexdigest()[:8], 16) % w),
                    0,
                )
                for r in range(d)
            )
            for t in cand
        }
        sk = cms_sketch(stream, "x", w=w, d=d)
        cdf = spark.createDataFrame([(t,) for t in cand], "term string")
        got = {r.term: r.est for r in cms_estimate(sk, cdf, w=w, d=d).collect()}
        assert got == want
        true = {"join": 7, "hash": 3, "scan": 2, "row": 1, "absent": 0}
        assert all(got[t] >= true[t] for t in cand)

    def test_state_bounded(self, spark, stream):
        from easyner_spark.operators.sketches import cms_sketch

        assert cms_sketch(stream, "x", w=8, d=2).count() <= 16
