"""Event operators: gap sessionization, as-of join, typed rollup.

Semantics pinned here; value parity vs DuckDB is pinned by the
sessionize/asof_join/event_rollup oracle queries (tools/check_oracle).
"""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

T0 = datetime(2024, 1, 1, 0, 0, 0)
MIN = timedelta(minutes=1)
US = 1_000_000


def _ts(minutes: float) -> datetime:
    return T0 + minutes * MIN


def _us(minutes: float) -> int:
    return int((_ts(minutes) - datetime(1970, 1, 1)).total_seconds() * US)


class TestSessionize:
    def _run(self, spark, rows):
        from easyner_spark.operators.events import sessionize

        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp_ntz, value double"
        )
        return sorted(
            (r["user_id"], r["session_start_us"], r["session_end_us"],
             r["n_events"], r["value_cents"])
            for r in sessionize(df).collect()
        )

    def test_gap_chains_and_breaks(self, spark):
        rows = [
            # user 1: 0, 29, 58 chain (each gap < 30 min); 120 is new
            (1, _ts(0), 1.00), (1, _ts(29), 2.50), (1, _ts(58), 0.25),
            (1, _ts(120), 10.00),
            # user 2: single event
            (2, _ts(5), 3.33),
        ]
        assert self._run(spark, rows) == [
            (1, _us(0), _us(58 + 30), 3, 375),
            (1, _us(120), _us(150), 1, 1000),
            (2, _us(5), _us(35), 1, 333),
        ]

    def test_exact_gap_merges(self, spark):
        # Spark merges ADJACENT session windows: an event at exactly
        # prev + 30 min stays in the session; one microsecond later
        # starts a new one. The oracle's island rule mirrors this
        # (strict >).
        rows = [(1, _ts(0), 1.0), (1, _ts(30), 1.0)]
        assert len(self._run(spark, rows)) == 1
        rows = [(1, _ts(0), 1.0), (1, T0 + timedelta(minutes=30, microseconds=1), 1.0)]
        assert len(self._run(spark, rows)) == 2

    def test_null_ts_dropped(self, spark):
        from easyner_spark.operators.events import sessionize

        df = spark.createDataFrame(
            [(1, None, 5.0), (1, _ts(0), 2.0)],
            "user_id long, ts timestamp_ntz, value double",
        )
        got = sessionize(df).collect()
        assert len(got) == 1
        assert got[0]["n_events"] == 1 and got[0]["value_cents"] == 200

    def test_single_shuffle_plan(self, spark):
        from easyner_spark.operators.events import sessionize

        df = spark.createDataFrame(
            [(1, _ts(0), 1.0)], "user_id long, ts timestamp_ntz, value double"
        )
        plan = sessionize(df)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1


class TestAsofJoin:
    def _run(self, spark, views, clicks):
        from easyner_spark.operators.events import asof_join

        schema = "event_id long, user_id long, ts timestamp_ntz"
        v = spark.createDataFrame(views, schema)
        c = spark.createDataFrame(clicks, schema)
        out = asof_join(v, c, key="user_id", ts_col="ts")
        return {r["event_id"]: (r["event_id_right"], r["ts_right"])
                for r in out.collect()}

    def test_matches_latest_at_or_before(self, spark):
        views = [(10, 1, _ts(10)), (11, 1, _ts(40)), (12, 1, _ts(2))]
        clicks = [(100, 1, _ts(5)), (101, 1, _ts(30))]
        got = self._run(spark, views, clicks)
        assert got[10] == (100, _ts(5))     # latest click <= t10 is t5
        assert got[11] == (101, _ts(30))
        assert got[12] == (None, None)      # no click at or before t2

    def test_same_ts_inclusive_and_tiebreak(self, spark):
        views = [(10, 1, _ts(5))]
        clicks = [(100, 1, _ts(5)), (101, 1, _ts(5)), (90, 1, _ts(1))]
        got = self._run(spark, views, clicks)
        # click at the view's exact ts matches; among equal-ts clicks
        # the largest event_id wins deterministically
        assert got[10] == (101, _ts(5))

    def test_null_ts_right_never_matches(self, spark):
        # a null-ts click must not shadow-match (it would sort first in
        # the window without the explicit filter)
        views = [(10, 1, _ts(10))]
        clicks = [(100, 1, None), (90, 1, _ts(1))]
        assert self._run(spark, views, clicks)[10] == (90, _ts(1))

    def test_string_tiebreak_native_type(self, spark):
        # tiebreak column keeps its native type: a string id must still
        # resolve equal-ts ties deterministically (largest string wins)
        from easyner_spark.operators.events import asof_join

        schema = "event_id string, user_id long, ts timestamp_ntz"
        v = spark.createDataFrame([("v1", 1, _ts(5))], schema)
        c = spark.createDataFrame(
            [("ca", 1, _ts(5)), ("cb", 1, _ts(5))], schema
        )
        row = asof_join(v, c).collect()[0]
        assert row["event_id_right"] == "cb"

    def test_key_isolation(self, spark):
        views = [(10, 1, _ts(10))]
        clicks = [(100, 2, _ts(5))]
        assert self._run(spark, views, clicks)[10] == (None, None)

    def test_all_left_columns_survive(self, spark):
        from easyner_spark.operators.events import asof_join

        v = spark.createDataFrame(
            [(10, 1, _ts(10), "x")],
            "event_id long, user_id long, ts timestamp_ntz, extra string",
        )
        c = spark.createDataFrame(
            [(100, 1, _ts(5))], "event_id long, user_id long, ts timestamp_ntz"
        )
        row = asof_join(v, c).collect()[0]
        assert row["extra"] == "x" and row["event_id"] == 10
        assert row["event_id_right"] == 100

    def test_single_shuffle_plan(self, spark):
        from easyner_spark.operators.events import asof_join

        schema = "event_id long, user_id long, ts timestamp_ntz"
        v = spark.createDataFrame([(10, 1, _ts(10))], schema)
        c = spark.createDataFrame([(100, 1, _ts(5))], schema)
        plan = (
            asof_join(v, c)._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange") == 1


class TestEventRollup:
    def test_values_and_malformed_props(self, spark):
        from easyner_spark.operators.events import event_rollup

        df = spark.createDataFrame(
            [
                (1, "click", 1.25, '{"k": 3}'),
                (2, "click", 2.00, "not json"),
                (2, "click", 0.50, '{"k": 7}'),
                (3, "view", 9.99, '{"k": 1}'),
            ],
            "user_id long, event_type string, value double, props string",
        )
        got = {r["event_type"]: r.asDict() for r in event_rollup(df).collect()}
        assert got["click"]["n_events"] == 3
        assert got["click"]["n_users"] == 2
        assert got["click"]["value_cents"] == 375
        assert got["click"]["k_sum"] == 10  # malformed row ignored
        assert got["view"]["value_cents"] == 999
