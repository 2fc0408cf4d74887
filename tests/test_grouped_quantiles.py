"""grouped_quantiles / grouped_quantile_filter: per-group type-1
quantile semantics and the adaptive gate, plus a plan assertion that
no SinglePartition exchange appears (the windows are partitioned)."""

from easyner_spark.operators.sketches import (
    grouped_quantile_filter,
    grouped_quantiles,
)


def test_per_group_values(spark):
    rows = [("en", v) for v in [1, 2, 3, 4, 5]] + [("sv", v) for v in [10, 20]]
    df = spark.createDataFrame(rows, "lang string, x long")
    got = {
        (r["grp"], r["q_micro"]): (r["n"], r["rank"], r["value"])
        for r in grouped_quantiles(df, "lang", "x", qs=(0.5, 1.0)).collect()
    }
    # en: n=5, median rank ceil(0.5*5)=3 -> value 3; max -> 5
    assert got[("en", 500000)] == (5, 3, 3)
    assert got[("en", 1000000)] == (5, 5, 5)
    # sv: n=2, median rank 1 -> 10; max rank 2 -> 20
    assert got[("sv", 500000)] == (2, 1, 10)
    assert got[("sv", 1000000)] == (2, 2, 20)


def test_adaptive_filter_per_stratum(spark):
    rows = [("en", i) for i in range(1, 11)] + [("sv", i) for i in (1, 2, 3)]
    df = spark.createDataFrame(rows, "lang string, x long")
    kept = {
        (r["lang"], r["x"])
        for r in grouped_quantile_filter(df, "lang", "x", q=0.5).collect()
    }
    # en median = 5 -> keep 5..10; sv median = 2 -> keep 2,3 (a global
    # cut at 5 would gut the sv stratum entirely)
    assert kept == {("en", i) for i in range(5, 11)} | {("sv", 2), ("sv", 3)}


def test_no_single_partition_exchange(spark):
    rows = [("en", v) for v in [1, 2, 3]]
    df = spark.createDataFrame(rows, "lang string, x long")
    out = grouped_quantiles(df, "lang", "x")
    out.collect()
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    final = plan.split("== Initial Plan ==")[0]
    assert "SinglePartition" not in final


def test_filter_null_group_passthrough(spark):
    # NULL-group rows have no cut row: pass through ungated; NULL
    # metric inside a gated group drops (nothing to compare)
    rows = [("en", 1), ("en", 10), (None, 3), ("en", None)]
    df = spark.createDataFrame(rows, "lang string, x long")
    kept = {
        (r["lang"], r["x"])
        for r in grouped_quantile_filter(df, "lang", "x", q=0.5).collect()
    }
    assert kept == {("en", 1), ("en", 10), (None, 3)}
