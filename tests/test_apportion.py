"""apportion_budget: Hamilton largest-remainder invariants."""

import pytest

from easyner_spark.operators.sampling import apportion_budget


def _quotas(spark, rows, budget):
    w = spark.createDataFrame(rows, "host string, weight long")
    return {
        r["host"]: r["quota"]
        for r in apportion_budget(w, budget=budget).collect()
    }


def test_sums_exactly_and_largest_remainder(spark):
    # weights 5,3,2 over budget 7: exact shares 3.5/2.1/1.4 ->
    # floors 3/2/1 (sum 6), one leftover goes to the largest
    # remainder (.5 -> a)
    q = _quotas(spark, [("a", 5), ("b", 3), ("c", 2)], 7)
    assert q == {"a": 4, "b": 2, "c": 1}
    assert sum(q.values()) == 7


def test_tie_break_and_zero_weight(spark):
    # equal weights, budget not divisible: ties to the smaller key
    q = _quotas(spark, [("b", 1), ("a", 1), ("c", 1)], 4)
    assert sum(q.values()) == 4
    assert q["a"] == 2 and q["b"] == 1 and q["c"] == 1
    # zero-weight host gets exactly 0, never a leftover +1; negative
    # and NULL weights clamp to 0 (documented contract)
    q2 = _quotas(spark, [("a", 1), ("z", 0)], 3)
    assert q2 == {"a": 3, "z": 0}
    q3 = _quotas(spark, [("a", 6), ("b", 6), ("c", -5)], 3)
    assert q3 == {"a": 2, "b": 1, "c": 0}
    assert sum(q3.values()) == 3
    # all-zero weights: nothing to apportion proportionally
    q4 = _quotas(spark, [("a", 0), ("b", 0)], 10)
    assert q4 == {"a": 0, "b": 0}


def test_property_sums(spark):
    rows = [(f"h{i}", (i * 7) % 13) for i in range(20)]
    for budget in (0, 1, 17, 100, 9999):
        q = _quotas(spark, rows, budget)
        assert sum(q.values()) == budget
        assert all(v >= 0 for v in q.values())


def test_negative_budget_raises(spark):
    w = spark.createDataFrame([("a", 1)], "host string, weight long")
    with pytest.raises(ValueError):
        apportion_budget(w, budget=-1)


def test_stratified_sample_exact(spark):
    from easyner_spark.operators.sampling import stratified_sample_exact

    rows = [(i, "en" if i < 80 else ("sv" if i < 95 else "de"))
            for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample_exact(df, group_col="lang", total=20).collect()
    assert len(out) == 20  # exact, not in-expectation
    by_lang = {}
    for r in out:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + 1
    # proportional quotas: 80/15/5 of 100 -> 16/3/1
    assert by_lang == {"en": 16, "sv": 3, "de": 1}
    # determinism: same rows on a second run
    out2 = stratified_sample_exact(df, group_col="lang", total=20).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    # total > N keeps everything
    assert stratified_sample_exact(df, group_col="lang", total=500).count() == 100


def test_polite_quota_caps_and_carry(spark):
    from easyner_spark.operators.sampling import polite_quota

    w = spark.createDataFrame(
        [("big.com", 90), ("mid.org", 9), ("tail.net", 1)],
        "host string, weight long",
    )
    d = spark.createDataFrame(
        [("big.com", 2), ("tail.net", 0)],  # 0 = no ceiling
        "host string, crawl_delay_s long",
    )
    got = {
        r["host"]: r
        for r in polite_quota(w, d, budget=10_000, epoch_seconds=3600).collect()
    }
    big = got["big.com"]
    assert big["quota"] == 9000
    assert big["max_fetches"] == 1800  # 3600 // 2
    assert big["quota_polite"] == 1800
    assert big["clipped"] == 7200  # surplus carries, not redistributed
    mid = got["mid.org"]
    assert mid["max_fetches"] == -1 and mid["quota_polite"] == mid["quota"]
    tail = got["tail.net"]
    assert tail["max_fetches"] == -1  # delay 0 = uncapped
    assert tail["clipped"] == 0
