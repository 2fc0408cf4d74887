"""Reciprocal-best-match alignment and temperature mixture targets."""

import pytest

from easyner_spark.operators.nel import reciprocal_best_links
from easyner_spark.operators.sampling import (
    mixture_rates,
    temperature_targets,
)


def test_reciprocal_best_mutual_only(spark):
    # a1's best is b1 (90) and b1's best is a1 -> kept.
    # a2's best is b1 (80) but b1 prefers a1 -> dropped (hub guard).
    # a3 <-> b3 mutual at 50 -> kept.
    pairs = spark.createDataFrame(
        [
            ("a1", "b1", 90),
            ("a1", "b2", 10),
            ("a2", "b1", 80),
            ("a3", "b3", 50),
            ("a2", "b3", 40),
        ],
        ["a", "b", "score"],
    )
    out = {(r.a, r.b): r.score for r in reciprocal_best_links(pairs).collect()}
    assert out == {("a1", "b1"): 90, ("a3", "b3"): 50}


def test_reciprocal_best_tie_breaks_lexicographic(spark):
    # a1 ties between b1 and b2 at 70 -> deterministic winner b1;
    # b1's only candidate is a1 -> mutual.
    pairs = spark.createDataFrame(
        [("a1", "b2", 70), ("a1", "b1", 70)], ["a", "b", "score"]
    )
    out = [(r.a, r.b, r.score) for r in reciprocal_best_links(pairs).collect()]
    assert out == [("a1", "b1", 70)]


def test_temperature_targets_flatten():
    counts = {"en": 1_000_000, "sw": 1_000}
    nat = temperature_targets(counts, alpha=1.0)
    assert nat["en"] / nat["sw"] == pytest.approx(1000.0)
    t = temperature_targets(counts, alpha=0.5)
    assert t["en"] / t["sw"] == pytest.approx(1000.0**0.5)
    uni = temperature_targets(counts, alpha=0.0)
    assert uni["en"] == uni["sw"] == 1.0
    with pytest.raises(ValueError):
        temperature_targets(counts, alpha=1.5)


def test_temperature_composes_with_mixture_rates():
    counts = {"en": 10_000, "sw": 100}
    rates = mixture_rates(counts, temperature_targets(counts, alpha=0.0))
    # uniform targets -> downsample en to sw's size: en rate 1%, sw kept
    assert rates["sw"] == 1_000_000
    assert rates["en"] == 10_000
