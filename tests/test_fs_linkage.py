"""Fellegi-Sunter EM record linkage (pattern-level EM, bounded state).

Reference parity: EasyNER links by exact dictionary lookup only
(scripts/entity_linking.py); probabilistic multi-field linkage is
north_star canonicalization surface. EM runs on the <= 2^F agreement
pattern table, never on pair rows.
"""

import pytest

from easyner_spark.operators.nel import fs_em_linkage


def _mk_pairs(spark, rows):
    return spark.createDataFrame(
        rows, "id_a int, id_b int, f_name boolean, f_year boolean"
    )


@pytest.fixture(scope="module")
def linkage(spark):
    # 40 true-match pairs: name agrees always, year agrees 75%.
    # 160 non-match pairs: name agrees 10%, year agrees 50%.
    rows = []
    k = 0
    for i in range(40):
        rows.append((k, k + 1000, True, i % 4 != 0))
        k += 1
    for i in range(160):
        rows.append((k, k + 1000, i % 10 == 0, i % 2 == 0))
        k += 1
    return _mk_pairs(spark, rows)


def test_em_separates_matches_from_nonmatches(spark, linkage):
    out = fs_em_linkage(linkage, ("f_name", "f_year"), iters=8).collect()
    rows = {r.id_a: r for r in out}
    assert len(rows) == 200
    src = {r["id_a"]: (r["f_name"], r["f_year"]) for r in linkage.collect()}
    p = {}
    for a, r in rows.items():
        p[src[a]] = r.match_prob
    # monotone in agreement: full > each mixed > none, and the
    # full-agreement pattern (typical of true matches) is flagged
    # while full disagreement is not
    assert p[(True, True)] > p[(True, False)] > p[(False, False)]
    assert p[(True, True)] > p[(False, True)] > p[(False, False)]
    assert p[(True, True)] >= 0.5 and p[(False, False)] < 0.5
    for r in rows.values():
        assert r.is_match == (r.match_prob >= 0.5)


def test_pattern_count_determines_prob(spark, linkage):
    # pairs with identical agreement vectors get identical probabilities
    out = fs_em_linkage(linkage, ("f_name", "f_year"), iters=4).collect()
    by_pattern = {}
    rows = {r.id_a: r for r in out}
    src = {r["id_a"]: (r["f_name"], r["f_year"]) for r in linkage.collect()}
    for a, r in rows.items():
        by_pattern.setdefault(src[a], set()).add(r.match_prob)
    assert all(len(v) == 1 for v in by_pattern.values())


def test_degenerate_field_clamped_not_poisoned(spark):
    # every pair agrees on f_year: u would hit 1.0 and zero the
    # (1-u) product for disagreeing patterns; the clamp keeps EM
    # running and the discriminative field still separates.
    rows = [(i, i + 100, i < 10, True) for i in range(50)]
    out = fs_em_linkage(
        _mk_pairs(spark, rows), ("f_name", "f_year"), iters=6
    ).collect()
    probs = {r.id_a: r.match_prob for r in out}
    assert len(probs) == 50
    assert min(probs[i] for i in range(10)) > max(probs[i] for i in range(10, 50))


def test_validation(spark, linkage):
    with pytest.raises(ValueError):
        fs_em_linkage(linkage, (), iters=3)
    with pytest.raises(ValueError):
        fs_em_linkage(linkage, ("f_name",), iters=0)
