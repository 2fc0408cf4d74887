"""KG profiling operators: predicate cardinality classes, per-doc
entity salience, host co-citation with the fanout cap."""

import itertools

import pytest

from easyner_spark.operators.analysis import entity_salience
from easyner_spark.operators.triples import predicate_cardinality
from easyner_spark.operators.webtext import host_cocitation


def test_predicate_cardinality_classes(spark):
    rows = [
        # 1:1 — every subj one obj, every obj one subj
        ("s1", "capital_of", "o1"),
        ("s2", "capital_of", "o2"),
        # 1:N — one subj fans out, every obj has one subj
        ("h1", "has_part", "p1"),
        ("h1", "has_part", "p2"),
        ("h1", "has_part", "p3"),
        ("h2", "has_part", "p4"),
        # N:1 — every subj one obj, one obj fans in
        ("c1", "in_country", "k1"),
        ("c2", "in_country", "k1"),
        ("c3", "in_country", "k2"),
        # N:M — both fan
        ("a", "links_to", "x"),
        ("a", "links_to", "y"),
        ("b", "links_to", "x"),
    ]
    edges = spark.createDataFrame(rows, "subj_id string, pred string, obj_id string")
    got = {r["pred"]: r.asDict() for r in predicate_cardinality(edges).collect()}

    assert got["capital_of"]["card_class"] == "1:1"
    assert got["capital_of"]["n_edges"] == 2
    assert got["capital_of"]["n_subj"] == 2
    assert got["capital_of"]["n_obj"] == 2

    assert got["has_part"]["card_class"] == "1:N"
    assert got["has_part"]["max_fanout"] == 3
    assert got["has_part"]["max_fanin"] == 1
    assert got["has_part"]["n_subj"] == 2
    assert got["has_part"]["n_obj"] == 4

    assert got["in_country"]["card_class"] == "N:1"
    assert got["in_country"]["max_fanout"] == 1
    assert got["in_country"]["max_fanin"] == 2

    assert got["links_to"]["card_class"] == "N:M"
    assert got["links_to"]["n_edges"] == 3


def test_entity_salience_weights_and_rank(spark):
    # doc 7: e1 in lead + body; e2 twice in early sentences (ties e1's
    # salience 4) -> tie broken by entity_id asc; e3 body-only.
    rows = [
        (7, 0, "e1"),
        (7, 5, "e1"),
        (7, 1, "e2"),
        (7, 2, "e2"),
        (7, 9, "e3"),
        (8, 0, "e3"),
    ]
    lm = spark.createDataFrame(rows, "url long, sent_idx int, entity_id string")
    got = {
        (r["url"], r["entity_id"]): r.asDict()
        for r in entity_salience(lm).collect()
    }
    assert got[(7, "e1")]["salience"] == 3 + 1
    assert got[(7, "e2")]["salience"] == 2 + 2
    assert got[(7, "e3")]["salience"] == 1
    assert got[(7, "e1")]["n_mentions"] == 2
    assert got[(7, "e1")]["first_sent"] == 0
    assert got[(7, "e2")]["first_sent"] == 1
    # salience tie at 4 -> entity_id asc: e1 rank 1, e2 rank 2
    assert got[(7, "e1")]["rank"] == 1
    assert got[(7, "e2")]["rank"] == 2
    assert got[(7, "e3")]["rank"] == 3
    assert got[(8, "e3")]["rank"] == 1
    assert got[(8, "e3")]["salience"] == 3


def test_entity_salience_drops_unlinked(spark):
    lm = spark.createDataFrame(
        [(1, 0, ""), (1, 0, "e1")], "url long, sent_idx int, entity_id string"
    )
    out = entity_salience(lm).collect()
    assert len(out) == 1 and out[0]["entity_id"] == "e1"


def _brute_cocitation(rows, max_out):
    """Reference recomputation: per-src top max_out dsts by
    (n_links desc, dst asc), then count sources per dst pair."""
    by_src = {}
    for src, dst, n in rows:
        by_src.setdefault(src, []).append((-n, dst))
    pairs = {}
    for src, dsts in by_src.items():
        kept = sorted(d for _, d in sorted(dsts)[:max_out])
        for a, b in itertools.combinations(kept, 2):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    return pairs


@pytest.mark.parametrize("max_out", [2, 3, 100])
def test_host_cocitation_matches_bruteforce(spark, max_out):
    rows = [
        ("s1.com", "a.com", 5),
        ("s1.com", "b.com", 3),
        ("s1.com", "c.com", 3),  # ties b.com on n_links -> dst asc
        ("s1.com", "d.com", 1),
        ("s2.com", "a.com", 1),
        ("s2.com", "b.com", 9),
        ("s3.com", "a.com", 2),
        ("s3.com", "b.com", 2),
        ("s3.com", "c.com", 2),
        ("s4.com", "z.com", 4),  # single-dst source emits nothing
    ]
    hg = spark.createDataFrame(
        rows, "src_host string, dst_host string, n_links long"
    )
    got = {
        (r["host_a"], r["host_b"]): r["n_sources"]
        for r in host_cocitation(hg, max_out=max_out).collect()
    }
    assert got == _brute_cocitation(rows, max_out)


def test_host_cocitation_cap_bites(spark):
    rows = [("s.com", f"d{i}.com", 10 - i) for i in range(6)]
    hg = spark.createDataFrame(
        rows, "src_host string, dst_host string, n_links long"
    )
    got = host_cocitation(hg, max_out=3).collect()
    # top-3 dsts (d0,d1,d2) -> C(3,2)=3 pairs, none involving d3..d5
    assert len(got) == 3
    assert all("d3" not in (r["host_a"], r["host_b"]) for r in got)


def test_entity_types_votes_and_ties(spark):
    from easyner_spark.operators.triples import entity_types

    edges = spark.createDataFrame(
        [
            ("drugA", "inhibits", "geneX"),
            ("drugA", "inhibits", "geneY"),
            ("drugA", "co_occurs_with", "thing"),
            ("geneX", "treats", "disZ"),   # no rule for 'treats' -> no vote
            ("both", "binds", "both2"),
        ],
        "subj_id string, pred string, obj_id string",
    )
    rules = [
        ("inhibits", "subj", "chemical", 2),
        ("inhibits", "obj", "protein", 2),
        ("co_occurs_with", "subj", "concept", 1),
        ("co_occurs_with", "obj", "concept", 1),
        # 'both' gets equal-weight votes for two types -> tie -> asc
        ("binds", "subj", "aaa_type", 1),
        ("binds", "subj", "bbb_type", 1),
    ]
    got = {r["entity_id"]: r.asDict() for r in entity_types(edges, rules).collect()}
    # drugA: chemical 2+2=4, concept 1 -> chemical wins
    assert got["drugA"]["ent_type"] == "chemical"
    assert got["drugA"]["votes"] == 4
    assert got["drugA"]["total_votes"] == 5
    assert got["drugA"]["n_types"] == 2
    # geneX: protein 2 (obj of inhibits); its 'treats' subj role unvoted
    assert got["geneX"]["ent_type"] == "protein"
    assert got["geneX"]["votes"] == 2
    # tie 1-1 -> type asc
    assert got["both"]["ent_type"] == "aaa_type"
    # disZ: no matching rule at all -> absent
    assert "disZ" not in got


def test_isa_closure_chain_and_dag(spark):
    from easyner_spark.operators.graph import isa_closure

    edges = spark.createDataFrame(
        # chain a->b->c->d plus shortcut a->c (min depth must win)
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")],
        "child string, parent string",
    )
    got = {(r["node"], r["anc"]): r["depth"] for r in isa_closure(edges, max_depth=8).collect()}
    assert got[("a", "b")] == 1
    assert got[("a", "c")] == 1  # shortcut beats a->b->c
    assert got[("a", "d")] == 2  # via the shortcut, not 3 via b
    assert got[("b", "d")] == 2
    assert got[("c", "d")] == 1
    assert ("d", "a") not in got  # directed


def test_isa_closure_depth_cap_and_cycle(spark):
    from easyner_spark.operators.graph import isa_closure

    chain = [(f"v{i}", f"v{i+1}") for i in range(6)]  # v0..v6 depth up to 6
    edges = spark.createDataFrame(
        chain + [("x", "y"), ("y", "x")],  # 2-cycle garbage
        "child string, parent string",
    )
    got = {(r["node"], r["anc"]): r["depth"] for r in isa_closure(edges, max_depth=3).collect()}
    assert got[("v0", "v3")] == 3
    assert ("v0", "v4") not in got  # beyond cap
    # cycle: each sees the other at depth 1, never itself
    assert got[("x", "y")] == 1 and got[("y", "x")] == 1
    assert ("x", "x") not in got and ("y", "y") not in got
