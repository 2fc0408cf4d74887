"""Type-level quotient graph and metapath composition — hand-KG
expectations checked exactly (all integers/strings)."""

from easyner_spark.operators.triples import metapath_join, schema_graph


def _triples(spark, rows):
    return spark.createDataFrame(rows, ["subj", "pred", "obj"])


def _types(spark, rows):
    return spark.createDataFrame(rows, ["entity_id", "ent_type"])


def test_schema_graph_quotient(spark):
    t = _triples(
        spark,
        [
            ("p1", "works_for", "c1"),
            ("p2", "works_for", "c1"),
            ("p1", "works_for", "c2"),
            ("c1", "located_in", "city1"),
            ("p1", "knows", "zz"),  # zz untyped -> 'unknown'
        ],
    )
    ty = _types(
        spark,
        [
            ("p1", "person"),
            ("p2", "person"),
            ("c1", "org"),
            ("c2", "org"),
            ("city1", "place"),
        ],
    )
    out = {
        (r.subj_type, r.pred, r.obj_type): (r.n_edges, r.n_subj, r.n_obj)
        for r in schema_graph(t, ty).collect()
    }
    assert out[("person", "works_for", "org")] == (3, 2, 2)
    assert out[("org", "located_in", "place")] == (1, 1, 1)
    assert out[("person", "knows", "unknown")] == (1, 1, 1)
    assert len(out) == 3


def test_schema_graph_duplicate_edges_count(spark):
    # duplicate instance edges count toward n_edges but not distincts
    t = _triples(
        spark, [("a", "p", "b"), ("a", "p", "b"), ("a2", "p", "b")]
    )
    ty = _types(spark, [("a", "T"), ("a2", "T"), ("b", "U")])
    row = schema_graph(t, ty).collect()[0]
    assert (row.n_edges, row.n_subj, row.n_obj) == (3, 2, 1)


def test_metapath_join_two_hop(spark):
    t = _triples(
        spark,
        [
            ("p1", "works_for", "c1"),
            ("p1", "works_for", "c2"),
            ("p2", "works_for", "c1"),
            ("c1", "located_in", "city1"),
            ("c2", "located_in", "city1"),
            ("c1", "located_in", "city2"),
            # noise predicate must not leak in
            ("p1", "knows", "c1"),
            # duplicated extraction must not double-count
            ("p1", "works_for", "c1"),
        ],
    )
    out = {
        (r.src, r.dst): r.n_paths
        for r in metapath_join(t, ("works_for", "located_in")).collect()
    }
    # p1 -> city1 via c1 AND via c2 = 2 distinct instantiations
    assert out[("p1", "city1")] == 2
    assert out[("p1", "city2")] == 1
    assert out[("p2", "city1")] == 1
    assert out[("p2", "city2")] == 1
    assert len(out) == 4


def test_metapath_join_single_hop_is_distinct_edges(spark):
    t = _triples(
        spark, [("a", "p", "b"), ("a", "p", "b"), ("a", "q", "c")]
    )
    out = metapath_join(t, ("p",)).collect()
    assert [(r.src, r.dst, r.n_paths) for r in out] == [("a", "b", 1)]
