"""Round-5 plan + semantics contracts: SPARQL FILTER predicates in
match_patterns must reach the parquet scan (PushedFilters), and the
filter surface must validate its inputs."""

import pytest
from pyspark.sql import functions as F

from easyner_spark.operators.triples import match_patterns


def _final_plan(df):
    df.collect()  # materialize so the AQE plan is final
    return df._jdf.queryExecution().executedPlan().toString()


def _kg(spark, n=400):
    return spark.range(n).select(
        F.concat(F.lit("e"), (F.col("id") % 37).cast("string")).alias("subj"),
        F.concat(F.lit("p"), (F.col("id") % 5).cast("string")).alias("pred"),
        F.concat(F.lit("e"), ((F.col("id") * 7) % 37).cast("string")).alias("obj"),
    )


@pytest.fixture()
def parquet_kg(spark, tmp_path):
    path = str(tmp_path / "kg_edges.parquet")
    _kg(spark).write.parquet(path)
    return spark.read.parquet(path)


def test_bgp_filters_push_to_scan(spark, parquet_kg):
    """FILTER predicates are applied inside the pattern frames, so
    range / prefix / contains filters fold into PushedFilters on a
    parquet-backed KG — pattern-local seed-cardinality cuts, not a
    post-join trim (VERDICT r4 #4 done-bar)."""
    out = match_patterns(
        parquet_kg,
        [("?x", "p1", "?y"), ("?y", "p2", "?z")],
        subj="subj",
        pred="pred",
        obj="obj",
        filters={
            "x": [(">=", "e1"), ("prefix", "e")],
            "z": [("contains", "2")],
        },
    )
    # the default 100-char metadata cap truncates PushedFilters lists
    prev = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        plan = _final_plan(out)
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    assert "GreaterThanOrEqual(subj,e1)" in plan
    assert "StringStartsWith(subj,e)" in plan
    assert "StringContains(obj,2)" in plan


def test_bgp_filter_semantics_match_post_hoc_where(spark):
    """Scan-level filter application must equal filtering the
    unfiltered BGP result post-hoc (equi-joined occurrences make the
    two formulations bag-equivalent) — including a regex op, which
    stays at the projection rather than the scan."""
    kg = _kg(spark)
    pats = [("?x", "p1", "?y"), ("?y", "p2", "?z")]
    kw = dict(subj="subj", pred="pred", obj="obj")
    filtered = match_patterns(
        kg, pats, **kw,
        filters={"y": [(">", "e1"), ("regex", "[02468]$")]},
    )
    post = (
        match_patterns(kg, pats, **kw)
        .where((F.col("y") > "e1") & F.col("y").rlike("[02468]$"))
    )
    a = sorted(map(tuple, filtered.collect()))
    b = sorted(map(tuple, post.collect()))
    assert a == b and len(a) > 0


def test_bgp_filters_apply_to_union_alternates(spark):
    """Filters restrict every UNION alternate, not just the first
    required block (the SPARQL algebra applies FILTER to the whole
    group pattern)."""
    kg = _kg(spark)
    kw = dict(subj="subj", pred="pred", obj="obj")
    out = match_patterns(
        kg,
        [("?x", "p1", "?y")],
        **kw,
        unions=[[("?x", "p2", "?y")]],
        filters={"x": [("=", "e1")]},
    )
    assert out.where(F.col("x") != "e1").count() == 0
    assert out.count() > 0


def test_bgp_filter_validation(spark):
    kg = _kg(spark)
    kw = dict(subj="subj", pred="pred", obj="obj")
    with pytest.raises(ValueError, match="not bound"):
        match_patterns(
            kg, [("?x", "p1", "?y")], **kw, filters={"q": [("=", "e1")]}
        )
    with pytest.raises(ValueError, match="unknown filter op"):
        match_patterns(
            kg, [("?x", "p1", "?y")], **kw, filters={"x": [("~", "e1")]}
        )
    with pytest.raises(ValueError, match="empty"):
        match_patterns(kg, [("?x", "p1", "?y")], **kw, filters={"x": []})
    with pytest.raises(ValueError, match="must be a string"):
        match_patterns(
            kg, [("?x", "p1", "?y")], **kw, filters={"x": [(">", 3)]}
        )


def test_kg_paths_frontier_guard_fires_on_dense_graph(spark):
    """VERDICT r4 #6 done-bar: a hub-dense graph must hit the
    max_frontier_rows backstop instead of silently enumerating an
    exponential path set; a sane cap on the same graph still returns."""
    from easyner_spark.operators.graph import kg_paths

    # complete-ish digraph on 12 nodes: path count explodes by hop 3
    dense = spark.range(12).alias("a").crossJoin(
        spark.range(12).alias("b")
    ).select(
        F.concat(F.lit("n"), F.col("a.id").cast("string")).alias("src"),
        F.concat(F.lit("n"), F.col("b.id").cast("string")).alias("dst"),
    )
    with pytest.raises(ValueError, match="frontier exploded"):
        kg_paths(
            dense, sources=("n0",), targets=("n1",), max_len=4,
            max_frontier_rows=100,
        ).collect()
    ok = kg_paths(
        dense, sources=("n0",), targets=("n1",), max_len=2,
        max_frontier_rows=10_000,
    )
    assert ok.count() > 0


def test_property_path_closure_guard_fires_on_dense_predicate(spark):
    """Same backstop for match_patterns' '+' closure: a dense
    predicate raises with the predicate name; a hierarchy-shaped
    chain under the same cap completes."""
    # chain + skip links: the closure keeps ADDING ~2n new pairs per
    # BFS round (a complete graph would converge in one round and
    # never trip the guard — the growth, not the density, is what the
    # backstop watches)
    n = 300
    chain1 = spark.range(n - 1).select(
        F.concat(F.lit("e"), F.col("id").cast("string")).alias("subj"),
        F.lit("follows").alias("pred"),
        F.concat(F.lit("e"), (F.col("id") + 1).cast("string")).alias("obj"),
    )
    chain2 = spark.range(n - 2).select(
        F.concat(F.lit("e"), F.col("id").cast("string")).alias("subj"),
        F.lit("follows").alias("pred"),
        F.concat(F.lit("e"), (F.col("id") + 2).cast("string")).alias("obj"),
    )
    dense = chain1.unionByName(chain2)
    with pytest.raises(ValueError, match="follows.*exploded|exploded.*follows"):
        match_patterns(
            dense,
            [("?x", "follows+", "?y")],
            subj="subj", pred="pred", obj="obj",
            max_frontier_rows=300,
        ).collect()
    chain = spark.range(20).select(
        F.concat(F.lit("e"), F.col("id").cast("string")).alias("subj"),
        F.lit("under").alias("pred"),
        F.concat(F.lit("e"), (F.col("id") + 1).cast("string")).alias("obj"),
    )
    out = match_patterns(
        chain,
        [("?x", "under+", "?y")],
        subj="subj", pred="pred", obj="obj",
        max_closure_depth=5,
        max_frontier_rows=10_000,
    )
    assert out.count() > 0


def test_bgp_aggregation_shapes(spark):
    """SPARQL aggregation core (r5): GROUP BY rollup, default COUNT,
    global one-row aggregate, and validation."""
    kg = _kg(spark)
    kw = dict(subj="subj", pred="pred", obj="obj")
    pats = [("?x", "p1", "?y")]
    base = match_patterns(kg, pats, **kw)
    n_total = base.count()
    # group_by with explicit aggregates
    rolled = match_patterns(
        kg, pats, **kw,
        group_by=["x"],
        aggregates={"n": ("count", "*"), "hi": ("max", "y"),
                    "ys": ("count_distinct", "y")},
    ).collect()
    assert sum(r.n for r in rolled) == n_total
    manual = base.groupBy("x").count().collect()
    assert {(r.x, r.n) for r in rolled} == {(r.x, r["count"]) for r in manual}
    for r in rolled:
        assert r.hi >= "e" and 1 <= r.ys <= r.n
    # bare group_by defaults to {"n": ("count", "*")}
    dflt = match_patterns(kg, pats, **kw, group_by=["x"])
    assert set(dflt.columns) == {"x", "n"}
    # empty group_by = SPARQL global aggregate (one row)
    glob = match_patterns(
        kg, pats, **kw, aggregates={"n": ("count", "*")}
    ).collect()
    assert len(glob) == 1 and glob[0].n == n_total
    with pytest.raises(ValueError, match="not an output variable"):
        match_patterns(kg, pats, **kw, group_by=["z"])
    with pytest.raises(ValueError, match="unknown aggregate fn"):
        match_patterns(kg, pats, **kw, group_by=["x"],
                       aggregates={"s": ("sum", "y")})
    with pytest.raises(ValueError, match="only valid with count"):
        match_patterns(kg, pats, **kw, group_by=["x"],
                       aggregates={"m": ("min", "*")})
    with pytest.raises(ValueError, match="collides"):
        match_patterns(kg, pats, **kw, group_by=["x"],
                       aggregates={"x": ("count", "*")})


def test_bgp_topk_plan_and_semantics(spark):
    """ORDER BY/LIMIT (r5): plans TakeOrderedAndProject (per-partition
    top-k, no global sort of the solution bag), the surviving-k set is
    deterministic under the total-order tie-break, and the pairing
    contract validates."""
    kg = _kg(spark)
    kw = dict(subj="subj", pred="pred", obj="obj")
    pats = [("?x", "p1", "?y")]
    top = match_patterns(
        kg, pats, **kw,
        group_by=["x"], aggregates={"n": ("count", "*")},
        order_by=[("n", "desc")], limit=5,
    )
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = top.collect()
    assert len(rows) == 5
    # deterministic: equal to the manual total-order top-5
    manual = sorted(
        match_patterns(kg, pats, **kw, group_by=["x"]).collect(),
        key=lambda r: (-r.n, r.x),
    )[:5]
    assert [(r.x, r.n) for r in rows] == [(r.x, r.n) for r in manual]
    with pytest.raises(ValueError, match="together"):
        match_patterns(kg, pats, **kw, order_by=[("x", "asc")])
    with pytest.raises(ValueError, match="together"):
        match_patterns(kg, pats, **kw, limit=5)
    with pytest.raises(ValueError, match="not an output column"):
        match_patterns(
            kg, pats, **kw, order_by=[("q", "asc")], limit=5
        )
    with pytest.raises(ValueError, match="asc|desc"):
        match_patterns(
            kg, pats, **kw, order_by=[("x", "up")], limit=5
        )
