"""Microdata pulls, HTML-entity normalization, k-bounded SCC labels."""

import pyspark.sql.functions as F

from easyner_spark.operators.graph import bounded_scc
from easyner_spark.operators.webtext import extract_microdata, html_unescape


def test_extract_microdata(spark):
    pages = spark.createDataFrame(
        [
            (
                "u1",
                '<div itemscope itemtype="https://schema.org/Person">'
                '<span itemprop="name" content="Ada">Ada</span>'
                '<meta itemprop="jobTitle" content="Engineer">'
                "</div>",
            ),
            ("u2", '<b itemprop="name">no scope, no content attr</b>'),
            ("u3", "<p>nothing</p>"),
        ],
        ["url", "html"],
    )
    rows = {
        (r.url, r.prop_idx): (r.item_type, r.prop, r.content)
        for r in extract_microdata(pages).collect()
    }
    assert rows[("u1", 0)] == ("https://schema.org/person", "name", "ada")
    assert rows[("u1", 1)] == (
        "https://schema.org/person", "jobtitle", "engineer",
    )
    # scope-less itemprop still emits, with empty type and content
    assert rows[("u2", 0)] == ("", "name", "")
    assert not any(u == "u3" for u, _ in rows)


def test_html_unescape(spark):
    df = spark.createDataFrame(
        [("AT&amp;T says &quot;5 &lt; 6&quot; &#39;ok&#x27;&nbsp;&amp;lt;",)],
        ["t"],
    )
    out = df.select(html_unescape("t").alias("u")).collect()[0].u
    # &amp; decoded last: double-encoded &amp;lt; becomes &lt;, not <
    assert out == "AT&T says \"5 < 6\" 'ok' &lt;"


def test_html_unescape_stays_in_codegen(spark):
    df = spark.createDataFrame([("x&amp;y",)], ["t"])
    plan = (
        df.select(html_unescape("t").alias("u"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_bounded_scc_cycle_and_tail(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")], ["src", "dst"]
    )
    out = {r.node: r.scc_label for r in bounded_scc(e, k=3).collect()}
    assert out == {"a": "a", "b": "a", "c": "a", "d": "d"}


def test_bounded_scc_k_bound_splits_long_cycles(spark):
    # a 4-cycle under k=2: only OPPOSITE corners close both ways
    # (a->c and c->a are 2 hops each; a->b back needs 3) — the bound
    # splits the 4-cycle into the two diagonal pairs
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")], ["src", "dst"]
    )
    out2 = {r.node: r.scc_label for r in bounded_scc(e, k=2).collect()}
    assert out2 == {"a": "a", "c": "a", "b": "b", "d": "b"}
    out3 = {r.node: r.scc_label for r in bounded_scc(e, k=3).collect()}
    assert set(out3.values()) == {"a"}


def test_bounded_scc_reciprocal_pair(spark):
    e = spark.createDataFrame(
        [("x", "y"), ("y", "x"), ("y", "z")], ["src", "dst"]
    )
    out = {r.node: r.scc_label for r in bounded_scc(e, k=1).collect()}
    assert out == {"x": "x", "y": "x", "z": "z"}
