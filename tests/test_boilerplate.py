"""Trafilatura-style boilerplate stripping (operators/boilerplate):
the north-star byte-identity invariant — extract(html) == text per url
— plus pure-Python extraction semantics on messy markup."""

from pyspark.sql import functions as F

from easyner_spark.operators.boilerplate import (
    extract_text,
    extract_text_py,
    extraction_mismatches,
)


class TestExtractPy:
    def test_strips_script_style_nav(self):
        html = (
            "<html><head><title>T</title><style>p{}</style></head>"
            "<body><nav>home | about</nav><p>Main content here.</p>"
            "<script>var x=1;</script><footer>(c) 2026</footer></body></html>"
        )
        assert extract_text_py(html) == "Main content here."

    def test_link_dense_block_dropped(self):
        html = (
            "<body><div><a href='/a'>one</a> <a href='/b'>two</a> "
            "<a href='/c'>three</a></div><p>Real prose survives.</p></body>"
        )
        assert extract_text_py(html) == "Real prose survives."

    def test_inline_links_in_prose_kept(self):
        html = "<p>See the <a href='/x'>full report</a> for details on all findings.</p>"
        assert extract_text_py(html) == "See the full report for details on all findings."

    def test_blocks_joined_with_newline(self):
        html = "<h1>Title</h1><p>Para one.</p><p>Para two.</p>"
        assert extract_text_py(html) == "Title\nPara one.\nPara two."

    def test_list_and_table_cells(self):
        html = "<ul><li>alpha</li><li>beta</li></ul><table><tr><td>c1</td><td>c2</td></tr></table>"
        assert extract_text_py(html) == "alpha\nbeta\nc1\nc2"

    def test_entities_decoded(self):
        assert extract_text_py("<p>a &amp; b &lt; c &#8212; d</p>") == "a & b < c — d"

    def test_br_splits_block(self):
        assert extract_text_py("<p>line one<br>line two</p>") == "line one\nline two"

    def test_malformed_and_edge_inputs(self):
        assert extract_text_py("<p>unclosed <b>bold") == "unclosed bold"
        assert extract_text_py("") == ""
        assert extract_text_py(None) == ""
        assert extract_text_py(b"<p>from \xff bytes</p>") == "from � bytes"
        # stray close tag of a pruned tag must not swallow content
        assert extract_text_py("</head><p>ok</p>") == "ok"

    def test_internal_whitespace_preserved(self):
        # only block-edge whitespace is trimmed; interior bytes are kept
        # verbatim (the byte-identity contract depends on this)
        assert extract_text_py("<p>a\n\nb c</p>") == "a\n\nb c"

    def test_nested_prune_with_inner_content_tags(self):
        html = "<nav><ul><li>home</li><li>about</li></ul></nav><p>kept</p>"
        assert extract_text_py(html) == "kept"


class TestSparkByteIdentity:
    def test_fixture_pages_byte_identical(self, spark, pages_df):
        """BASELINE.md gate: extracted text == pages.text for every url,
        every language, including docs with embedded newline runs."""
        bad = extraction_mismatches(pages_df)
        rows = bad.limit(5).collect()
        assert rows == [], rows

    def test_extract_plan_is_narrow(self, spark, pages_df):
        plan = extract_text(pages_df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # shuffle-free projection

    def test_extract_column_value(self, spark):
        df = spark.createDataFrame(
            [("u1", bytearray(b"<body><nav>x|y|z</nav><p>hello world.</p></body>"))],
            "url string, html binary",
        )
        out = extract_text(df).select("extracted").collect()
        assert out[0][0] == "hello world."
