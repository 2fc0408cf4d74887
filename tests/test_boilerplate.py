"""Trafilatura-style boilerplate stripping (operators/boilerplate):
the north-star byte-identity invariant — extract(html) == text per url
— plus pure-Python extraction semantics on messy markup, plus the
fast-scanner <-> stdlib-twin byte-parity fuzz contract."""

import random

from pyspark.sql import functions as F

from easyner_spark.operators.boilerplate import (
    extract_text,
    extract_text_py,
    extract_text_py_stdlib,
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


# Adversarial construct corpus: every stdlib-parser edge the fast
# scanner either handles inline or must route to its stdlib fallback —
# CDATA (script/style) with fake inner tags and uppercase close tags,
# unterminated comments/scripts/tags at EOF, XHTML self-closing,
# the `<a href=x/>` bare-value-eats-slash quirk, quoted '>' inside
# attributes, bogus comments, charref edge forms, junk start tags.
NASTY = [
    '<script>var a = "<div>fake</div>";</script>', "<SCRIPT>x<b></SCRIPT>",
    "<style>.x{}</style>", "<script>unterminated", "<!-- comment <p>fake</p> -->",
    "<!-- unterminated", "<!DOCTYPE html>", "<![CDATA[ <p>x</p> ]]>", "</>",
    '<a href="x>y">q</a>', "<a href='1'y>t</a>", "<a href=x/>z</a>", "<br/>",
    "<br />", "<p/>", '<img src=a.png alt="b">',
    "&amp; &lt; &#65; &#x41; &notaref &amp", "a < b", "<", "<a", "<a ", "<a x=",
    "<?php echo 1 ?>", "<? pi", "<! decl >", "<!bogus", '<a "junk>', "<a =v>",
    "<a x=1, y=2>", "<p \x00weird>", "<1abc>", "< a>", "</ p>", "</p >",
    '</p attr=">">', "<p>text", "text&", "tail&amp", '<A HREF="X">CAP</A>',
    "<DIV>updown</div>", '<script src="x"/>after',
    "<noscript><p>ns</p></noscript>", "<nav><a href=1>l</a></nav>",
    "<td>cell</td>", "<li>item<li>item2", "<em>inline</em>", "&#invalid;",
    "&#;", "&;", "<p>&euro;100</p>", "<p>café &eacute;</p>",
    '<style>@import "a.css"; /* </style */ x</style>',
]

WORDS = ["alpha", "beta", "gamma", "text", "word", "entity", "&amp;",
         "&lt;x&gt;", "ünïcode", "汉字"]
TAGS = ["p", "div", "span", "a", "li", "ul", "td", "h1", "br", "hr", "script",
        "style", "nav", "em", "b", "table", "tr", "footer", "header",
        "section", "article", "figure", "main", "aside", "form", "button"]


def _fuzz_page(rng: random.Random, n: int = 80) -> str:
    parts = []
    for _ in range(n):
        r = rng.random()
        if r < 0.25:
            parts.append(rng.choice(NASTY))
        elif r < 0.45:
            t = rng.choice(TAGS)
            if rng.random() < 0.3:
                parts.append(
                    f"<{t} class=\"c{rng.randint(0, 9)}\" "
                    f"data-x='{rng.randint(0, 99)}' id=i{rng.randint(0, 9)}>"
                )
            else:
                parts.append(f"<{t}>")
        elif r < 0.6:
            parts.append(f"</{rng.choice(TAGS)}>")
        else:
            parts.append(" ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 8))))
    s = "".join(parts)
    if rng.random() < 0.2:
        s = s[: rng.randint(0, len(s))]  # truncate mid-construct
    return s


class TestFastScannerParity:
    """extract_text_py (fast one-shot scanner) must be byte-identical
    to extract_text_py_stdlib (the pinned HTMLParser reference) on
    every input — the determinism contract transfers to the fast path
    only through this equivalence."""

    def test_nasty_corpus_parity(self):
        for page in NASTY:
            assert extract_text_py(page) == extract_text_py_stdlib(page), repr(page)

    def test_fuzz_parity(self):
        rng = random.Random(20260819)
        for _ in range(4000):
            page = _fuzz_page(rng)
            assert extract_text_py(page) == extract_text_py_stdlib(page), repr(
                page[:400]
            )

    def test_fixture_corpus_parity(self):
        from easyner_spark.fixtures import generate

        fx = generate(n_docs=300, with_gold=False)
        for h in fx.pages["html"]:
            assert extract_text_py(h) == extract_text_py_stdlib(h)


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
