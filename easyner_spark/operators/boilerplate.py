"""Trafilatura-style boilerplate stripping: ``html: binary`` -> main
content text (north_star stage 1; no analog in the reference, which
starts from pre-extracted abstracts — scripts/text_loader.py:6-39 is
the closest: it trusts its input to already be clean text).

Determinism is the contract (BASELINE.md: extracted text must be
byte-identical per url on every run / cluster size), so the extractor
is a pinned, pure-Python DOM walk over the stdlib ``html.parser`` —
no statistical readability model, no version-fragile dependency:

  1. PRUNE subtrees that never carry main content (script/style/nav/
     header/footer/aside/form/head/...) — trafilatura's tag-exclusion
     pass;
  2. segment remaining text into BLOCKS at block-level element
     boundaries (p, h1-h6, li, td, pre, blockquote, div, br, ...);
  3. score each block by LINK DENSITY (chars inside <a> / total chars)
     and drop link-dominated blocks (menus, related-links rails) —
     trafilatura/jusText's link-density heuristic;
  4. join surviving blocks with a single newline. Downstream
     normalization (functions/text.normalize_text) collapses those to
     spaces, matching the reference's line-join semantics
     (scripts/text_loader.py:17).

Execution shape: a scalar Arrow pandas UDF (binary -> string) — a
narrow, shuffle-free projection that runs at scan parallelism. At
10^12 pages this stage is embarrassingly parallel; the only scale
knob is input split size (spark.sql.files.maxPartitionBytes), and the
UDF holds one Arrow batch, not one page, per GIL acquisition.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Subtrees dropped wholesale (tag-exclusion pass). `head` covers
# title/meta; template/svg/iframe never hold body prose.
PRUNE_TAGS = frozenset(
    """script style noscript template svg iframe head nav header footer
    aside form button select option datalist canvas audio video map
    object embed applet menu dialog""".split()
)

# Tags that terminate the current text block. Void tags (br, hr) flush
# on the start event; container tags flush on both start and end.
BLOCK_TAGS = frozenset(
    """p div h1 h2 h3 h4 h5 h6 li td th tr table ul ol dl dt dd pre
    blockquote article section main figure figcaption summary details
    address fieldset hr br body html""".split()
)

VOID_BLOCK_TAGS = frozenset({"br", "hr"})

# A block whose text is mostly anchor text is navigation, not content.
MAX_LINK_DENSITY = 0.66


class _MainContentParser(HTMLParser):
    """One-pass block segmentation with per-block anchor-char counts."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int]] = []  # (raw_text, anchor_chars)
        self._buf: list[str] = []
        self._anchor_chars = 0
        self._prune_depth = 0
        self._a_depth = 0

    def _flush(self) -> None:
        text = "".join(self._buf)
        if text.strip():
            self.blocks.append((text, self._anchor_chars))
        self._buf = []
        self._anchor_chars = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in PRUNE_TAGS:
            self._prune_depth += 1
            return
        if self._prune_depth:
            return
        if tag == "a":
            self._a_depth += 1
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in PRUNE_TAGS:
            # tolerate stray close tags in malformed markup
            self._prune_depth = max(0, self._prune_depth - 1)
            return
        if self._prune_depth:
            return
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        if tag in BLOCK_TAGS and tag not in VOID_BLOCK_TAGS:
            self._flush()

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)
        if tag not in VOID_BLOCK_TAGS:
            self.handle_endtag(tag)

    def handle_data(self, data: str) -> None:
        if self._prune_depth or not data:
            return
        self._buf.append(data)
        if self._a_depth:
            self._anchor_chars += len(data)

    def close(self) -> None:  # flush trailing text outside any block
        super().close()
        self._flush()


def extract_text_py(html: bytes | str | None, encoding: str = "utf-8") -> str:
    """bytes/str html -> extracted main-content text (pinned contract).

    Blocks joined by '\\n'; a page with no surviving block -> ''.
    Malformed markup never raises (HTMLParser is tolerant; decode uses
    errors='replace').
    """
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode(encoding, errors="replace")
    parser = _MainContentParser()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        # stdlib parser raising is vanishingly rare; a poisoned page
        # must not kill the partition — emit what was parsed so far.
        parser._flush()
    kept = []
    for text, anchor_chars in parser.blocks:
        stripped = text.strip()
        if not stripped:
            continue
        if anchor_chars / max(len(stripped), 1) > MAX_LINK_DENSITY:
            continue
        kept.append(stripped)
    return "\n".join(kept)


def _extract_series(html: pd.Series) -> pd.Series:
    return html.map(extract_text_py)


def extract_text(
    pages: DataFrame, html_col: str = "html", out_col: str = "extracted"
) -> DataFrame:
    """pages(url, ..., html: binary) -> + out_col string. Narrow
    projection, no shuffle; Arrow-batched. (UDF built lazily — pyspark
    resolves the DDL return type against the active session.)"""
    udf = pandas_udf(_extract_series, "string")
    return pages.withColumn(out_col, udf(F.col(html_col)))


def extraction_mismatches(
    pages: DataFrame, text_col: str = "text", html_col: str = "html"
) -> DataFrame:
    """Rows violating the byte-identity invariant (extracted != text).
    Empty result == contract holds. Used by tests and as a data-quality
    audit over real crawls (where `text` is the upstream extractor's
    output)."""
    ex = extract_text(pages, html_col=html_col, out_col="__extracted")
    return (
        ex.where(F.col("__extracted") != F.col(text_col))
        .select("url", F.col(text_col).alias("expected"), F.col("__extracted").alias("extracted"))
    )
