"""BreadcrumbList extraction + declared-taxonomy rollup: type gate,
document-order positions, adjacency (gap breaks the chain), distinct
-url voting, and lowercased edge rollup."""

import pytest

from easyner_spark.operators.webtext import (
    breadcrumb_edges,
    extract_breadcrumbs,
)


def _ld(payload: str) -> str:
    return (
        '<script type="application/ld+json">' + payload + "</script>"
    )


def _trail(names: list[str], positions: list[int] | None = None) -> str:
    positions = positions or list(range(1, len(names) + 1))
    items = ", ".join(
        '{"@type": "ListItem", "position": %d, "name": "%s"}' % (p, n)
        for p, n in zip(positions, names)
    )
    return _ld(
        '{"@context": "https://schema.org", "@type": "BreadcrumbList",'
        ' "itemListElement": [' + items + "]}"
    )


PAGES = [
    # two trails on one page; the second repeats the first's top edge
    (
        "u1",
        "<html>"
        + _trail(["Home", "Science", "Biology"])
        + _trail(["Home", "Science"])
        + "</html>",
    ),
    # an Article block must NOT be mistaken for a trail
    (
        "u2",
        "<html>"
        + _ld('{"@type": "Article", "name": "not a trail"}')
        + _trail(["Home", "News"])
        + "</html>",
    ),
    # a positions gap (1 then 3) breaks the chain at the gap
    ("u3", "<html>" + _trail(["Home", "Gap"], [1, 3]) + "</html>"),
    ("u4", "<html><p>no structured data at all</p></html>"),
    # same top edge as u1, different case -> folds in the rollup
    ("u5", "<html>" + _trail(["HOME", "SCIENCE"]) + "</html>"),
]


@pytest.fixture(scope="module")
def crumbs(spark):
    pages = spark.createDataFrame(PAGES, ["url", "html"])
    return extract_breadcrumbs(pages)


def test_extract_rows(crumbs):
    rows = {
        (r.url, r.block_idx, r.position, r.name) for r in crumbs.collect()
    }
    assert ("u1", 0, 1, "Home") in rows
    assert ("u1", 0, 3, "Biology") in rows
    assert ("u1", 1, 2, "Science") in rows  # second trail, own block
    # u2: Article block skipped, trail is block_idx 1
    assert ("u2", 1, 2, "News") in rows
    assert not any(u == "u2" and n == "not a trail" for u, _, _, n in rows)
    assert ("u3", 0, 3, "Gap") in rows  # extracted with its gap intact
    assert not any(u == "u4" for u, _, _, _ in rows)


def test_edges(crumbs):
    edges = {
        (r.parent, r.child): r.n_pages
        for r in breadcrumb_edges(crumbs).collect()
    }
    # u1 (two blocks -> one vote) + u5 (case-folded) = 2 pages
    assert edges[("home", "science")] == 2
    assert edges[("science", "biology")] == 1
    assert edges[("home", "news")] == 1
    # the u3 gap produced NO edge
    assert ("home", "gap") not in edges
    assert set(edges) == {
        ("home", "science"),
        ("science", "biology"),
        ("home", "news"),
    }


def test_min_pages_gate(crumbs):
    edges = {
        (r.parent, r.child)
        for r in breadcrumb_edges(crumbs, min_pages=2).collect()
    }
    assert edges == {("home", "science")}
