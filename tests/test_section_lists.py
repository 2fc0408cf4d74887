"""Section-scoped list mining: nearest-preceding-heading association,
preamble NULL heading, per-page voting, zero-shuffle plan."""

from easyner_spark.operators.webtext import (
    list_memberships,
    section_lists,
)

PAGES = [
    (
        "u1",
        "<html><ul><li>orphan</li></ul>"
        "<h2>Languages</h2><p>x</p><ul><li>Python</li><li>rust</li></ul>"
        "<h3>Tools</h3><ol><li>spark</li><li></li></ol></html>",
    ),
    ("u2", "<html><h2>languages</h2><ul><li>python</li></ul></html>"),
    ("u3", "<html><p>no lists, no headings</p></html>"),
    # heading with no list, then a list under the NEXT heading only
    (
        "u4",
        "<html><h1>Empty Section</h1><p>t</p>"
        "<h2>Fruit</h2><ul><li>apple</li></ul></html>",
    ),
]


def test_sections(spark):
    pages = spark.createDataFrame(PAGES, ["url", "html"])
    rows = {
        (r.url, r.section_idx, r.heading, r.item_idx, r.item)
        for r in section_lists(pages).collect()
    }
    # preamble list: NULL heading, section 0
    assert ("u1", 0, None, 0, "orphan") in rows
    # lowercased heading + items, association with nearest heading
    assert ("u1", 1, "languages", 0, "python") in rows
    assert ("u1", 1, "languages", 1, "rust") in rows
    assert ("u1", 2, "tools", 0, "spark") in rows
    # empty <li> dropped
    assert not any(u == "u1" and i == "" for u, _, _, _, i in rows)
    # heading without list contributes nothing
    assert not any(h == "empty section" for _, _, h, _, _ in rows)
    assert ("u4", 2, "fruit", 0, "apple") in rows
    assert not any(u == "u3" for u, _, _, _, _ in rows)


def test_memberships(spark):
    pages = spark.createDataFrame(PAGES, ["url", "html"])
    out = {
        (r.topic, r.member): r.n_pages
        for r in list_memberships(section_lists(pages)).collect()
    }
    # u1 'Languages/Python' + u2 'languages/python' fold -> 2 pages
    assert out[("languages", "python")] == 2
    assert out[("languages", "rust")] == 1
    assert out[("tools", "spark")] == 1
    assert out[("fruit", "apple")] == 1
    # the NULL-heading orphan never becomes a membership
    assert not any(m == "orphan" for _, m in out)


def test_zero_shuffle_extract(spark):
    pages = spark.createDataFrame(PAGES, ["url", "html"])
    plan = (
        section_lists(pages)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
