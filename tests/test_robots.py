"""robots_verdict / robots_filter: RFC 9309 longest-match semantics
pinned on a closed rule set."""

from easyner_spark.operators.webtext import robots_filter, robots_verdict

RULES = [
    ("a.com", "disallow", "/p"),
    ("a.com", "allow", "/p/open"),
    ("a.com", "allow", "/tie"),
    ("a.com", "disallow", "/tie"),
    ("b.org", "disallow", ""),
    ("c.net", "disallow", "/nope"),
]

PAGES = [
    ("https://a.com/p/x", "disallowed"),       # /p wins
    ("https://a.com/p/open/x", "allowed"),     # longer allow carve-out
    ("https://a.com/tie", "allowed"),          # length tie -> allow
    ("https://a.com/other", "allowed"),        # no prefix matches
    ("https://b.org/anything", "disallowed"),  # empty prefix blocks host
    ("https://b.org/", "disallowed"),
    ("https://c.net/fine", "allowed"),         # host rule matches nothing
    ("https://d.io/x", "allowed"),             # rule-less host
    ("https://A.COM:8080/p/y", "disallowed"),  # case/port-normalized host
]


def _frames(spark):
    pages = spark.createDataFrame([(u,) for u, _ in PAGES], "url string")
    rules = spark.createDataFrame(
        RULES, "host string, directive string, path_prefix string"
    )
    return pages, rules


def test_verdicts(spark):
    pages, rules = _frames(spark)
    got = {r["url"]: r for r in robots_verdict(pages, rules).collect()}
    for url, want in PAGES:
        assert got[url]["verdict"] == want, url
    # win_len carries the winning prefix length; -1 when nothing matched
    assert got["https://a.com/p/open/x"]["win_len"] == len("/p/open")
    assert got["https://a.com/p/x"]["win_len"] == len("/p")
    assert got["https://b.org/"]["win_len"] == 0
    assert got["https://a.com/other"]["win_len"] == -1
    assert got["https://d.io/x"]["win_len"] == -1
    # n_matched counts matching rules only (tie row matches both)
    assert got["https://a.com/tie"]["n_matched"] == 2
    assert got["https://c.net/fine"]["n_matched"] == 0


def test_filter_gate(spark):
    pages, rules = _frames(spark)
    kept = {r["url"] for r in robots_filter(pages, rules).collect()}
    assert kept == {u for u, v in PAGES if v == "allowed"}
    dropped = {
        r["url"] for r in robots_filter(pages, rules, keep_disallowed=True).collect()
    }
    assert dropped == {u for u, v in PAGES if v == "disallowed"}
