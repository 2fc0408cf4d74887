"""robots_verdict / robots_filter: RFC 9309 longest-match semantics
pinned on a closed rule set."""

from pyspark.sql import functions as F

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


def test_parse_robots(spark):
    from easyner_spark.operators.webtext import parse_robots

    body = "\n".join(
        [
            "# top comment",
            "User-agent: Googlebot",
            "Disallow: /g-only",
            "User-agent: *",
            "disallow: /a   # trailing comment",
            "ALLOW: /a/ok",
            "Crawl-delay: 5",
            "Disallow:",            # empty -> RFC no-op, dropped
            "not a directive line",
            "User-agent: OtherBot",
            "Disallow: /other",     # governed by OtherBot -> dropped
        ]
    )
    df = spark.createDataFrame(
        [("https://A.com:8080/robots.txt", body)],
        "url string, robots_txt string",
    )
    got = {
        (r["directive"], r["value"]) for r in parse_robots(df).collect()
    }
    assert got == {
        ("disallow", "/a"),
        ("allow", "/a/ok"),
        ("crawl_delay", "5"),
    }
    hosts = {r["host"] for r in parse_robots(df).collect()}
    assert hosts == {"a.com"}  # lowered, port-stripped


def test_parse_feeds_verdict(spark):
    """End-to-end politeness chain: raw text -> rules -> verdict."""
    from easyner_spark.operators.webtext import parse_robots, robots_verdict

    df = spark.createDataFrame(
        [
            (
                "https://a.com/robots.txt",
                "User-agent: *\nDisallow: /p\nAllow: /p/open",
            )
        ],
        "url string, robots_txt string",
    )
    rules = parse_robots(df).select(
        "host", "directive", F.col("value").alias("path_prefix")
    ).where(F.col("directive").isin("allow", "disallow"))
    pages = spark.createDataFrame(
        [("https://a.com/p/x",), ("https://a.com/p/open/y",)], "url string"
    )
    got = {r["url"]: r["verdict"] for r in robots_verdict(pages, rules).collect()}
    assert got == {
        "https://a.com/p/x": "disallowed",
        "https://a.com/p/open/y": "allowed",
    }
