"""robots.txt table derivation + HTML text extraction fallback."""

from urllib.robotparser import RobotFileParser

from courlan_spark.functions.html_text import html_to_text, make_html_text_udf
from courlan_spark.operators.robots import parse_robots_body, robots_tables

ROBOTS_BODY = """
# comment
User-agent: googlebot
Disallow: /google-only/

User-agent: *
Allow: /private/public-part/
Disallow: /private/
Disallow: /tmp/
Crawl-delay: 4

User-agent: badbot
Disallow: /
"""


def test_parse_robots_matches_stdlib():
    from courlan_spark.operators.robots import can_fetch

    rules, delay = parse_robots_body(ROBOTS_BODY)
    assert rules == [
        ("/private/public-part/", True),
        ("/private/", False),
        ("/tmp/", False),
    ]
    assert delay == 4.0

    rp = RobotFileParser()
    rp.parse(ROBOTS_BODY.splitlines())
    for path in [
        "/private/x",
        "/private/public-part/y",   # Allow overrides the broader Disallow
        "/tmp/y",
        "/public/z",
        "/google-only/q",           # not for '*'
        "/",
    ]:
        url = "https://example.org" + path
        assert can_fetch(rules, path) is rp.can_fetch("*", url), path
    assert rp.crawl_delay("*") == 4


def test_parse_robots_empty_disallow_allows_all():
    body = "User-agent: *\nDisallow:\n"
    rules, _ = parse_robots_body(body)
    rp = RobotFileParser()
    rp.parse(body.splitlines())
    from courlan_spark.operators.robots import can_fetch

    for path in ["/", "/anything/x"]:
        assert can_fetch(rules, path) is rp.can_fetch("*", "https://e.org" + path)


def test_robots_tables_and_link_filtering(spark):
    robots = spark.createDataFrame(
        [
            ("https://example.org", ROBOTS_BODY),
            ("https://open.org", "User-agent: *\nDisallow:\n"),
        ],
        "host string, body string",
    )
    rules, delays = robots_tables(robots)
    collected = {r["host"]: [tuple(x) for x in r["rules"]] for r in rules.collect()}
    assert collected == {
        "https://example.org": [
            ("/private/public-part/", True),
            ("/private/", False),
            ("/tmp/", False),
        ],
        "https://open.org": [("", True)],
    }
    assert [tuple(r) for r in delays.collect()] == [("https://example.org", 4.0)]

    # feed into the crawl filter: disallowed links drop, Allow carve-out
    # survives, rule-less hosts survive
    from courlan_spark.operators.links import crawlable_links

    links = spark.createDataFrame(
        [
            ("https://example.org/private/secret",),
            ("https://example.org/private/public-part/ok",),
            ("https://example.org/public/page",),
            ("https://open.org/anything",),
            ("https://norules.org/x",),
        ],
        "link string",
    )
    filtered = crawlable_links(links, robots_rules=rules)
    kept = {r["link"] for r in filtered.collect()}
    assert kept == {
        "https://example.org/private/public-part/ok",
        "https://example.org/public/page",
        "https://open.org/anything",
        "https://norules.org/x",
    }
    # plan shape: a broadcast HASH join on the host key, not a
    # nested-loop prefix join over every rule
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_robots_refetch_duplicates_do_not_fan_out_links(spark):
    """Duplicate host rows in the robots input (re-fetches of the same
    robots.txt) must not multiply link rows through the host equi-join
    (round-3 ADVICE fix: rules side dedups per host like delays)."""
    from courlan_spark.operators.links import crawlable_links

    robots = spark.createDataFrame(
        [("https://example.org", ROBOTS_BODY)] * 3
        + [("https://example.org", ROBOTS_BODY + "\nCrawl-delay: 4\n")],
        "host string, body string",
    )
    rules, delays = robots_tables(robots)
    assert rules.count() == 1
    assert delays.count() == 1
    links = spark.createDataFrame(
        [("https://example.org/public/page",), ("https://other.org/x",)],
        "link string",
    )
    filtered = crawlable_links(links, robots_rules=rules)
    assert [r["link"] for r in filtered.orderBy("link").collect()] == [
        "https://example.org/public/page",
        "https://other.org/x",
    ]


def test_html_to_text():
    html = (
        "<html><head><style>p{color:red}</style><script>var x=1;</script></head>"
        "<body><h1>Title</h1><p>First &amp; second.</p><!-- hidden -->"
        "<div>Block <b>bold</b></div></body></html>"
    )
    text = html_to_text(html)
    assert "Title" in text and "First & second." in text and "Block bold" in text
    assert "color:red" not in text and "var x" not in text and "hidden" not in text


def test_html_text_udf(spark):
    df = spark.createDataFrame(
        [(b"<html><p>Hello &amp; bye</p></html>",), (None,)], "html binary"
    )
    udf = make_html_text_udf()
    rows = df.select(udf("html").alias("text")).collect()
    assert rows[0]["text"] == "Hello & bye"
    assert rows[1]["text"] == ""


def test_robots_refetch_conflicting_bodies_pick_deterministic_survivor(spark):
    """Re-fetches of a host's robots.txt that parsed to DIFFERENT rule
    lists must yield the same verdict on every run: the survivor is
    max(body) per host, not whichever row dropDuplicates kept
    (round-4 ADVICE fix)."""
    body_a = "User-agent: *\nDisallow: /private/\n"
    body_b = "User-agent: *\nDisallow: /blocked/\n"
    expected_body = max(body_a, body_b)
    for order in ([body_a, body_b], [body_b, body_a]):
        robots = spark.createDataFrame(
            [("https://example.org", b) for b in order],
            "host string, body string",
        )
        rules, _ = robots_tables(robots)
        rows = rules.collect()
        assert len(rows) == 1
        prefixes = [r["prefix"] for r in rows[0]["rules"]]
        expected_prefix = (
            "/private/" if expected_body == body_a else "/blocked/"
        )
        assert prefixes == [expected_prefix]
