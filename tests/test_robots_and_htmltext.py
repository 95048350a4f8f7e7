"""robots.txt table derivation + HTML text extraction fallback."""

from urllib.robotparser import RobotFileParser

from courlan_spark.functions.html_text import html_to_text, make_html_text_udf
from courlan_spark.operators.robots import parse_robots_body, robots_tables

ROBOTS_BODY = """
# comment
User-agent: googlebot
Disallow: /google-only/

User-agent: *
Disallow: /private/
Disallow: /tmp/
Crawl-delay: 4

User-agent: badbot
Disallow: /
"""


def test_parse_robots_matches_stdlib():
    prefixes, delay = parse_robots_body(ROBOTS_BODY)
    assert prefixes == ["/private/", "/tmp/"]
    assert delay == 4.0

    rp = RobotFileParser()
    rp.parse(ROBOTS_BODY.splitlines())
    for path, expected in [
        ("/private/x", False),
        ("/tmp/y", False),
        ("/public/z", True),
        ("/google-only/q", True),  # not for '*'
    ]:
        url = "https://example.org" + path
        assert rp.can_fetch("*", url) is expected
        blocked = any(path.startswith(p) for p in prefixes)
        assert blocked is (not expected)
    assert rp.crawl_delay("*") == 4


def test_robots_tables_and_link_filtering(spark):
    robots = spark.createDataFrame(
        [
            ("https://example.org", ROBOTS_BODY),
            ("https://open.org", "User-agent: *\nDisallow:\n"),
        ],
        "host string, body string",
    )
    disallows, delays = robots_tables(robots)
    assert sorted(map(tuple, disallows.collect())) == [
        ("https://example.org", "/private/"),
        ("https://example.org", "/tmp/"),
    ]
    assert [tuple(r) for r in delays.collect()] == [("https://example.org", 4.0)]

    # feed into the crawl filter: disallowed links drop
    from courlan_spark.operators.links import crawlable_links

    links = spark.createDataFrame(
        [
            ("https://example.org/private/secret",),
            ("https://example.org/public/page",),
            ("https://open.org/anything",),
        ],
        "link string",
    )
    kept = {r["link"] for r in crawlable_links(links, disallowed_prefixes=disallows).collect()}
    assert kept == {"https://example.org/public/page", "https://open.org/anything"}


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
