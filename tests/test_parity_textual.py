"""Byte-identity goldens for scrub/clean/normalize.

Golden pairs lifted from the reference suite
(/root/reference/tests/unit_tests.py:156-230 scrub/clean, :518-588
normalization, :590-622 query elements, :1353-1378 README examples).
"""

import pytest

from courlan_spark.urlkit import clean_url, normalize_url, scrub_url

SCRUB_GOLDENS = [
    ("  https://www.dwds.de", "https://www.dwds.de"),
    ("<![CDATA[https://www.dwds.de]]>", "https://www.dwds.de"),
    (
        "https://www.dwds.de/test?param=test&amp;other=test",
        "https://www.dwds.de/test?param=test&other=test",
    ),
    (
        "https://www.dwds.de/garbledhttps://www.dwds.de/",
        "https://www.dwds.de/garbled",
    ),
    ("https://g__https://www.dwds.de/", "https://www.dwds.de"),
    ("https://g__https://h__", "https://g__https://h__"),
    (
        "https://web.archive.org/web/20131021165347/https://www.imdb.com/",
        "https://web.archive.org/web/20131021165347/https://www.imdb.com",
    ),
    (
        "https://twitter.com/share?&text=Le%20sabre%20de%20bambou%20%232&via=NouvellesJapon&url=https://nouvellesdujapon.com/le-sabre-de-bambou-2",
        "https://nouvellesdujapon.com/le-sabre-de-bambou-2",
    ),
    (
        "https://www.facebook.com/sharer.php?u=https://nouvellesdujapon.com/le-sabre-de-bambou-2",
        "https://nouvellesdujapon.com/le-sabre-de-bambou-2",
    ),
    ("https://www.test.com/&", "https://www.test.com"),
    ("\x19https://www.test.com/\x06", "https://www.test.com"),
    ("https://www.test.com/</a>", "https://www.test.com"),
    ("https://www.test.com/1</div>", "https://www.test.com/1"),
    ("https://www.test.com/{user_name}", "https://www.test.com"),
    ('https://www.test.com/"' + "<p></p>" * 100, "https://www.test.com"),
    ('https://www.test.com/"' * 50, "https://www.test.com"),
    (
        "https://www.test.com/" + "abcdefg" * 100,
        "https://www.test.com/" + "abcdefg" * 100,
    ),
]


@pytest.mark.parametrize("raw,expected", SCRUB_GOLDENS)
def test_scrub_goldens(raw, expected):
    assert scrub_url(raw) == expected


CLEAN_GOLDENS = [
    ("ø\xaa", "%C3%B8%C2%AA"),
    ("https://example.org/?p=100", "https://example.org/?p=100"),
    ("https://example.org/ab'c", "https://example.org/ab%27c"),
    ('https://example.org/abc"', "https://example.org/abc"),
    ("https://example.org/abc<", "https://example.org/abc"),
    ("https://example.org/\t?p=100", "https://example.org/?p=100"),
    (
        "https://example.org:443/file.html?p=100&abc=1#frag",
        "https://example.org/file.html?abc=1&p=100#frag",
    ),
    ("http://test.org/?s_cid=123&clickid=1", "http://test.org"),
    ("http://test.org/?utm_source=&utm_medium=", "http://test.org"),
    ("http://test.org/#partnerid=123", "http://test.org"),
    ("http://test.org/?p=1", "http://test.org/?p=1"),
    ("HTTPS://WWW.DWDS.DE:80/", "https://www.dwds.de:80"),
]


@pytest.mark.parametrize("raw,expected", CLEAN_GOLDENS)
def test_clean_goldens(raw, expected):
    assert clean_url(raw) == expected


def test_clean_url_edge_cases():
    assert clean_url(5) is None
    # idempotency: canonical forms are fixed points
    for raw in (
        "http://test.org/?s_cid=123&clickid=1",
        "http://test.org/?utm_source=&utm_medium=",
        "http://test.org/#partnerid=123",
    ):
        cleaned = clean_url(raw)
        assert cleaned == "http://test.org"
        assert clean_url(cleaned) == cleaned


NORMALIZE_GOLDENS = [
    # (url, kwargs, expected)
    ("HTTPS://WWW.DWDS.DE/", {}, "https://www.dwds.de/"),
    ("http://test.net/foo.html#bar", {"strict": True}, "http://test.net/foo.html"),
    (
        "http://test.net/foo.html#bar",
        {"strict": False},
        "http://test.net/foo.html#bar",
    ),
    (
        "http://test.net/foo.html#:~:text=night-,vision",
        {},
        "http://test.net/foo.html#:~:text=night-,vision",
    ),
    ("http://www.example.org:80/test.html", {}, "http://www.example.org/test.html"),
    ("http://www.example.org:80?p=123", {}, "http://www.example.org/?p=123"),
    ("https://hanxiao.io//404.html", {}, "https://hanxiao.io/404.html"),
    ("http://[::1]:80/", {}, "http://[::1]/"),
    ("https://[::1]:443/", {}, "https://[::1]/"),
    ("http://[::1]:8080/", {}, "http://[::1]:8080/"),
    ("http://xn--Mnchen-3ya.de", {}, "http://münchen.de"),
    ("http://Mnchen-3ya.de", {}, "http://mnchen-3ya.de"),
    ("http://xn--München.de", {}, "http://xn--münchen.de"),
    (
        "https://www.deutschlandfunknova.de/beitrag/nord--und-s%C3%BCdgaza-israels-armee-verk%C3%BCndet-teilung-des-gazastreifens",
        {},
        "https://www.deutschlandfunknova.de/beitrag/nord--und-s%C3%BCdgaza-israels-armee-verk%C3%BCndet-teilung-des-gazastreifens",
    ),
    (
        "https://taz.de/Zukunft-des-49-Euro-Tickets/!5968518/",
        {},
        "https://taz.de/Zukunft-des-49-Euro-Tickets/!5968518/",
    ),
    ("http://test.org/?s_cid=123&clickid=1", {}, "http://test.org/"),
    ("http://test.org/?aftr_source=0", {}, "http://test.org/"),
    ("http://test.org/?fb_ref=0", {}, "http://test.org/"),
    ("http://test.org/?this_affiliate=0", {}, "http://test.org/"),
    ("http://test.org/?utm_source=rss&utm_medium=rss", {}, "http://test.org/"),
    ("http://test.org/?utm_source=rss&#038;utm_medium=rss", {}, "http://test.org/"),
    ("http://test.org/#partnerid=123", {}, "http://test.org/"),
    (
        "http://test.org/#mtm_campaign=documentation&mtm_keyword=demo&catpage=3",
        {},
        "http://test.org/#catpage=3",
    ),
    ("http://test.org/#page2", {}, "http://test.org/#page2"),
    # query elements (unit_tests.py:590-614)
    ("http://test.net/foo.html?utm_source=twitter", {}, "http://test.net/foo.html"),
    ("http://test.net/foo.html?testid=1", {}, "http://test.net/foo.html?testid=1"),
    ("http://test.net/foo.html?testid=1", {"strict": True}, "http://test.net/foo.html"),
    (
        "http://test.net/foo.html?testid=1&post=abc&page=2",
        {},
        "http://test.net/foo.html?page=2&post=abc&testid=1",
    ),
    (
        "http://test.net/foo.html?testid=1&post=abc&page=2",
        {"strict": True},
        "http://test.net/foo.html?page=2&post=abc",
    ),
    (
        "http://test.net/foo.html?page=2&itemid=10&lang=en",
        {},
        "http://test.net/foo.html?itemid=10&lang=en&page=2",
    ),
    # README example (unit_tests.py:1371-1377)
    (
        "http://test.net/foo.html?utm_source=twitter&post=abc&page=2#fragment",
        {"strict": True},
        "http://test.net/foo.html?page=2&post=abc",
    ),
]


@pytest.mark.parametrize("raw,kwargs,expected", NORMALIZE_GOLDENS)
def test_normalize_goldens(raw, kwargs, expected):
    assert normalize_url(raw, **kwargs) == expected


def test_normalize_wrong_language_rejects():
    with pytest.raises(ValueError):
        normalize_url("http://test.net/foo.html?page=2&lang=en", language="de")
    with pytest.raises(ValueError):
        normalize_url(
            "http://www.evolanguage.de/index.php?page=deutschkurse_fuer_aerzte&amp;language=ES",
            language="de",
        )
