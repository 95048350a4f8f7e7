"""Goldens for the predicate layer (extension, type, path, lang,
validation, domain, navigation).

Sources: /root/reference/tests/unit_tests.py:232-515 and :761-805.
"""

import pytest

from courlan_spark.urlkit import (
    domain_filter,
    extension_filter,
    is_navigation_page,
    is_not_crawlable,
    is_valid_url,
    lang_filter,
    path_filter,
    score_language_segment,
    type_filter,
    validate_url,
)


@pytest.mark.parametrize(
    "path,ok",
    [
        ("/test.js", False),
        ("/GirlInfo.aspx", True),
        ("/de/vermoegensrecht.amp", True),
        ("/test.shtml", True),
        ("/ADC/Art.nsf/O/8EWETN", True),
        ("/ADC/Art.nsf", False),
        ("/test.xhtml", True),
        ("/test.php5", True),
        ("/test.php6", True),
        ("/photo.JPG", False),
        ("/page.HTML", True),
        ("/index.PHP", True),
    ],
)
def test_extension_filter(path, ok):
    assert extension_filter(path) is ok


@pytest.mark.parametrize(
    "url,kwargs,ok",
    [
        ("http://www.example.org/livecams/test.html", {"strict": False}, True),
        ("http://www.example.org/livecams/test.html", {"strict": True}, False),
        ("http://www.example.org/test.html", {}, True),
        ("http://www.example.org/feed", {}, False),
        ("http://www.example.org/wp-admin/", {}, False),
        ("http://www.example.org/wp-includes/this", {}, False),
        ("http://www.example.org/category/123", {}, False),
        ("http://www.example.org/product-category/123", {}, False),
        ("http://www.example.org/category/tropes/time-travel", {}, True),
        ("http://www.example.org/test.xml?param=test", {"strict": True}, False),
        ("http://www.example.org/test.asp", {}, True),
        ("http://my-livechat.com/", {}, True),
        ("http://my-livechat.com/", {"strict": True}, False),
        ("http://example.com/livechat/1", {"strict": True}, False),
        ("http://example.com/new-sexcam", {}, True),
        ("http://example.com/new-sexcam", {"strict": True}, False),
        ("https://de.thecitizen.de/tag/anonymity/", {}, False),
        ("https://de.thecitizen.de/tags/anonymity/", {}, False),
        ("http://www.example.org/author/abcde", {}, False),
        ("http://www.example.org/autor/abcde/", {}, False),
        ("http://www.example.org/2011/11/", {}, False),
        ("http://www.example.org/2011/", {}, False),
        ("http://www.example.org/2011_archive.html", {}, False),
        ("http://www.example.org/2020/02/06/1859/", {}, True),
        (
            "http://www.bmbwk.gv.at/forschung/fps/gsk/befragung.xml?style=text",
            {},
            True,
        ),
        (
            "http://www.aec.at/de/archives/prix_archive/prix_projekt.asp?iProjectID=11118",
            {},
            False,
        ),
        ("http://www.example.org/tag/abcde/", {"with_nav": False}, False),
        ("http://www.example.org/tag/abcde/", {"with_nav": True}, True),
        ("http://www.example.org/page/10/", {"with_nav": False}, False),
        ("http://www.example.org/page/10/", {"with_nav": True}, True),
        ("http://www.example.org/logo_800_web-jpg/", {"strict": True}, False),
        ("http://www.example.org/img_2020-03-03_25/", {"strict": True}, False),
    ],
)
def test_type_filter(url, kwargs, ok):
    assert type_filter(url, **kwargs) is ok


@pytest.mark.parametrize(
    "path,query,ok",
    [
        ("/index.php", "", False),
        ("/default/", "", False),
        ("/contact/", "", False),
        ("/Datenschutzerklaerung", "", False),
    ],
)
def test_path_filter(path, query, ok):
    assert path_filter(path, query) is ok


@pytest.mark.parametrize(
    "url,kwargs,ok",
    [
        ("http://test.com/az", {"language": "de", "trailing_slash": False}, False),
        ("http://test.com/az/", {"language": "de"}, False),
        ("http://test.com/de", {"language": "de", "trailing_slash": False}, True),
        ("http://test.com/de/", {"language": "de"}, True),
        (
            "https://www.20min.ch/fr/story/des-millions-pour-produire-de-l-energie-renouvelable-467974085377",
            {"language": None},
            True,
        ),
        (
            "https://www.20min.ch/fr/story/des-millions-pour-produire-de-l-energie-renouvelable-467974085377",
            {"language": "de"},
            False,
        ),
        (
            "https://www.20min.ch/fr/story/des-millions-pour-produire-de-l-energie-renouvelable-467974085377",
            {"language": "fr"},
            True,
        ),
        (
            "https://www.20min.ch/fr/story/des-millions-pour-produire-de-l-energie-renouvelable-467974085377",
            {"language": "en"},
            False,
        ),
        (
            "https://www.20min.ch/fr/story/des-millions-pour-produire-de-l-energie-renouvelable-467974085377",
            {"language": "es"},
            False,
        ),
        ("https://www.sitemaps.org/en_GB/protocol.html", {"language": "en"}, True),
        ("https://www.sitemaps.org/en_GB/protocol.html", {"language": "de"}, False),
        ("https://en.wikipedia.org/", {"language": "de", "strict": True}, False),
        ("https://en.wikipedia.org/", {"language": "de", "strict": False}, True),
        ("https://de.wikipedia.org/", {"language": "de", "strict": True}, True),
        (
            "http://de.musclefood.com/neu/neue-nahrungsergaenzungsmittel.html",
            {"language": "de", "strict": True},
            True,
        ),
        (
            "http://de.musclefood.com/neu/neue-nahrungsergaenzungsmittel.html",
            {"language": "fr", "strict": True},
            False,
        ),
        (
            "http://ch.postleitzahl.org/sankt_gallen/liste-T.html",
            {"language": "fr"},
            True,
        ),
        (
            "http://ch.postleitzahl.org/sankt_gallen/liste-T.html",
            {"language": "de"},
            True,
        ),
        (
            "http://www.uni-rostock.de/fakult/philfak/fkw/iph/thies/mythos.html",
            {"language": "de"},
            True,
        ),
        (
            "http://stifter.literature.at/witiko/htm/h15-22b.html",
            {"language": "de"},
            True,
        ),
        (
            "http://stifter.literature.at/doc/witiko/h15-22b.html",
            {"language": "de"},
            True,
        ),
        (
            "http://stifter.literature.at/nl/witiko/h15-22b.html",
            {"language": "de"},
            False,
        ),
        (
            "http://stifter.literature.at/de_DE/witiko/h15-22b.html",
            {"language": "de"},
            True,
        ),
        (
            "http://stifter.literature.at/en_US/witiko/h15-22b.html",
            {"language": "de"},
            False,
        ),
        (
            "http://www.stiftung.koerber.de/bg/recherche/de/beitrag.php?id=15132&refer=",
            {"language": "de"},
            True,
        ),
        (
            "http://www.solingen-internet.de/si-hgw/eiferer.htm",
            {"language": "de"},
            True,
        ),
        (
            "http://ig.cs.tu-berlin.de/oldstatic/w2000/ir1/aufgabe2/ir1-auf2-gr16.html",
            {"language": "de", "strict": True},
            True,
        ),
        (
            "http://ig.cs.tu-berlin.de/oldstatic/w2000/ir1/aufgabe2/ir1-auf2-gr16.html",
            {"language": "de", "strict": False},
            True,
        ),
        (
            "http://bz.berlin1.de/kino/050513/fans.html",
            {"language": "de", "strict": False},
            True,
        ),
        (
            "http://bz.berlin1.de/kino/050513/fans.html",
            {"language": "de", "strict": True},
            False,
        ),
    ],
)
def test_lang_filter(url, kwargs, ok):
    assert lang_filter(url, **kwargs) is ok


@pytest.mark.parametrize(
    "language,segment,start,expected",
    [
        ("en", "en_HK", 0, 1),
        ("en", "en-HK", 0, 1),
        ("en", "en_XY", 0, 0),
        ("en", "en-XY", 0, 0),
        ("en", "de_DE", 0, -1),
        ("en", "de-DE", 0, -1),
    ],
)
def test_language_segment_scoring(language, segment, start, expected):
    assert score_language_segment(language, segment, start) == expected


def test_validate():
    assert validate_url("http://www.test[.org/test")[0] is False
    assert validate_url("ntp://www.test.org/test")[0] is False
    assert validate_url("ftps://www.test.org/test")[0] is False
    assert validate_url("http://t.g/test")[0] is False
    assert validate_url("http://test.org/test")[0] is True
    assert validate_url("http://1234") == (False, None)
    assert validate_url("http://www.example.org/")[0] is True

    assert not is_valid_url("http://www.test[.org/test")
    assert is_valid_url("http://test.org/test")
    assert is_valid_url("http://t.co/")
    assert is_valid_url("http://t.co:80/")
    assert is_valid_url("http://user@t.co/")
    assert is_valid_url("http://g.co/")
    assert not is_valid_url("http://WWW.a.b/")
    assert not is_valid_url("http://www.a.b/")
    assert not is_valid_url("http://1234")
    assert not is_valid_url("http://localhost/")
    assert not is_valid_url("http://a.b/")


def test_domain_filter():
    assert domain_filter("") is False
    assert domain_filter("a" * 254 + ".com") is False
    d_ok = "a." * 125 + "abc"
    d_long = "a." * 125 + "abcd"
    assert len(d_ok) == 253 and len(d_long) == 254
    assert domain_filter(d_ok) is True
    assert domain_filter(d_long) is False
    assert domain_filter("too-long" + "g" * 60 + ".org") is False
    assert domain_filter("long" + "g" * 50 + ".org") is True
    assert domain_filter("example.-com") is False
    assert domain_filter("example.") is False
    assert domain_filter("-example.com") is False
    assert domain_filter("_example.com") is False
    assert domain_filter("example.com:") is False
    assert domain_filter("a......b.com") is False
    assert domain_filter("*.example.com") is False
    assert domain_filter("exa-mple.co.uk") is True
    assert domain_filter("kräuter.de") is True
    assert domain_filter("xn--h1aagokeh.xn--p1ai") is True
    assert domain_filter("`$smarty.server.server_name`") is False
    assert domain_filter("$`)}if(a.tryconvertencoding)trycatch(e)const") is False
    assert domain_filter("00x200.jpg,") is False
    assert domain_filter("-100x100.webp") is False
    assert domain_filter("0.gravata.html") is False
    assert domain_filter("https:") is False
    assert domain_filter("127.0.0.1") is True
    assert domain_filter("::1") is True
    assert domain_filter("900.200.100.75") is False
    assert domain_filter("111.111.111") is False
    assert domain_filter("0127.0.0.1") is False
    assert domain_filter("abc.de") is True
    assert domain_filter("aced.de") is True
    assert domain_filter("dead.beef") is True
    assert domain_filter("example.jpg") is False
    assert domain_filter("example.html") is False
    assert domain_filter("0.gravatar.com") is False
    assert domain_filter("12345.org") is False


def test_navigation_and_crawlable():
    assert is_navigation_page("https://test.org/") is False
    assert is_navigation_page("https://test.org/page/1") is True
    assert is_navigation_page("https://test.org/?p=11") is True
    assert is_not_crawlable("https://test.org/login") is True
    assert is_not_crawlable("https://test.org/login/") is True
    assert is_not_crawlable("https://test.org/login.php") is True
    assert is_not_crawlable("https://test.org/page") is False
