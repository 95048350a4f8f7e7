"""Non-circular parity fixtures for the embedded PSL + CLDR tables.

Round-1 VERDICT: the differential suite runs the reference through
shims backed by the engine's OWN tables, so drift between the embedded
tables and the real ``tld``/``babel`` libraries was structurally
undetectable.  Neither library is installable in this sandbox, so the
fixtures below are pinned from their PUBLIC upstream data instead:

* PSL cases — entries read from the Mozilla Public Suffix List
  (https://publicsuffix.org/list/, ICANN section), the exact data the
  ``tld`` package indexes.
* Locale cases — identifiers with published CLDR locale data, the
  exact criterion ``babel.Locale.parse`` uses (UnknownLocaleError
  otherwise).
* Reference-repo cases — expectations lifted verbatim from
  /root/reference/tests/unit_tests.py, which upstream authored AGAINST
  the real libraries (no shims involved).

If an embedded table drifts from the public data, these pins fail.
"""

import pytest

from courlan_spark.urlkit.locales import _parse_language, score_language_segment
from courlan_spark.urlkit.parts import extract_domain
from courlan_spark.urlkit.psl import registrable_domain

# (url, expected registrable domain or None) — from the public PSL
PSL_CASES = [
    # plain gTLD / ccTLD
    ("https://www.example.com/x", ("example", "example.com")),
    ("https://deep.sub.example.org/", ("example", "example.org")),
    ("https://example.io/", ("example", "example.io")),
    # second-level registrations
    ("https://www.bbc.co.uk/news", ("bbc", "bbc.co.uk")),
    ("https://shop.example.com.au/", ("example", "example.com.au")),
    ("https://example.ne.jp/", ("example", "example.ne.jp")),
    ("https://www.uni.ac.in/", ("uni", "uni.ac.in")),
    # PSL third-level US locality namespaces (k12/cc/lib per state)
    ("https://district.k12.ma.us/", ("district", "district.k12.ma.us")),
    ("https://school.k12.ca.us/", ("school", "school.k12.ca.us")),
    ("https://college.cc.tx.us/", ("college", "college.cc.tx.us")),
    ("https://branch.lib.ny.us/", ("branch", "branch.lib.ny.us")),
    # newer gTLDs present in the PSL
    ("https://files.example.zip/", ("example", "example.zip")),
    ("https://clip.example.mov/", ("example", "example.mov")),
    ("https://app.example.dev/", ("example", "example.dev")),
    # bare public suffixes are not registrable
    ("https://co.uk/", None),
    ("https://k12.ma.us/", None),
    ("https://com/", None),
    # unknown TLD
    ("https://example.notatld/", None),
    # wildcard rules (`*.<parent>` in the upstream PSL): every direct
    # child of the parent is itself a public suffix (round-3 addition
    # — these cases FAILED against the pre-wildcard whitelist)
    ("https://ab.cd.ck/", ("ab", "ab.cd.ck")),  # *.ck
    ("https://cd.ck/", None),  # a direct child IS the suffix
    ("https://ab.org.bd/", ("ab", "ab.org.bd")),  # *.bd
    ("https://org.bd/", None),
    ("https://ab.com.np/", ("ab", "ab.com.np")),  # *.np
    ("https://ab.gov.mm/", ("ab", "ab.gov.mm")),  # *.mm
    ("https://ab.com.pg/", ("ab", "ab.com.pg")),  # *.pg
    ("https://my.sch.uk/", None),  # *.sch.uk: child is a suffix
    ("https://ab.my.sch.uk/", ("ab", "ab.my.sch.uk")),
    # exception rules (`!<host>`): registrable despite the wildcard
    ("https://www.ck/", ("www", "www.ck")),  # !www.ck
    ("https://sub.www.ck/", ("www", "www.ck")),
    # JP city wildcards + their !city exceptions
    ("https://ab.cd.kawasaki.jp/", ("ab", "ab.cd.kawasaki.jp")),
    ("https://cd.kawasaki.jp/", None),
    ("https://city.kawasaki.jp/", ("city", "city.kawasaki.jp")),
    ("https://sub.city.kobe.jp/", ("city", "city.kobe.jp")),
]


@pytest.mark.parametrize("url,expected", PSL_CASES)
def test_psl_fixture(url, expected):
    assert registrable_domain(url) == expected


# reference-repo expectations (unit_tests.py:861-887) — authored
# upstream against the real tld package; slow path (fast=False) so the
# PSL table itself resolves them
REFERENCE_DOMAIN_CASES = [
    ("https://httpbun.org/", "httpbun.org"),
    ("https://www.httpbun.org/", "httpbun.org"),
    ("http://www.mkyong.com.au", "mkyong.com.au"),
    ("ftp://www4.httpbun.org", "httpbun.org"),
    ("http://w3.example.com", "example.com"),
    ("https://de.nachrichten.yahoo.com/", "yahoo.com"),
]


@pytest.mark.parametrize("url,expected", REFERENCE_DOMAIN_CASES)
def test_reference_domain_fixture_slow_path(url, expected):
    assert extract_domain(url, fast=False) == expected


# (segment, language babel parses it to, or None for
# UnknownLocaleError) — from published CLDR locale coverage
LOCALE_CASES = [
    ("de", "de"),
    ("en", "en"),
    ("pt", "pt"),
    ("zz", None),          # no such language
    ("en_GB", "en"),
    ("en-gb", "en"),
    ("pt_BR", "pt"),
    ("zh_TW", "zh"),
    ("de_AT", "de"),
    ("en_XY", None),       # no CLDR data for that territory
    ("de_BR", None),       # pair without published data
    ("zh_Hans", "zh"),     # script locales parse in babel
    ("sr_Latn", "sr"),
    ("sr-latn-rs", "sr"),
    ("uz_Cyrl", "uz"),
    ("de_Celt", None),     # no such script locale
]


@pytest.mark.parametrize("segment,expected", LOCALE_CASES)
def test_cldr_locale_fixture(segment, expected):
    assert _parse_language(segment) == expected


def test_score_language_segment_contract():
    # +1 target match, -1 other language, 0 unparseable / non-string —
    # the langcodes_score contract (reference filters.py:181-191)
    assert score_language_segment("de", "de", 0) == 1
    assert score_language_segment("de", "fr", 0) == -1
    assert score_language_segment("de", "zz", 0) == 0
    assert score_language_segment("de", ("de",), 0) == 0
    assert score_language_segment("zh", "zh_Hans", 0) == 1
