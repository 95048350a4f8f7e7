"""Batch-vs-scalar differential for the vectorized check_url kernel.

The round-3 kernel (functions/url_udfs.py:check_url_batch) runs the
cheap-reject prefix (basic_filter / scrub-identity proof / type_filter)
as vectorized pandas string ops and memoizes the pure per-host /
per-query stages.  These tests pin the invariant that makes all of
that legal: for EVERY url and EVERY flag combination the batch kernel
returns exactly what the scalar check_url chain returns.
"""

import pandas as pd
import pytest

from courlan_spark.functions.url_udfs import check_url_batch
from courlan_spark.urlkit import check_url

from tools.bench_reference import _corpus

GNARLY = [
    "https://example.org/",
    "  https://www.dwds.de  ",
    "<![CDATA[https://www.dwds.de]]>",
    "https://www.dwds.de/test?param=test&amp;other=test",
    "https://g__https://www.dwds.de/",
    "https://web.archive.org/web/20131021165347/https://www.imdb.com/",
    "http://xn--mnchen-3ya.de/stadt/5",
    "http://test.org/?utm_source=rss&#038;utm_medium=rss",
    "http://test.org/#mtm_campaign=documentation&mtm_keyword=demo&catpage=3",
    "https://example.com//double//slash/x",
    "http://example.com:80",
    "http://example.com:80:80",
    "http://127.0.0.1/path",
    "http://0127.0.0.1",
    "https://taz.de/Zukunft-des-49-Euro-Tickets/!5968518/",
    "http://www.example.org/tag/abcde/",
    "http://www.example.org/2011/11/",
    "http://my-livechat.com/",
    "https://de.nachrichten.yahoo.com/bundesliga-fr%C3%B6hlich-175850830.html",
    "ftps://example.org/",
    "{mylink}",
    "http://ab",
    "https://www.test.com/&",
    'https://www.test.com/"<p></p>',
    "https://example.org/ab'c",
    "ø\xaa",
    None,
    "https://example.org/path/",
    "https://x.org/?lang=de",
    "https://x.org/a//b/../c?lang=fr&utm_source=x#frag=1",
    "HTTP://UPPER.EXAMPLE.COM:80/Path",
    "https://example.org" + "/x" * 240,  # near the 500-char gate
]


def _scalar(urls: pd.Series, **kw) -> pd.DataFrame:
    norms, domains = [], []
    for url in urls:
        checked = check_url(url, **kw) if isinstance(url, str) else None
        norms.append(checked[0] if checked else None)
        domains.append(checked[1] if checked else None)
    return pd.DataFrame({"norm_url": norms, "domain": domains})


@pytest.mark.parametrize("strict", [False, True])
@pytest.mark.parametrize("language", [None, "de", "en"])
@pytest.mark.parametrize("with_nav", [False, True])
def test_batch_equals_scalar(strict, language, with_nav):
    urls = pd.Series(_corpus(2000) + GNARLY, dtype=object)
    kw = dict(strict=strict, language=language, with_nav=with_nav)
    expected = _scalar(urls, **kw)
    got = check_url_batch(urls, **kw)
    mismatch = (
        expected["norm_url"].fillna("~") != got["norm_url"].fillna("~")
    ) | (expected["domain"].fillna("~") != got["domain"].fillna("~"))
    assert not mismatch.any(), urls[mismatch].tolist()


def test_batch_trailing_slash_flag():
    urls = pd.Series(
        ["https://example.org/path/", "https://example.org/path", None],
        dtype=object,
    )
    for ts in (False, True):
        expected = _scalar(urls, trailing_slash=ts)
        got = check_url_batch(urls, trailing_slash=ts)
        assert expected.equals(got)


def test_batch_memo_and_caches_do_not_leak_between_calls():
    "Two calls with contradictory flags share no cached state."
    urls = pd.Series(["https://x.org/?lang=de"] * 3, dtype=object)
    de = check_url_batch(urls, language="de")
    en = check_url_batch(urls, language="en")
    assert de["norm_url"].notna().all()
    # wrong-language query parameter rejects the row (and the cached
    # ValueError must re-raise per row, not poison the de-call's cache)
    assert en["norm_url"].isna().all()
