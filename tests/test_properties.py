"""Property-based tests (hypothesis) for the scalar parity layer.

The reference ships no property tests (SURVEY.md §5); these pin the
engine's batch-safety contract: the scalar kernels never raise on
arbitrary input (exception-as-rejection stays *internal*), and are
deterministic — both required for exactly-once semantics inside Arrow
batches.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from courlan_spark.functions import hashing as H
from courlan_spark.operators.suffix import longest_common_substring
from courlan_spark.urlkit import (
    check_url,
    clean_url,
    is_known_link,
    scrub_url,
)

text_urls = st.text(max_size=200)
urlish = st.one_of(
    text_urls,
    st.builds(
        lambda scheme, host, path, query: f"{scheme}://{host}{path}{query}",
        st.sampled_from(["http", "https", "HTTP", "ftp"]),
        st.text(
            alphabet="abcdefghijklmnopqrstuvwxyz09.:-_[]@ß漢", min_size=0, max_size=40
        ),
        st.text(alphabet="/abcdef ghij%20.=&?#{}<>'\"", min_size=0, max_size=60),
        st.sampled_from(["", "?utm_source=x", "?id=1&lang=en", "#frag", "?a=1;b=2"]),
    ),
)


@settings(max_examples=300, deadline=None)
@given(urlish)
def test_check_url_never_raises_and_is_deterministic(url):
    first = check_url(url)
    second = check_url(url)
    assert first == second
    if first is not None:
        norm, domain = first
        assert isinstance(norm, str) and isinstance(domain, str)
        assert norm and domain


@settings(max_examples=300, deadline=None)
@given(urlish, st.sampled_from([None, "de", "en", "fr"]), st.booleans())
def test_check_url_variants_never_raise(url, language, strict):
    result = check_url(url, strict=strict, language=language)
    assert result is None or isinstance(result, tuple)


@settings(max_examples=200, deadline=None)
@given(text_urls)
def test_clean_and_scrub_never_raise(url):
    clean_url(url)
    scrub_url(url)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300), st.text(max_size=300))
def test_lcs_bounds(a, b):
    n = longest_common_substring(a, b)
    assert 0 <= n <= min(len(a), len(b))
    if n:
        # an actual common substring of that length exists
        assert any(a[i : i + n] in b for i in range(len(a) - n + 1))


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=500))
def test_fingerprints_deterministic(text):
    sh = H.shingle_hashes(text)
    assert (sh == H.shingle_hashes(text)).all()
    sig = H.minhash_signature(sh)
    assert (sig == H.minhash_signature(H.shingle_hashes(text))).all()
    assert sig.dtype == np.int64 and (sig >= 0).all()
    assert H.simhash64(text) == H.simhash64(text)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60), st.sets(st.text(max_size=60), max_size=5))
def test_is_known_link_never_raises(link, known):
    assert is_known_link(link, known) in (True, False)


@settings(max_examples=800, deadline=None)
@given(urlish)
def test_fast_urlsplit_equals_stdlib(url):
    """The round-3 urlsplit fast path must be indistinguishable from
    the stdlib on arbitrary input: same SplitResult when the stdlib
    parses, same exception class when it raises."""
    from urllib.parse import urlsplit as std_urlsplit

    from courlan_spark.urlkit.fastsplit import fast_urlsplit

    try:
        expected = std_urlsplit(url)
        raised = None
    except ValueError as exc:
        raised = exc
    if raised is not None:
        try:
            fast_urlsplit(url)
            raise AssertionError(f"stdlib raised but fast path parsed: {url!r}")
        except ValueError:
            return
    got = fast_urlsplit(url)
    assert tuple(got) == tuple(expected), url
    assert got.scheme == expected.scheme


@settings(max_examples=300, deadline=None)
@given(
    st.lists(urlish, max_size=25),
    st.sampled_from([None, "de", "en"]),
    st.booleans(),
    st.booleans(),
)
def test_batch_kernel_equals_scalar_on_arbitrary_input(
    urls, language, strict, with_nav
):
    "check_url_batch == per-row check_url on hypothesis-generated junk."
    import pandas as pd

    from courlan_spark.functions.url_udfs import check_url_batch

    series = pd.Series(urls, dtype=object)
    got = check_url_batch(
        series, strict=strict, language=language, with_nav=with_nav
    )
    for pos, url in enumerate(urls):
        expected = check_url(
            url, strict=strict, language=language, with_nav=with_nav
        )
        pair = (got["norm_url"].iloc[pos], got["domain"].iloc[pos])
        if expected is None:
            assert pair == (None, None), url
        else:
            assert pair == expected, url
