"""URL scrubbing, query cleaning and normalization.

From-scratch reimplementation of the reference's string-repair and
canonicalization semantics (parity targets cited per function:
/root/reference/courlan/clean.py).  The normalized output is the
engine's byte-identity invariant: every golden pair from the
reference test suite must round-trip identically through these
functions (see tests/test_parity_normalize.py).
"""

from __future__ import annotations

import re
from html import unescape
from urllib.parse import (
    SplitResult,
    parse_qs,
    quote,
    urlencode,
)

from .fastsplit import fast_urlsplit as urlsplit
from .patterns import (
    ALLOWED_PARAMS,
    CONTROL_CHARS,
    LANG_PARAMS,
    RX_DOUBLED_HEAD,
    RX_DOUBLED_MID,
    RX_MARKUP_REST,
    RX_PATH_DOTDOT,
    RX_PATH_SLASHES,
    RX_PROTOCOL,
    RX_TRACKERS,
    RX_TRAILING_AMP,
    RX_TRAILING_GARBAGE,
    TARGET_LANG_VALUES,
)


def parse_maybe(url: str | SplitResult) -> SplitResult:
    """Parse a raw URL string (HTML-unescaped first) or pass a parsed
    result through.  Parity: /root/reference/courlan/urlutils.py:61-69."""
    if isinstance(url, SplitResult):
        return url
    if isinstance(url, str):
        return urlsplit(unescape(url))
    raise TypeError("wrong input type:", type(url))


def scrub_url(url: str) -> str:
    """Textual URL repair: whitespace/control chars, CDATA wrappers,
    markup rests, entity-encoded ampersands, doubled URLs and trailing
    garbage.  Parity: /root/reference/courlan/clean.py:51-94."""
    url = "".join(url.split()).strip(CONTROL_CHARS)

    if url.startswith("<![CDATA["):
        url = url.replace("<![CDATA[", "").replace("]]>", "")

    url = RX_MARKUP_REST.sub("", url)
    url = RX_TRAILING_AMP.sub("", url.replace("&amp;", "&"))

    # a URL glued onto another URL: pick the plausible one, except for
    # web.archive.org where nesting is legitimate
    if len(RX_PROTOCOL.findall(url)) > 1 and "web.archive.org" not in url:
        from .predicates import is_valid_url  # late import, cycle-free

        picked = RX_DOUBLED_HEAD.match(url)
        if picked and is_valid_url(picked[1]):
            url = picked[1]
        else:
            picked = RX_DOUBLED_MID.match(url)
            if picked and is_valid_url(picked[1]):
                url = picked[1]

    garbled = RX_TRAILING_GARBAGE.match(url)
    if garbled:
        url = garbled[1]

    # hostname-only URLs and embedded URLs lose their trailing slash
    if url.count("/") == 3 or url.count("://") > 1:
        url = url.rstrip("/")

    return url


def clean_query_string(
    querystring: str, strict: bool = False, language: str | None = None
) -> str:
    """Drop tracker parameters (or, in strict mode, everything outside a
    small allowlist), reject rows whose language parameter contradicts
    the target language (ValueError), and re-encode with sorted keys.
    Parity: /root/reference/courlan/clean.py:97-127."""
    if not querystring:
        return ""

    params = parse_qs(querystring)
    kept = {}

    for name in sorted(params):
        lowered = name.lower()
        if strict:
            if lowered not in ALLOWED_PARAMS and lowered not in LANG_PARAMS:
                continue
        elif RX_TRACKERS.search(lowered):
            continue
        if (
            language in TARGET_LANG_VALUES
            and lowered in LANG_PARAMS
            and str(params[name][0]) not in TARGET_LANG_VALUES[language]
        ):
            # wrong-language page: reject the whole row
            raise ValueError
        kept[name] = params[name]

    return urlencode(kept, doseq=True)


def decode_punycode(string: str) -> str:
    """Decode xn-- labels back to unicode where possible.
    Parity: /root/reference/courlan/clean.py:130-145."""
    if "xn--" not in string:
        return string
    decoded = []
    for label in string.split("."):
        if label.lower().startswith("xn--"):
            try:
                label = label.encode("utf8").decode("idna")
            except UnicodeError:
                pass
        decoded.append(label)
    return ".".join(decoded)


# chars quote() leaves untouched under safe="/%!=:,-": the always-safe
# set (alnum _.-~) plus the safe argument — a part of only these chars
# round-trips unchanged, so the hot path skips the quote() call
_RX_NEEDS_QUOTE = re.compile(r"[^A-Za-z0-9_.~/%!=:,-]")


def normalize_part(url_part: str) -> str:
    """Percent-quote a path or fragment, keeping URL-significant
    characters.  Parity: /root/reference/courlan/clean.py:148-151."""
    if not url_part or _RX_NEEDS_QUOTE.search(url_part) is None:
        return url_part
    return quote(url_part, safe="/%!=:,-")


def normalize_fragment(fragment: str, language: str | None = None) -> str:
    """Apply query-style tracker analysis to fragments.
    Parity: /root/reference/courlan/clean.py:154-161."""
    if "=" in fragment:
        if "&" in fragment:
            fragment = clean_query_string(fragment, False, language)
        elif RX_TRACKERS.search(fragment):
            fragment = ""
    return normalize_part(fragment)


def _canonical_netloc(parsed_url: SplitResult, scheme: str) -> str:
    "Lowercased, punycode-decoded netloc with the default port stripped."
    netloc = decode_punycode(parsed_url.netloc.lower())
    try:
        port = parsed_url.port
    except ValueError:
        port = None
    if (scheme == "http" and port == 80) or (scheme == "https" and port == 443):
        # rsplit keeps IPv6 literals intact
        netloc = netloc.rsplit(":", 1)[0]
    return netloc


# distinct sentinels for the query-cleaning cache: a cached ValueError
# (wrong-language query) must re-raise on every hit
_UNSET = object()
_REJECT = object()


def normalize_url(
    parsed_url: SplitResult | str,
    strict: bool = False,
    language: str | None = None,
    trailing_slash: bool = True,
    caches: dict | None = None,
) -> str:
    """Canonicalize a URL: lowercase scheme and host, decode punycode,
    strip the scheme's default port, collapse path slashes, drop
    leading /.. segments, percent-quote path and fragment, clean the
    query, and rebuild.  Parity: /root/reference/courlan/clean.py:164-195.
    Raises ValueError for wrong-language query parameters.

    ``caches`` (optional, from ``urlkit.check.make_check_caches``) memoizes
    the netloc canonicalization and query cleaning per batch — semantically
    transparent because both are pure in their cache keys; the Spark UDF
    layer passes per-Arrow-batch caches (hosts and tracker query strings
    repeat heavily in crawl data), scalar callers pass None."""
    parsed_url = parse_maybe(parsed_url)

    scheme = parsed_url.scheme.lower()
    if caches is None:
        netloc = _canonical_netloc(parsed_url, scheme)
    else:
        nkey = (scheme, parsed_url.netloc)
        netloc = caches["netloc"].get(nkey)
        if netloc is None:
            netloc = _canonical_netloc(parsed_url, scheme)
            caches["netloc"][nkey] = netloc

    newpath = normalize_part(
        RX_PATH_DOTDOT.sub("", RX_PATH_SLASHES.sub("/", parsed_url.path))
    )
    query = parsed_url.query
    if caches is None or not query:
        newquery = clean_query_string(query, strict, language)
    else:
        qcache = caches["query"]
        newquery = qcache.get(query, _UNSET)
        if newquery is _UNSET:
            try:
                newquery = clean_query_string(query, strict, language)
            except ValueError:
                qcache[query] = _REJECT
                raise
            qcache[query] = newquery
        elif newquery is _REJECT:
            raise ValueError
    if newquery and not newpath:
        newpath = "/"
    elif not trailing_slash and not newquery and newpath.endswith("/"):
        newpath = newpath.rstrip("/")

    newfragment = "" if strict else normalize_fragment(parsed_url.fragment, language)

    # inlined urllib.parse.urlunsplit (identical branch structure,
    # minus the argument-coercion overhead)
    url = newpath
    if netloc or (url and url[:2] == "//"):
        if url and url[:1] != "/":
            url = "/" + url
        url = "//" + netloc + url
    if scheme:
        url = scheme + ":" + url
    if newquery:
        url = url + "?" + newquery
    if newfragment:
        url = url + "#" + newfragment
    return url


def clean_url(url: str, language: str | None = None) -> str | None:
    """Chained scrub + normalize; None on failure.
    Parity: /root/reference/courlan/clean.py:43-48."""
    try:
        return normalize_url(scrub_url(url), False, language, False)
    except (AttributeError, ValueError):
        return None
