"""Row-level accept/reject predicates over URLs and URL parts.

Each predicate is a from-scratch reimplementation of the matching
reference filter (parity targets cited per function:
/root/reference/courlan/filters.py).  They are deliberately pure and
import-light so the Spark UDF layer can ship them to executors and
apply them over Arrow batches.
"""

from __future__ import annotations

from ipaddress import ip_address
from urllib.parse import SplitResult

from .fastsplit import fast_urlsplit as urlsplit
from .locales import score_language_segment
from .patterns import (
    IP_CHARS,
    PROTOCOLS,
    RX_ADULT_VIDEO,
    RX_ALL_PATH_LANGS,
    RX_ALL_PATH_LANGS_NT,
    RX_DOMAIN_PORT,
    RX_FILE_TYPE,
    RX_HOST_LANG,
    RX_INDEX_PAGE,
    RX_NAVIGATION,
    RX_NOT_CRAWLABLE,
    RX_PATH_EXTENSION,
    RX_PATH_LANG,
    RX_SITE_STRUCTURE,
    WHITELISTED_EXTENSIONS,
)


def basic_filter(url: str) -> bool:
    "Cheap length/prefix gate. Parity: filters.py:138-140."
    return bool(url.startswith("http") and 10 <= len(url) < 500)


def validate_url(url: str | None) -> tuple[bool, SplitResult | None]:
    """Parse the URL and check scheme + netloc plausibility.
    Parity: filters.py:254-274."""
    try:
        parsed = urlsplit(url)
    except ValueError:
        return False, None
    if parsed.scheme not in PROTOCOLS:
        return False, None
    netloc = parsed.netloc
    if (
        len(netloc) < 4
        or (netloc.lower().startswith("www.") and len(netloc) < 8)
        or ("." not in netloc and ":" not in netloc)
    ):
        return False, None
    return True, parsed


def is_valid_url(url: str | None) -> bool:
    "Boolean form of validate_url. Parity: filters.py:277-279."
    return validate_url(url)[0]


def extension_filter(urlpath: str) -> bool:
    """Accept paths without extension or with a whitelisted document
    extension. Parity: filters.py:174-177."""
    ext = RX_PATH_EXTENSION.search(urlpath.lower())
    return not ext or ext[0] in WHITELISTED_EXTENSIONS


def domain_filter(domain: str) -> bool:
    """Reject implausible host names: over-long FQDNs, non-IP hex
    strings posing as IPs, malformed shapes (with an IDNA retry),
    digit-leading hosts, file-type lookalikes and media extensions.
    Parity: filters.py:143-171."""
    if len(domain) > 253:
        return False

    if all(c in IP_CHARS for c in domain):
        try:
            ip_address(domain)
            return True
        except ValueError:
            pass  # hex-ish but not an IP (e.g. "abc.de"): keep validating

    if not RX_DOMAIN_PORT.match(domain):
        try:
            if not RX_DOMAIN_PORT.match(domain.encode("idna").decode("utf-8")):
                return False
        except UnicodeError:
            return False

    if domain.split(".")[0].isdigit() or RX_FILE_TYPE.search(domain):
        return False

    ext = RX_PATH_EXTENSION.search(domain.lower())
    return not ext or ext[0] not in WHITELISTED_EXTENSIONS


def path_filter(urlpath: str, query: str) -> bool:
    """Reject non-crawlable paths and query-less index pages (strict
    mode only). Parity: filters.py:229-233."""
    if RX_NOT_CRAWLABLE.search(urlpath):
        return False
    return bool(not RX_INDEX_PAGE.match(urlpath) or query)


def type_filter(url: str, strict: bool = False, with_nav: bool = False) -> bool:
    """Reject feeds, CMS-structure paths and (strict) media/adult
    URLs; with_nav rescues navigation pages. Parity: filters.py:236-251."""
    if (
        url.endswith(("/feed", "/rss", "_archive.html"))
        or (
            RX_SITE_STRUCTURE.search(url)
            and (not with_nav or not is_navigation_page(url))
        )
        or (strict and (RX_FILE_TYPE.search(url) or RX_ADULT_VIDEO.search(url)))
    ):
        return False
    return True


def lang_filter(
    url: str,
    language: str | None = None,
    strict: bool = False,
    trailing_slash: bool = True,
) -> bool:
    """Score internationalization cues in the URL; non-negative scores
    pass. Parity: filters.py:194-226."""
    if language is None:
        return True
    score = 0
    head = RX_PATH_LANG.match(url)
    if head:
        finder = RX_ALL_PATH_LANGS if trailing_slash else RX_ALL_PATH_LANGS_NT
        occurrences = finder.findall(url)
        if len(occurrences) == 1:
            score = score_language_segment(language, head[1], score)
        elif len(occurrences) == 2:
            for occurrence in occurrences:
                # findall yields tuples here; scoring skips non-strings,
                # matching the reference's TypeError path
                score = score_language_segment(language, occurrence, score)
        # more than two candidates: no test
    if strict:
        sub = RX_HOST_LANG.match(url)
        if sub:
            score += 1 if sub[1].lower() == language else -1
    return score >= 0


def is_navigation_page(url: str) -> bool:
    "Navigation/overview page heuristic. Parity: filters.py:282-285."
    return bool(RX_NAVIGATION.search(url))


def is_not_crawlable(url: str) -> bool:
    "Deep-web / non-crawlable URL heuristic. Parity: filters.py:288-291."
    return bool(RX_NOT_CRAWLABLE.search(url))
