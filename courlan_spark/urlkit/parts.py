"""URL decomposition: base URL, host/path split, registrable domains,
relative-link repair and link-variant identity.

Parity targets cited per function: /root/reference/courlan/urlutils.py.
"""

from __future__ import annotations

from urllib.parse import SplitResult, urljoin, urlsplit, urlunsplit

from .patterns import (
    RX_DOMAIN_FAST,
    RX_FEED_WHITELIST,
    RX_STRIP_PORT,
    RX_WWW_PREFIX,
)
from .psl import registrable_domain
from .textual import parse_maybe


def get_tldinfo(url: str, fast: bool = False) -> tuple[str | None, str | None]:
    """Return ``(domain_label, registrable_domain)``.  With ``fast`` a
    regex shortcut runs before the public-suffix lookup.
    Parity: urlutils.py:24-42."""
    if not url or not isinstance(url, str):
        return None, None
    if fast:
        matched = RX_DOMAIN_FAST.match(url)
        if matched:
            full_domain = RX_STRIP_PORT.sub("", matched[1].split("@")[-1])
            label = full_domain.split(".")[0]
            if label:
                return label, full_domain
    resolved = registrable_domain(url)
    if resolved is None:
        return None, None
    label, fld = resolved
    return label, RX_WWW_PREFIX.sub("", fld)


def extract_domain(
    url: str, blacklist: set[str] | frozenset[str] | None = None, fast: bool = False
) -> str | None:
    """Registrable domain, None when unresolvable or blacklisted.
    Parity: urlutils.py:45-58."""
    if blacklist is None:
        blacklist = set()
    label, fld = get_tldinfo(url, fast=fast)
    return fld if fld and label not in blacklist and fld not in blacklist else None


def get_base_url(url: str | SplitResult) -> str:
    "``scheme://netloc`` (empty scheme tolerated). Parity: urlutils.py:72-80."
    parsed = parse_maybe(url)
    scheme = parsed.scheme + "://" if parsed.scheme else ""
    return scheme + parsed.netloc


def get_host_and_path(url: str | SplitResult) -> tuple[str, str]:
    """Split into (scheme://host, path+query+fragment); '/' for the
    homepage; raises on incomplete URLs.  This is the engine's frontier
    partition-key extractor.  Parity: urlutils.py:83-96."""
    parsed = parse_maybe(url)
    hostname = get_base_url(parsed)
    pathval = urlunsplit(["", "", parsed.path, parsed.query, parsed.fragment]) or "/"
    if not hostname:
        raise ValueError(f"incomplete URL: {url}")
    return hostname, pathval


def get_hostinfo(url: str) -> tuple[str | None, str]:
    "(registrable domain, base URL). Parity: urlutils.py:99-103."
    return extract_domain(url, fast=True), get_base_url(url)


def fix_relative_urls(baseurl: str, url: str) -> str:
    """Resolve a candidate link against its page URL.  Semantics
    (parity target urlutils.py:106-120, covered by golden tests):
    CMS template placeholders pass through untouched, same-site and
    relative links join onto the base, absolute links to other hosts
    pass through, and scheme-relative links to other hosts inherit
    the page's scheme."""
    if url.startswith("{"):  # template placeholder, not a URL
        return url
    candidate = urlsplit(url)
    base = urlsplit(baseurl)
    if candidate.netloc in ("", base.netloc):
        return urljoin(baseurl, url)
    if candidate.scheme:
        return url
    return urlunsplit(candidate._replace(scheme=base.scheme or "http"))


def filter_urls(link_list: list[str], urlfilter: str | None) -> list[str]:
    """Substring filter over a link list, sorted and deduplicated, with
    a feed-host fallback.  Parity: urlutils.py:123-134."""
    if urlfilter is None:
        return sorted(set(link_list))
    filtered = [link for link in link_list if urlfilter in link]
    if not filtered:
        filtered = [link for link in link_list if RX_FEED_WHITELIST.search(link)]
    return sorted(set(filtered))


def is_external(url: str, reference: str, ignore_suffix: bool = True) -> bool:
    """True when the link's registrable domain differs from the
    reference's (optionally comparing the first label only).
    Parity: urlutils.py:137-145."""
    ref_label, ref_fld = get_tldinfo(reference, fast=True)
    url_label, url_fld = get_tldinfo(url, fast=True)
    if ignore_suffix:
        return url_label != ref_label
    return url_fld != ref_fld


def canonical_dedup_key(url: str) -> str:
    """Scheme-less, trailing-slash-less form under which all four
    is_known_link variants (±slash × http/https) collide — the join key
    for distributed known-link anti-joins (SURVEY.md §2.5)."""
    if url.startswith("https://"):
        url = url[8:]
    elif url.startswith("http://"):
        url = url[7:]
    return url.rstrip("/")


def _slash_toggle(url: str) -> str:
    "The opposite trailing-slash form (all slashes strip, one adds)."
    return url.rstrip("/") if url.endswith("/") else url + "/"


def link_variants(link: str) -> list[str]:
    """The identity class a link is matched under: itself, its
    trailing-slash toggle, and (for http(s) links) both forms with the
    scheme flipped — the scalar mirror of canonical_dedup_key."""
    variants = [link, _slash_toggle(link)]
    if link.startswith("http"):
        flipped = (
            "http" + link[len("https") :]
            if link.startswith("https")
            else "https" + link[len("http") :]
        )
        variants += [flipped, _slash_toggle(flipped)]
    return variants


def is_known_link(link: str, known_links: set[str]) -> bool:
    """Membership test against known links under the variant identity
    (±trailing slash × http/https).  Semantics match the reference's
    sequential probes (urlutils.py:148-174, golden tests); realized as
    one variant-set disjointness check."""
    if not link:
        return False
    return not known_links.isdisjoint(link_variants(link))
