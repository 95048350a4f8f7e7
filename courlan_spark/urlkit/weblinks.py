"""HTML link harvesting: anchor-tag scan, candidate repair, filtering
and crawl prioritization.

Parity targets: /root/reference/courlan/core.py:132-267.  The Spark
engine applies the same scan as a vectorized UDF over a ``pages``
table followed by ``explode`` (courlan_spark.operators.links).
"""

from __future__ import annotations

from urllib.robotparser import RobotFileParser

from .check import check_url
from .parts import fix_relative_urls, get_base_url, is_external, is_known_link
from .patterns import RX_ANCHOR_TAG, RX_HREF, RX_HREFLANG
from .predicates import is_navigation_page, is_not_crawlable


def scan_anchor_candidates(
    pagecontent: str, language: str | None = None, keep_all: bool = False
) -> set[str]:
    """Collect raw href candidates from anchor tags: drop rel=nofollow,
    gate hreflang tags on the target language (or x-default).
    Parity: core.py:180-197."""
    candidates: set[str] = set()
    for tag in (m[0] for m in RX_ANCHOR_TAG.finditer(pagecontent)):
        if "rel=" in tag and "nofollow" in tag:
            continue
        if not keep_all and language is not None and "hreflang" in tag:
            langmatch = RX_HREFLANG.search(tag)
            if langmatch and (
                (lang := langmatch[1].lower()).startswith(language)
                or lang == "x-default"
            ):
                href = RX_HREF.search(tag)
                if href:
                    candidates.add(href[1])
        else:
            href = RX_HREF.search(tag)
            if href:
                candidates.add(href[1])
    return candidates


def extract_links(
    pagecontent: str,
    url: str | None = None,
    external_bool: bool = False,
    *,
    no_filter: bool = False,
    language: str | None = None,
    strict: bool = True,
    trailing_slash: bool = True,
    with_nav: bool = False,
    redirects: bool = False,
    reference: str | None = None,
    base_url: str | None = None,
) -> set[str]:
    """Scan a page, repair relative candidates, run check_url, apply
    the internal/external split and variant dedup.  ``base_url`` is
    deprecated upstream (core.py:166-168) and rejected identically.
    Parity: core.py:132-227."""
    if base_url:
        raise ValueError("'base_url' is deprecated, use 'url' instead.")

    base_url = get_base_url(url or "")
    url = url or base_url
    validlinks: set[str] = set()
    if not pagecontent:
        return validlinks

    reference = reference or base_url
    candidates = scan_anchor_candidates(
        pagecontent, language=language, keep_all=no_filter
    )

    for link in candidates:
        if not link.startswith("http"):
            link = fix_relative_urls(url, link)
        if not no_filter:
            checked = check_url(
                link,
                strict=strict,
                trailing_slash=trailing_slash,
                with_nav=with_nav,
                with_redirects=redirects,
                language=language,
            )
            if checked is None:
                continue
            link = checked[0]
            if reference and external_bool != is_external(
                url=link, reference=reference, ignore_suffix=True
            ):
                continue
        if is_known_link(link, validlinks):
            continue
        validlinks.add(link)

    return validlinks


def filter_links(
    htmlstring: str,
    url: str | None,
    *,
    lang: str | None = None,
    rules: RobotFileParser | None = None,
    external: bool = False,
    strict: bool = False,
    with_nav: bool = True,
    base_url: str | None = None,
) -> tuple[list[str], list[str]]:
    """Extract links, honor robots rules, and split into (regular,
    navigation-priority) lists for crawl scheduling.
    Parity: core.py:230-267 (base_url deprecated upstream, rejected
    identically)."""
    if base_url:
        raise ValueError("'base_url' is deprecated, use 'url' instead.")

    links: list[str] = []
    links_priority: list[str] = []

    for link in extract_links(
        pagecontent=htmlstring,
        url=url,
        external_bool=external,
        language=lang,
        strict=strict,
        with_nav=with_nav,
    ):
        if is_not_crawlable(link) or (
            rules is not None and not rules.can_fetch("*", link)
        ):
            continue
        if is_navigation_page(link):
            links_priority.append(link)
        else:
            links.append(link)

    return links, links_priority
