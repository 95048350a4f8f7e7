"""The fused per-URL accept/normalize pipeline.

``check_url`` chains the cheap predicates first and rejects rows via
exceptions, exactly as the reference does
(/root/reference/courlan/core.py:39-129, stage order :63-122).  This
scalar form is the semantic anchor; the Spark engine evaluates the
same function over Arrow batches (courlan_spark.functions.url_udfs).
"""

from __future__ import annotations

from .parts import extract_domain
from .patterns import DOMAIN_BLACKLIST
from .predicates import (
    basic_filter,
    domain_filter,
    extension_filter,
    lang_filter,
    path_filter,
    type_filter,
    validate_url,
)
from .textual import normalize_url, scrub_url


def check_url(
    url: str,
    strict: bool = False,
    with_redirects: bool = False,
    language: str | None = None,
    with_nav: bool = False,
    trailing_slash: bool = True,
) -> tuple[str, str] | None:
    """Validate, filter and canonicalize one URL.

    Returns ``(normalized_url, registrable_domain)`` or ``None`` when
    any stage rejects the row.  Stage order (cheapest first, early
    exit) follows /root/reference/courlan/core.py:63-122; redirect
    resolution (network I/O) is intentionally not part of the batch
    engine and the flag is accepted only for API compatibility.
    """
    if with_redirects:
        raise NotImplementedError(
            "network redirect probes are out of scope for the batch engine"
        )
    try:
        if not basic_filter(url):
            raise ValueError

        url = scrub_url(url)

        if not type_filter(url, strict=strict, with_nav=with_nav):
            raise ValueError

        if language is not None and not lang_filter(
            url, language, strict, trailing_slash
        ):
            raise ValueError

        ok, parsed_url = validate_url(url)
        if not ok or parsed_url is None:
            raise ValueError

        if not extension_filter(parsed_url.path):
            raise ValueError

        if not domain_filter(parsed_url.netloc):
            raise ValueError

        if strict and not path_filter(parsed_url.path, parsed_url.query):
            raise ValueError

        url = normalize_url(parsed_url, strict, language, trailing_slash)

        domain = extract_domain(
            url, blacklist=DOMAIN_BLACKLIST if strict else None, fast=True
        )
        if domain is None:
            return None

    except (AttributeError, ValueError):
        return None

    return url, domain
