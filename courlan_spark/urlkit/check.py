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
    except (AttributeError, ValueError):
        return None

    return check_scrubbed_url(url, strict, language, trailing_slash)


def make_check_caches() -> dict:
    """Per-batch memo tables for ``check_scrubbed_url``: every entry
    caches a PURE function of its key (domain_filter(netloc), the
    canonical netloc, the cleaned query string, the registrable domain
    of a scheme://host base), so caching is semantically transparent —
    differential-tested batch-vs-scalar over the full flag matrix.
    Hosts and tracker query strings repeat heavily in crawl batches,
    which is what makes the accepted-URL tail cheap at scale."""
    return {"netloc": {}, "query": {}, "domain_ok": {}, "fld": {}}


def check_scrubbed_url(
    url: str,
    strict: bool = False,
    language: str | None = None,
    trailing_slash: bool = True,
    caches: dict | None = None,
) -> tuple[str, str] | None:
    """The stages of ``check_url`` AFTER the cheap-reject prefix
    (basic_filter -> scrub_url -> type_filter).  Split out so the
    Spark UDF layer can run the prefix as vectorized pandas batch
    operations and feed only the survivors through this per-row tail
    — both entry points share one implementation, so parity with
    /root/reference/courlan/core.py:63-122 is proven once."""
    try:
        if language is not None and not lang_filter(
            url, language, strict, trailing_slash
        ):
            raise ValueError

        ok, parsed_url = validate_url(url)
        if not ok or parsed_url is None:
            raise ValueError

        if not extension_filter(parsed_url.path):
            raise ValueError

        if caches is None:
            if not domain_filter(parsed_url.netloc):
                raise ValueError
        else:
            dom_ok = caches["domain_ok"].get(parsed_url.netloc)
            if dom_ok is None:
                dom_ok = domain_filter(parsed_url.netloc)
                caches["domain_ok"][parsed_url.netloc] = dom_ok
            if not dom_ok:
                raise ValueError

        if strict and not path_filter(parsed_url.path, parsed_url.query):
            raise ValueError

        url = normalize_url(parsed_url, strict, language, trailing_slash, caches)

        blacklist = DOMAIN_BLACKLIST if strict else None
        if caches is None:
            domain = extract_domain(url, blacklist=blacklist, fast=True)
        else:
            # registrable domain is a pure function of scheme://host —
            # the same keying the extract-domain UDF batch cache uses
            cut = url.find("/", 8)
            base = url if cut == -1 else url[:cut]
            fld = caches["fld"]
            if base in fld:
                domain = fld[base]
            else:
                domain = extract_domain(url, blacklist=blacklist, fast=True)
                fld[base] = domain
        if domain is None:
            return None

    except (AttributeError, ValueError):
        return None

    return url, domain
