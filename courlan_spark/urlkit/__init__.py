"""urlkit — pure-Python URL semantics layer (no Spark dependencies).

Byte-identity parity layer for the reference's clean/filter/normalize
semantics (adbar/courlan, read-only at /root/reference).  The Spark
UDFs in ``courlan_spark.functions`` evaluate these callables over
Arrow batches; keeping them importable without pyspark lets the same
code be unit-tested scalar-style and shipped via --py-files.
"""

from .check import check_scrubbed_url, check_url, make_check_caches
from .parts import (
    canonical_dedup_key,
    extract_domain,
    filter_urls,
    fix_relative_urls,
    get_base_url,
    get_host_and_path,
    get_hostinfo,
    get_tldinfo,
    is_external,
    is_known_link,
)
from .patterns import ALLOWED_PARAMS, DOMAIN_BLACKLIST, LANG_PARAMS
from .predicates import (
    basic_filter,
    domain_filter,
    extension_filter,
    is_navigation_page,
    is_not_crawlable,
    is_valid_url,
    lang_filter,
    path_filter,
    type_filter,
    validate_url,
)
from .locales import score_language_segment
from .sampling import sample_urls
from .textual import (
    clean_url,
    clean_query_string,
    decode_punycode,
    normalize_fragment,
    normalize_part,
    normalize_url,
    parse_maybe,
    scrub_url,
)
from .weblinks import extract_links, filter_links, scan_anchor_candidates

__all__ = [
    "ALLOWED_PARAMS",
    "DOMAIN_BLACKLIST",
    "LANG_PARAMS",
    "basic_filter",
    "canonical_dedup_key",
    "check_scrubbed_url",
    "check_url",
    "make_check_caches",
    "clean_query_string",
    "clean_url",
    "decode_punycode",
    "domain_filter",
    "extension_filter",
    "extract_domain",
    "extract_links",
    "filter_links",
    "filter_urls",
    "fix_relative_urls",
    "get_base_url",
    "get_host_and_path",
    "get_hostinfo",
    "get_tldinfo",
    "is_external",
    "is_known_link",
    "is_navigation_page",
    "is_not_crawlable",
    "is_valid_url",
    "lang_filter",
    "normalize_fragment",
    "normalize_part",
    "normalize_url",
    "parse_maybe",
    "sample_urls",
    "path_filter",
    "scan_anchor_candidates",
    "score_language_segment",
    "scrub_url",
    "type_filter",
    "validate_url",
]
