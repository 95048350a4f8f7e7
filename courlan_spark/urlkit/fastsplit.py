"""A fast-path drop-in for urllib.parse.urlsplit.

``urlsplit`` is the single hottest call in the accepted-URL tail of
check_url (~17us/row of pure-Python generic parsing).  The common
case in a crawl — an absolute http(s) URL with a plain host — is
splittable by one anchored C regex.  Anything the regex cannot prove
equivalent falls back to the stdlib:

* no ``scheme://`` shape, or a scheme the stdlib would refuse to
  parse as one (the regex enforces the same RFC 3986 scheme grammar
  urlsplit does, so disagreement is impossible by construction);
* tab/CR/LF anywhere (the stdlib strips them before parsing);
* ``[``/``]`` in the authority (the stdlib validates IPv6 brackets
  and raises ValueError — callers rely on that rejection).

Equivalence over every differential corpus x flag matrix is asserted
by tests/test_differential_reference.py and test_parity_textual.py.
"""

from __future__ import annotations

import re
from urllib.parse import SplitResult, urlsplit

# the same scheme grammar urlsplit enforces (first char alpha, then
# alnum/+/-/.) — URLs failing it are parsed scheme-less by the stdlib,
# which the fallback handles
_RX_ABSOLUTE = re.compile(
    r"([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#(.*))?$",
    re.DOTALL,
)


def fast_urlsplit(url: str) -> SplitResult:
    "urlsplit with a regex fast path for absolute http-style URLs."
    if (
        isinstance(url, str)
        and "\t" not in url
        and "\r" not in url
        and "\n" not in url
    ):
        matched = _RX_ABSOLUTE.match(url)
        if matched is not None:
            netloc = matched[2]
            if "[" not in netloc and "]" not in netloc:
                return SplitResult(
                    matched[1].lower(),
                    netloc,
                    matched[3] or "",
                    matched[4] or "",
                    matched[5] or "",
                )
    return urlsplit(url)
