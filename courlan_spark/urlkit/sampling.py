"""Scalar per-domain URL sampling (reference: courlan/sampling.py).

Semantics mirror ``sample_urls``: URLs pass the store's buffer
validation (validate -> normalize; the reference routes them through
UrlStore.add_urls, urlstore.py:171-203), homepage-only paths ('/')
are excluded, hosts outside [exclude_min, exclude_max] are discarded
whole, and each surviving host contributes min(len, samplesize) paths.

One deliberate difference: the reference draws with random.sample
(its own tests assert counts only, unit_tests.py:1320-1351); this
implementation picks deterministically by md5('42' + host + path) —
the SAME rank the distributed operator (operators/sampling.py) and
its DuckDB oracle use, so the scalar and Spark paths return identical
samples, reproducibly.
"""

from __future__ import annotations

import hashlib

from .parts import get_host_and_path
from .predicates import validate_url
from .textual import normalize_url


def _rank(host: str, path: str) -> str:
    return hashlib.md5(f"42{host}{path}".encode()).hexdigest()


def sample_urls(
    input_urls: list[str],
    samplesize: int,
    exclude_min: int | None = None,
    exclude_max: int | None = None,
    strict: bool = False,
    verbose: bool = False,
) -> list[str]:
    "Sample a list of URLs by domain name with per-host size constraints."
    hosts: dict[str, list[str]] = {}
    seen: set[tuple[str, str]] = set()
    for url in input_urls:
        if not isinstance(url, str):
            continue
        try:
            ok, parsed = validate_url(url)
            if not ok or parsed is None:
                continue
            norm = normalize_url(parsed, strict, None, True)
            host, path = get_host_and_path(norm)
        except (TypeError, ValueError):
            continue
        if (host, path) in seen:
            continue
        seen.add((host, path))
        hosts.setdefault(host, []).append(path)

    output: list[str] = []
    for host, paths in hosts.items():
        paths = [p for p in paths if p != "/"]
        if (
            not paths
            or (exclude_min is not None and len(paths) < exclude_min)
            or (exclude_max is not None and len(paths) > exclude_max)
        ):
            continue
        if len(paths) > samplesize:
            picked = sorted(
                sorted(paths, key=lambda p: _rank(host, p))[:samplesize]
            )
        else:
            picked = paths
        output.extend(host + p for p in picked)
    return output
