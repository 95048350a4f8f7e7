"""Single-node throughput: reference library vs this engine.

The reference's third-party deps (babel, tld) are not installed in
this container, so the reference package cannot import as-is.  This
harness injects *shim modules* that reproduce exactly the behavior
our parity layer implements (CLDR locale tables, embedded PSL), then
imports the reference from /root/reference and times its check_url
against: (a) our scalar check_url on one core, and (b) our Spark UDF
at N cores.

The shims only affect the locale-scoring and registrable-domain
fallback paths — the same substitutions our engine makes — so the
comparison measures the URL-processing engines, not the shims.

Usage: python tools/bench_reference.py [n_urls]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
import types

sys.path.insert(0, "/root/repo")


def _install_shims() -> None:
    from courlan_spark.urlkit.locales import _parse_language
    from courlan_spark.urlkit.psl import registrable_domain

    # ---- babel shim -----------------------------------------------------
    babel = types.ModuleType("babel")

    class UnknownLocaleError(Exception):
        pass

    class Locale:
        def __init__(self, language: str):
            self.language = language

        @classmethod
        def parse(cls, identifier, sep="_"):
            if not isinstance(identifier, str):
                raise TypeError(identifier)
            lang = _parse_language(identifier)
            if lang is None:
                raise UnknownLocaleError(identifier)
            return cls(lang)

    babel.Locale = Locale
    babel.UnknownLocaleError = UnknownLocaleError
    sys.modules["babel"] = babel

    # ---- tld shim --------------------------------------------------------
    tld = types.ModuleType("tld")

    class Result:
        def __init__(self, domain: str, fld: str):
            self.domain = domain
            self.fld = fld

    def get_tld(url, as_object=False, fail_silently=False, **_kw):
        resolved = registrable_domain(url)
        if resolved is None:
            if fail_silently:
                return None
            raise ValueError(url)
        label, fld = resolved
        return Result(label, fld) if as_object else fld

    tld.Result = Result
    tld.get_tld = get_tld
    sys.modules["tld"] = tld

    # urllib3 only matters for the network path, which we never touch
    if "urllib3" not in sys.modules:
        try:
            import urllib3  # noqa: F401
        except ImportError:
            stub = types.ModuleType("urllib3")

            class _Pool:
                def __init__(self, *a, **k):
                    raise RuntimeError("network disabled in bench")

            stub.PoolManager = _Pool
            stub.Timeout = lambda *a, **k: None
            stub.util = types.SimpleNamespace(Retry=lambda *a, **k: None)
            sys.modules["urllib3"] = stub


def _corpus(n: int) -> list[str]:
    bank = [
        "https://news.example{k}.com/articles/{i}",
        "https://news.example{k}.com/articles/{i}?utm_source=feed&utm_medium=rss",
        "https://shop{k}.example.org/item/{i}#gclid=tracker",
        "http://blog.example{k}.net/{i}/feed",
        "https://www.example{k}.com/wp-admin/page-{i}",
        "https://sub{k}.domain.co.uk/x/{i}",
        "https://www.dwds.de:443/artikel/{i}",
        "https://test{k}.org/page?id={i}&clickid=zzz",
    ]
    return [
        bank[i % len(bank)].format(i=i, k=i % 50) for i in range(n)
    ]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    urls = _corpus(n)

    _install_shims()
    sys.path.insert(0, "/root/reference")
    from courlan.core import check_url as reference_check  # noqa: E402

    from courlan_spark.urlkit import check_url as engine_check  # noqa: E402

    # agreement spot-check before timing
    disagreements = sum(
        1 for u in urls[:5000] if reference_check(u) != engine_check(u)
    )

    started = time.time()
    ref_accepted = sum(1 for u in urls if reference_check(u) is not None)
    ref_secs = time.time() - started

    started = time.time()
    eng_accepted = sum(1 for u in urls if engine_check(u) is not None)
    eng_secs = time.time() - started

    print(
        json.dumps(
            {
                "n_urls": n,
                "disagreements_in_5000": disagreements,
                "reference_single_core": {
                    "secs": round(ref_secs, 2),
                    "urls_per_sec": round(n / ref_secs),
                    "accepted": ref_accepted,
                },
                "engine_single_core": {
                    "secs": round(eng_secs, 2),
                    "urls_per_sec": round(n / eng_secs),
                    "accepted": eng_accepted,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
