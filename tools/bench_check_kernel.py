"""check_url kernel micro-benchmark: per-row scalar loop vs the
round-3 vectorized batch kernel (functions/url_udfs.check_url_batch),
single core, no Spark — the apples-to-apples number recorded in
BASELINE.md ("round 3" section).

Corpora:
  mixed  — tools/bench_reference._corpus (8 templates x 50 host mods,
           ~75% accept: the link-stream mix)
  crawl  — host-dense accepted-heavy page URLs (97 hosts, ~100%
           accept: the canonical-dedup input regime)

Usage: python tools/bench_check_kernel.py [n_urls]
Prints one JSON line with urls/sec for each (corpus, impl) and the
speedups.  Parity is asserted on every run before timing.
"""

from __future__ import annotations

import json
import sys
import time
import warnings

import pandas as pd

warnings.filterwarnings("ignore")

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from courlan_spark.functions.url_udfs import check_url_batch  # noqa: E402
from courlan_spark.urlkit import check_url  # noqa: E402
from tools.bench_reference import _corpus  # noqa: E402


def scalar_loop(urls: pd.Series) -> pd.DataFrame:
    "The round-2 UDF body: per-row check_url calls."
    norms, domains = [], []
    for url in urls:
        checked = check_url(url) if isinstance(url, str) else None
        norms.append(checked[0] if checked else None)
        domains.append(checked[1] if checked else None)
    return pd.DataFrame({"norm_url": norms, "domain": domains})


def median_rate(fn, urls: pd.Series, repeats: int = 5) -> float:
    fn(urls)  # warm regex/caches
    times = []
    for _ in range(repeats):
        started = time.perf_counter()
        fn(urls)
        times.append(time.perf_counter() - started)
    return len(urls) / sorted(times)[repeats // 2]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000
    corpora = {
        "mixed": pd.Series(_corpus(n), dtype=object),
        "crawl": pd.Series(
            [f"https://site{i % 97}.example.org/articles/{i}" for i in range(n)],
            dtype=object,
        ),
    }
    out: dict = {"n_urls": n}
    for tag, urls in corpora.items():
        expected = scalar_loop(urls)
        got = check_url_batch(urls)
        assert expected.equals(got), f"batch/scalar mismatch on {tag}"
        per_row = median_rate(scalar_loop, urls)
        batch = median_rate(check_url_batch, urls)
        out[tag] = {
            "per_row_urls_per_sec": round(per_row),
            "batch_urls_per_sec": round(batch),
            "speedup": round(batch / per_row, 2),
            "accept_rate": round(float(got["norm_url"].notna().mean()), 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
