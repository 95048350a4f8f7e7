"""Deterministic synthetic Common-Crawl-style pages + planted truth.

Generates the north-rule input shape (/root/repo/BASELINE.json:15):

    pages(url string, warc_ts timestamp, html binary, text string,
          lang string)

plus a ``dup_truth(doc_id, url, cluster_id, dup_kind)`` table of
planted duplicate clusters for recall measurement (FIXTURES.md §1/§4).

Every row is a pure function of (seed, doc_id): generation runs
distributed via mapInPandas over spark.range with no cross-row state,
so the same corpus materializes identically at any partitioning and
any scale — the property that lets the recall gate and the two-
parallelism scaling run use the same input.

Skew: hub hosts each hold ~1-4% of rows (explicit salting exercise);
the tail is ~n_pages/40 small hosts.  Duplicate structure: docs are
grouped in fours; each group draws one kind —
exact_url / exact_text / near_minhash / near_simhash / substring /
none — weighted so ~35% of docs are duplicates of some form.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pandas as pd

SEED = 42
GROUP = 4

_WORDS_EN = (
    "the quick brown fox jumps over lazy dog water light house garden "
    "mountain river story market value press report state nation city "
    "school music history science people family moment question answer "
    "window border travel winter summer spring autumn silver golden "
    "stone bridge forest village harbor island valley meadow shadow"
).split()
_WORDS_DE = (
    "der die das und nicht mit sich auf für werden haben wasser licht "
    "haus garten berg fluss geschichte markt wert presse bericht staat "
    "nation stadt schule musik wissenschaft menschen familie moment "
    "frage antwort fenster grenze reise winter sommer herbst silber "
    "stein brücke wald dorf hafen insel tal wiese schatten morgen"
).split()
# Expand each base bank to ~2000 distinct tokens (suffix-numbered
# variants).  A tiny vocabulary makes *unrelated* documents share most
# of their 9-char shingles, flooding LSH/SimHash/winnowing with false
# candidates that real web text does not produce.
def _expand(bank: list[str], factor: int = 40) -> list[str]:
    return [w if i == 0 else f"{w}{i}" for w in bank for i in range(factor)]


_LANG_BANKS = {"en": _expand(_WORDS_EN), "de": _expand(_WORDS_DE)}
_LANGS = ["en", "de", "fr", "es", "it"]
_LANG_WEIGHTS = [0.38, 0.38, 0.10, 0.08, 0.06]

_HUBS = [
    "https://hub-news.example.com",
    "https://hub-shop.example.org",
    "https://hub-blog.example.net",
]
_HUB_WEIGHT = 0.09  # combined share of rows on hub hosts

_KINDS = ["none", "exact_url", "exact_text", "near_minhash", "near_simhash", "substring"]
_KIND_WEIGHTS = [0.65, 0.07, 0.07, 0.08, 0.07, 0.06]

# raw-URL decorations that normalize away (exact_url variants).
# NB: uppercase-scheme forms are deliberately absent — check_url's
# basic_filter is case-sensitive (startswith("http")) and rejects
# them, in the engine and the reference alike.
_URL_VARIANTS = [
    lambda u: u,
    lambda u: u + "?utm_source=feed&utm_medium=rss",
    lambda u: u + "#gclid=abc123",
    lambda u: u.replace(".com/", ".com:443/", 1)
    .replace(".org/", ".org:443/", 1)
    .replace(".net/", ".net:443/", 1),
]

_EPOCH = datetime(2025, 1, 1)


def _rng(*key: int) -> np.random.Generator:
    return np.random.default_rng([SEED, *key])


def _gen_text(rng: np.random.Generator, lang: str, n_tokens: int) -> str:
    bank = _LANG_BANKS.get(lang, _WORDS_EN)
    return " ".join(rng.choice(bank, size=n_tokens))


def _host_for(rng: np.random.Generator, n_hosts: int) -> str:
    if rng.random() < _HUB_WEIGHT:
        return _HUBS[int(rng.integers(0, len(_HUBS)))]
    idx = int(rng.integers(0, n_hosts))
    tld = ("com", "org", "net", "de", "co.uk")[idx % 5]
    return f"https://site{idx}.example-{idx % 7}.{tld}"


def _page_html(url: str, text_head: str, neighbors: list[str]) -> bytes:
    anchors = "".join(
        f'<a href="{n}">{i}</a>' for i, n in enumerate(neighbors)
    )
    extra = (
        '<a href="/tag/news/" rel="nofollow">t</a>'
        '<a href="/impressum">i</a>'
        f'<a hreflang="de-DE" href="{url}?lang=de">de</a>'
    )
    return (
        f"<html><head><title>doc</title></head><body><p>{text_head}</p>"
        f"{anchors}{extra}</body></html>"
    ).encode("utf-8")


def generate_batch(doc_ids: np.ndarray, n_hosts: int) -> pd.DataFrame:
    "Generate pages + truth columns for a vector of doc ids."
    rows = []
    for doc_id in doc_ids:
        doc_id = int(doc_id)
        group = doc_id // GROUP
        member = doc_id % GROUP
        g_rng = _rng(group, 7)
        kind = str(g_rng.choice(_KINDS, p=_KIND_WEIGHTS))
        lang = str(g_rng.choice(_LANGS, p=_LANG_WEIGHTS))
        base_tokens = int(g_rng.integers(40, 260))
        base_text = _gen_text(_rng(group, 11), lang, base_tokens)
        host = _host_for(g_rng, n_hosts)

        i_rng = _rng(doc_id, 13)

        if kind == "none":
            # independent docs: own text, own host/url
            host = _host_for(i_rng, n_hosts)
            lang = str(i_rng.choice(_LANGS, p=_LANG_WEIGHTS))
            text = _gen_text(i_rng, lang, int(i_rng.integers(40, 260)))
            url = f"{host}/articles/{doc_id}"
            cluster = doc_id
        elif kind == "exact_url":
            # same canonical URL + text, different raw decorations
            canonical = f"{host}/story/{group}"
            url = _URL_VARIANTS[member % len(_URL_VARIANTS)](canonical)
            text = base_text
            cluster = group * GROUP
        elif kind == "exact_text":
            text = base_text
            url = f"{_host_for(i_rng, n_hosts)}/copy/{doc_id}"
            cluster = group * GROUP
        elif kind == "near_minhash":
            tokens = base_text.split()
            n_edits = max(1, len(tokens) // 20) * member
            for e in range(n_edits):
                pos = int(i_rng.integers(0, len(tokens)))
                tokens[pos] = str(_rng(doc_id, 17, e).choice(_WORDS_EN))
            text = " ".join(tokens)
            url = f"{host}/near/{group}/v{member}"
            cluster = group * GROUP
        elif kind == "near_simhash":
            text = base_text + (" tail%d" % member if member else "")
            url = f"{host}/fuzzy/{group}/v{member}"
            cluster = group * GROUP
        else:  # substring
            shared = _gen_text(_rng(group, 19), lang, 120)
            own = _gen_text(i_rng, lang, int(i_rng.integers(30, 120)))
            text = own + " " + shared
            url = f"{_host_for(i_rng, n_hosts)}/mix/{doc_id}"
            cluster = group * GROUP

        neighbors = [
            f"/articles/{int(i_rng.integers(0, max(doc_id, 1) + 1000))}"
            for _ in range(3)
        ]
        rows.append(
            {
                "doc_id": doc_id,
                "url": url,
                "warc_ts": _EPOCH + timedelta(seconds=doc_id),
                "html": _page_html(url, text[:80], neighbors),
                "text": text,
                "lang": lang,
                "cluster_id": cluster,
                "dup_kind": kind,
            }
        )
    return pd.DataFrame(rows)


PAGES_SCHEMA = (
    "doc_id long, url string, warc_ts timestamp, html binary, "
    "text string, lang string, cluster_id long, dup_kind string"
)


def generate_pages(spark, n_pages: int, n_hosts: int | None = None, partitions: int | None = None):
    """Distributed deterministic generation.

    Returns a DataFrame with both the pages columns and the truth
    columns; select the north-rule shape or the truth projection via
    ``pages_view`` / ``truth_view``.
    """
    n_hosts = n_hosts or max(n_pages // 40, 10)
    partitions = partitions or spark.sparkContext.defaultParallelism

    base = spark.range(0, n_pages, numPartitions=partitions)

    def gen(iterator):
        for pdf in iterator:
            yield generate_batch(pdf["id"].values, n_hosts)

    return base.mapInPandas(gen, schema=PAGES_SCHEMA)


def pages_view(full):
    "North-rule pages shape (BASELINE.json:15)."
    return full.select("url", "warc_ts", "html", "text", "lang")


# one long boilerplate block (>= 2x the 63-char substring threshold)
# for the hub-skew stress corpus
BOILERPLATE_BLOCK = (
    "subscribe to our newsletter for weekly updates and exclusive offers "
    "follow us on social media accept all cookies to continue browsing "
    "this site uses tracking technologies as described in our privacy "
    "policy and terms of service all rights reserved copyright notice"
)


def skew_overlay(full, hub_mod: int = 10, boiler_mod: int = 5):
    """Hub-skew STRESS variant of the synthetic corpus (round-3 judge
    item): every ``hub_mod``-th doc moves onto ONE mega host (~10% of
    rows on a single host at the default) and every ``boiler_mod``-th
    doc's text becomes the shared boilerplate block plus a tiny unique
    suffix (~20% of docs near-identical -> one flooded LSH bucket).
    Deterministic in doc_id, so both parallelism levels and reruns see
    the identical corpus."""
    from pyspark.sql import functions as F

    hub = F.concat(
        F.lit("https://mega-hub.example.com/p/"), F.col("doc_id").cast("string")
    )
    boiler = F.concat(
        F.lit(BOILERPLATE_BLOCK + " item "), F.col("doc_id").cast("string")
    )
    return full.withColumn(
        "url", F.when(F.col("doc_id") % hub_mod == 0, hub).otherwise(F.col("url"))
    ).withColumn(
        "text",
        F.when(F.col("doc_id") % boiler_mod == 0, boiler).otherwise(F.col("text")),
    )


def truth_view(full):
    "Planted duplicate-cluster ground truth (FIXTURES.md §4)."
    return full.select("doc_id", "url", "cluster_id", "dup_kind")
