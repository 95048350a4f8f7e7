"""North-rule cluster-assignment evidence, measured against a real
single-node referent instead of planted truth: a brute-force ALL-PAIRS
model — scalar check_url, exact URL dedup, exact-text equality, exact
Jaccard over every surviving pair (NO LSH, no signature estimate, no
candidate generation anywhere), brute-force SimHash hamming, driver
union-find — produces the reference cluster assignments at the same
shingle/signature config, and the distributed pipeline must match
them with dup-pair recall AND precision >= 0.99
(/root/repo/BASELINE.json north_rule; the reference repo publishes no
dedup pipeline of its own, so the same-config single-node brute-force
run IS the referent — it cannot share the distributed path's recall
bugs because it never generates candidates).

The substring stage is disabled on both sides: its O(n^2 * LCS) brute
referent is prohibitive at this n, and the stage has its own
brute-force model checks (tests/test_spark_operators.py) and oracle
queries (q_substring_pairs / q_suffix_array_pass).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from courlan_spark.functions import hashing as H
from courlan_spark.plans.pipeline import DedupConfig, DedupPipeline
from courlan_spark.sources.pages import generate_pages
from courlan_spark.urlkit.check import check_url

N_PAGES = 600
CFG = DedupConfig(with_substring_stage=False, snapshot_mode="minimal")


class _UnionFind:
    def __init__(self):
        self.parent = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != self.parent[p]:
            self.parent[p] = self.parent[self.parent[p]]
            p = self.parent[p]
        self.parent[x] = p
        return p

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min-root union so labels are min doc_id, like the engine
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


def _model_assignments(rows) -> dict[int, int]:
    """doc_id -> cluster_id (min doc_id in component) from the
    brute-force single-node referent."""
    # scalar check_url + exact URL dedup, min (warc_ts, doc_id) wins —
    # the pipeline's survivor rule, replicated independently
    survivor: dict[str, tuple] = {}
    for r in rows:
        res = check_url(r.url, strict=CFG.strict, language=CFG.language)
        if res is None:
            continue
        cand = (r.warc_ts, r.doc_id, r.text if r.text is not None else "")
        prev = survivor.get(res[0])
        if prev is None or cand[:2] < prev[:2]:
            survivor[res[0]] = cand
    docs = {doc_id: text for (_ts, doc_id, text) in survivor.values()}

    ids = sorted(docs)
    shingles = {
        i: frozenset(H.shingle_hashes(docs[i], CFG.shingle_k).tolist())
        for i in ids
    }
    simhash = {i: H.simhash64(docs[i], CFG.shingle_k) for i in ids}

    uf = _UnionFind()
    for i in ids:
        uf.find(i)
    for ai in range(len(ids)):
        a = ids[ai]
        sa, ha, ta = shingles[a], simhash[a], docs[a]
        for b in ids[ai + 1:]:
            if docs[b] == ta:
                uf.union(a, b)
                continue
            sb = shingles[b]
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            jac = inter / union if union else 1.0
            if jac >= CFG.jaccard_threshold:
                uf.union(a, b)
                continue
            if bin(ha ^ simhash[b]).count("1") <= CFG.simhash_max_hamming:
                uf.union(a, b)
    return {i: uf.find(i) for i in ids}


def _co_pairs(assign: dict[int, int]) -> set[tuple[int, int]]:
    by_cluster: dict[int, list[int]] = {}
    for doc, c in assign.items():
        by_cluster.setdefault(c, []).append(doc)
    pairs = set()
    for members in by_cluster.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.add((members[i], members[j]))
    return pairs


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("model_corpus") / "pages")
    generate_pages(spark, N_PAGES).write.mode("overwrite").parquet(path)
    return path


def test_pipeline_matches_brute_force_single_node_clusters(
    spark, corpus, tmp_path
):
    pages = spark.read.parquet(corpus)
    # the engine keys docs by xxhash64(url, warc_ts) — content-derived
    # and order-independent, so the referent can reproduce identities
    rows = pages.select(
        F.xxhash64("url", "warc_ts").alias("doc_id"),
        "url", "warc_ts", "text",
    ).collect()
    model = _model_assignments(rows)

    pipe = DedupPipeline(spark, str(tmp_path / "work"), CFG, count_rows=False)
    pipe.run(pages.select("url", "warc_ts", "html", "text", "lang"))
    out = spark.read.parquet(str(tmp_path / "work" / "09_assignments"))
    engine = {
        r.doc_id: r.cluster_id
        for r in out.select("doc_id", "cluster_id").collect()
    }

    # both sides must dedup to the same surviving document set
    assert set(engine) == set(model)

    truth = _co_pairs(model)
    pred = _co_pairs(engine)
    assert truth, "referent found no duplicate pairs — corpus degenerate"
    recall = len(truth & pred) / len(truth)
    precision = len(truth & pred) / len(pred) if pred else 1.0
    assert recall >= 0.99, (
        f"dup-pair recall vs single-node referent {recall:.4f} < 0.99 "
        f"(missing: {sorted(truth - pred)[:5]})"
    )
    assert precision >= 0.99, (
        f"dup-pair precision vs single-node referent {precision:.4f} < 0.99 "
        f"(extra: {sorted(pred - truth)[:5]})"
    )
    # the strongest pin, and currently true: the distributed pipeline's
    # ENTIRE doc_id -> cluster_id map is identical to the referent's
    # (deterministic corpus, seed 42).  The north-rule gate is the
    # >=0.99 above; if a future change trades exactness for speed this
    # line is the one to consciously relax.
    assert engine == model
