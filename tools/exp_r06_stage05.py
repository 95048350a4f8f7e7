"""Round-6 session-2 isolation harness: decompose stage 05
(minhash verify chain) at bench scale (120k pages, local[32]).

Times, with noop sinks and labeled jobs:
  a) candidate generation alone (bucket_pair_explode from stored bands
     + distinct)
  b) candidates -> estimate prefilter (attach signatures, est_jaccard)
  c) the full verify chain (eq. to stage 05)
plus the fingerprint pass (04 analog) that the others build on
(persisted once, untimed against the sections below).

Usage: python tools/exp_r06_stage05.py [n_pages]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench  # noqa: E402  (probes)
from courlan_spark.plans.session import get_session  # noqa: E402


def noop(df) -> float:
    started = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - started, 2)


def main() -> None:
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from courlan_spark.operators import dedup
    from courlan_spark.operators.fingerprints import fused_fingerprints
    from courlan_spark.sources.pages import generate_pages, pages_view

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_session(app_name="exp-stage05", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    bench._warm_workers(spark, cpus)

    corpus_dir = tempfile.mkdtemp(prefix="exp05_corpus_")
    generate_pages(spark, n_pages).write.mode("overwrite").parquet(corpus_dir + "/pages")
    pages = spark.read.parquet(corpus_dir + "/pages")

    out = {
        "n_pages": n_pages,
        "cpu_probe": bench._cpu_probe(),
        "dram_probe": bench._dram_probe(),
    }

    sc = spark.sparkContext
    # stand-in for stages 01-02 output (url_unique): text+doc_id only
    docs = pages_view(pages).selectExpr(
        "monotonically_increasing_id() as _row"
    )
    # use the real canonical frame shape cheaply: doc_id ordinal + text
    docs = pages.select(F.col("doc_id"), "text")

    sc.setJobDescription("04 fused fingerprints (persist)")
    t0 = time.perf_counter()
    fp = fused_fingerprints(docs).persist()
    fp.count()
    out["fp_materialize_secs"] = round(time.perf_counter() - t0, 2)

    signatures = fp.select("doc_id", "signature")
    buckets = fp.select("doc_id", F.explode("bands").alias("band_key"))

    sc.setJobDescription("a) candidates only")
    obs = Observation("exp_lsh")
    cands, _ = dedup.lsh_candidate_pairs(
        signatures, max_bucket_size=1000, observation=obs, buckets=buckets
    )
    out["a_candidates_secs"] = noop(cands)
    try:
        out["a_metrics"] = dict(obs.get)
    except Exception:
        out["a_metrics"] = None

    sc.setJobDescription("b) estimate prefilter")
    cands2, _ = dedup.lsh_candidate_pairs(
        signatures, max_bucket_size=1000, buckets=buckets
    )
    est = dedup.attach_pair_payloads(
        cands2, signatures, "doc_id", "signature", "sig_a", "sig_b"
    ).withColumn(
        "est_jaccard",
        F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda a, b: (a == b).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        ).cast("double")
        / F.size("sig_a"),
    )
    prefiltered = est.where(F.col("est_jaccard") >= F.lit(0.6 - 0.2)).select(
        "doc_a", "doc_b"
    )
    out["b_prefilter_secs"] = noop(prefiltered)

    sc.setJobDescription("c) full verify chain (stage 05)")
    cands3, _ = dedup.lsh_candidate_pairs(
        signatures, max_bucket_size=1000, buckets=buckets
    )
    verified = dedup.verify_pairs_jaccard(
        cands3, docs, signatures=signatures, threshold=0.6
    )
    out["c_full_verify_secs"] = noop(verified.select("doc_a", "doc_b"))

    sc.setJobDescription("c2) full verify chain repeat (warm)")
    out["c2_repeat_secs"] = noop(verified.select("doc_a", "doc_b"))

    out["cpu_probe_post"] = bench._cpu_probe()
    out["dram_probe_post"] = bench._dram_probe()
    print(json.dumps(out))
    spark.stop()
    import shutil

    shutil.rmtree(corpus_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
