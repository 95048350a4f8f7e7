"""Round-6 session-2: estimate-attach A/B at bench scale.

Variants of the signature-estimate prefilter in verify_pairs_jaccard:
  A) production: attach full array<long> signatures, zip_with equality
  B) int32-truncated signatures for the attach (estimate can only
     rise on 32-bit collisions -> prefilter passes a superset ->
     exact-verify output unchanged)
  C) full verify chain with each variant

Every section runs twice (cold, warm).
Usage: python tools/exp_r06_estattach.py [n_pages]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench  # noqa: E402
from courlan_spark.plans.session import get_session  # noqa: E402


def noop2(sc, label, df):
    sc.setJobDescription(label)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    t1 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    t2 = time.perf_counter()
    return [round(t1 - t0, 2), round(t2 - t1, 2)]


def main() -> None:
    from pyspark.sql import functions as F

    from courlan_spark.operators import dedup
    from courlan_spark.operators.fingerprints import fused_fingerprints
    from courlan_spark.sources.pages import generate_pages

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_session(app_name="exp-estattach", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    bench._warm_workers(spark, cpus)

    corpus_dir = tempfile.mkdtemp(prefix="expest_corpus_")
    generate_pages(spark, n_pages).write.mode("overwrite").parquet(corpus_dir + "/pages")
    pages = spark.read.parquet(corpus_dir + "/pages")
    docs = pages.select("doc_id", "text")

    out = {
        "n_pages": n_pages,
        "cpu_probe": bench._cpu_probe(),
        "dram_probe": bench._dram_probe(),
    }
    sc = spark.sparkContext

    fp = fused_fingerprints(docs).persist()
    fp.count()
    signatures = fp.select("doc_id", "signature")
    buckets = fp.select("doc_id", F.explode("bands").alias("band_key"))

    cands, _ = dedup.lsh_candidate_pairs(
        signatures, max_bucket_size=1000, buckets=buckets
    )
    cands = cands.persist()
    sc.setJobDescription("materialize candidates")
    out["n_candidates"] = cands.count()

    def est_frame(sig_frame, sig_cast=None):
        sigs = sig_frame
        if sig_cast is not None:
            sigs = sig_frame.select(
                "doc_id", F.transform("signature", sig_cast).alias("signature")
            )
        est = dedup.attach_pair_payloads(
            cands, sigs, "doc_id", "signature", "sig_a", "sig_b"
        ).withColumn(
            "est_jaccard",
            F.aggregate(
                F.zip_with("sig_a", "sig_b", lambda a, b: (a == b).cast("int")),
                F.lit(0),
                lambda acc, x: acc + x,
            ).cast("double")
            / F.size("sig_a"),
        )
        return est.where(F.col("est_jaccard") >= F.lit(0.4)).select(
            "doc_a", "doc_b"
        )

    out["A_est_long"] = noop2(sc, "A est full long sigs", est_frame(signatures))
    out["B_est_int32"] = noop2(
        sc,
        "B est int32 sigs",
        est_frame(signatures, sig_cast=lambda x: F.hash(x)),
    )
    sc.setJobDescription("counts")
    out["A_pass"] = est_frame(signatures).count()
    out["B_pass"] = est_frame(signatures, sig_cast=lambda x: F.hash(x)).count()

    # jaccard verify alone on the A-prefiltered pairs
    pre = est_frame(signatures).persist()
    pre.count()
    jac = dedup.make_hash = None  # noqa
    from courlan_spark.functions import hashing

    jaccard_udf = hashing.make_jaccard_udf()
    paired = dedup.attach_pair_payloads(pre, docs, "doc_id", "text", "text_a", "text_b")
    paired = paired.repartition(sc.defaultParallelism, "doc_a")
    verified = (
        paired.withColumn("jaccard", jaccard_udf("text_a", "text_b"))
        .where(F.col("jaccard") >= 0.6)
        .select("doc_a", "doc_b")
    )
    out["C_jaccard_verify"] = noop2(sc, "C jaccard verify after prefilter", verified)

    out["cpu_probe_post"] = bench._cpu_probe()
    out["dram_probe_post"] = bench._dram_probe()
    print(json.dumps(out))
    spark.stop()
    import shutil

    shutil.rmtree(corpus_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
