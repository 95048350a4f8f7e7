"""Round-6 session-2: candidate-stage decomposition at bench scale.

Each section runs twice (cold plan, then warm repeat) so plan/codegen
overhead is separated from steady-state compute.

Usage: python tools/exp_r06_stage05b.py [n_pages]
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
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from courlan_spark.operators import dedup
    from courlan_spark.operators.fingerprints import fused_fingerprints
    from courlan_spark.sources.pages import generate_pages

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_session(app_name="exp-stage05b", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    bench._warm_workers(spark, cpus)

    corpus_dir = tempfile.mkdtemp(prefix="exp05b_corpus_")
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
    t0 = time.perf_counter()
    fp.count()
    out["fp_materialize_secs"] = round(time.perf_counter() - t0, 2)

    buckets = fp.select("doc_id", F.explode("bands").alias("band_key"))
    out["explode_only"] = noop2(sc, "explode bands", buckets)

    w = Window.partitionBy("band_key")
    sized = buckets.withColumn("_bsz", F.count(F.lit(1)).over(w))
    out["window_count_only"] = noop2(sc, "window count", sized)

    sized_rn = sized.withColumn(
        "_brn", F.row_number().over(w.orderBy("doc_id"))
    )
    out["window_count_rownum"] = noop2(sc, "window count+rownum", sized_rn)

    bounded = sized.where((F.col("_bsz") >= 2) & (F.col("_bsz") <= 1000))
    grouped = bounded.groupBy("band_key").agg(
        F.array_sort(F.collect_list(F.col("doc_id"))).alias("ids")
    )
    out["grouped"] = noop2(sc, "window+filter+collect_list", grouped)

    pair_expr = F.explode(
        F.flatten(
            F.transform(
                "ids",
                lambda x, i: F.transform(
                    F.slice(F.col("ids"), i + F.lit(2), F.size(F.col("ids"))),
                    lambda y: F.struct(x.alias("a"), y.alias("b")),
                ),
            )
        )
    ).alias("p")
    pairs = grouped.select(pair_expr).where(F.col("p.a") < F.col("p.b")).select(
        F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b")
    )
    out["pairs_nodistinct"] = noop2(sc, "pairs before distinct", pairs)
    out["pairs_distinct"] = noop2(sc, "pairs distinct", pairs.distinct())

    # full production candidates (with row_number accounting path)
    cands, _ = dedup.lsh_candidate_pairs(
        fp.select("doc_id", "signature"), max_bucket_size=1000, buckets=buckets
    )
    out["full_candidates"] = noop2(sc, "full candidates", cands)

    # pair volume facts
    sc.setJobDescription("counts")
    out["n_membership_rows"] = buckets.count()
    out["n_pairs_predistinct"] = pairs.count()
    out["n_pairs_distinct"] = pairs.distinct().count()

    out["cpu_probe_post"] = bench._cpu_probe()
    out["dram_probe_post"] = bench._dram_probe()
    print(json.dumps(out))
    spark.stop()
    import shutil

    shutil.rmtree(corpus_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
