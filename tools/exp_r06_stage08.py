"""Round-6 session-2: what does the 08_clusters serial segment pay?

Replicates 08's eager actions at bench scale from a cached url_unique:
  (i)  text_pairs (stage-03 chain) noop — the ephemeral recompute 08
       pays inside its evidence-checkpoint job
  (ii) evidence distinct + localCheckpoint + toPandas (the bounded-CC
       prologue) over text_pairs alone
  (iii) driver union-find + createDataFrame + checkpoint
  (iv) the 09-style join materialization

Usage: python tools/exp_r06_stage08.py [n_pages]
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


def main() -> None:
    from pyspark.sql import functions as F

    from courlan_spark.operators import dedup
    from courlan_spark.sources.pages import generate_pages

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_session(app_name="exp-stage08", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    bench._warm_workers(spark, cpus)

    corpus_dir = tempfile.mkdtemp(prefix="exp08_corpus_")
    generate_pages(spark, n_pages).write.mode("overwrite").parquet(corpus_dir + "/pages")
    pages = spark.read.parquet(corpus_dir + "/pages")

    out = {
        "n_pages": n_pages,
        "cpu_probe": bench._cpu_probe(),
        "dram_probe": bench._dram_probe(),
    }
    sc = spark.sparkContext

    # stand-in for the 02 cache: doc_id + text persisted
    url_unique = pages.select("doc_id", "text").persist()
    sc.setJobDescription("fill url_unique cache")
    url_unique.count()

    def build_text_pairs():
        hashed = url_unique.select(
            "doc_id", F.md5(F.coalesce("text", F.lit(""))).alias("text_hash")
        )
        reps = hashed.groupBy("text_hash").agg(F.min("doc_id").alias("rep"))
        return (
            hashed.join(reps, "text_hash")
            .where(F.col("doc_id") != F.col("rep"))
            .select(F.col("rep").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        )

    def t(label, fn):
        sc.setJobDescription(label)
        t0 = time.perf_counter()
        r = fn()
        out[label] = round(time.perf_counter() - t0, 2)
        return r

    t("i_text_pairs_noop_cold", lambda: build_text_pairs().write.format("noop").mode("overwrite").save())
    t("i_text_pairs_noop_warm", lambda: build_text_pairs().write.format("noop").mode("overwrite").save())

    edges = build_text_pairs().select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    ck = t("ii_distinct_checkpoint", lambda: edges.selectExpr(
        "cast(src as long) src", "cast(dst as long) dst"
    ).where(F.col("src") != F.col("dst")).distinct().localCheckpoint())
    pdf = t("ii_toPandas", lambda: ck.limit(200_001).toPandas())
    out["n_edges"] = len(pdf)

    def uf():
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for a, b in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return [(n, find(n)) for n in parent]

    data = t("iii_union_find", uf)
    import pandas as pd

    comp = t("iii_createDataFrame_ckpt", lambda: spark.createDataFrame(
        pd.DataFrame(data, columns=["node", "component"]).astype("int64")
    ).localCheckpoint())

    assigned = (
        url_unique.select("doc_id")
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("component", "doc_id"))
        .select("doc_id", "cluster_id")
    )
    t("iv_assign_join_noop", lambda: assigned.write.format("noop").mode("overwrite").save())

    # the real thing end to end for reference
    t("full_cluster_assignments_noop", lambda: dedup.cluster_assignments(
        url_unique, build_text_pairs()
    ).write.format("noop").mode("overwrite").save())

    out["cpu_probe_post"] = bench._cpu_probe()
    out["dram_probe_post"] = bench._dram_probe()
    print(json.dumps(out))
    spark.stop()
    import shutil

    shutil.rmtree(corpus_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
