"""Round-6 experiment: A/B the pair-payload attach shapes (guide §3).

Variants for q_embedding_neardup_lsh (VERDICT r5 item #3) and
q_minhash_lsh_pairs:

  emb_current   ids-only bucket join + explode/join/groupBy attach (r5)
  emb_bcast     ids-only bucket join + BROADCAST of the exploded pair
                side into the payload join (no payload-table shuffle)
  emb_2join     ids-only bucket join + two broadcast joins of the
                (small) vector table on doc_a / doc_b (no groupBy)
  emb_inline    r3 shape: vectors ride the bucket self-join inline

  mh_current    q_minhash_lsh_pairs as shipped
  mh_persist    signatures persisted (kernel evaluated once, not 2x)

Each timed with the noop sink, interleaved repeats.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ["PYTHONPATH"] = "/root/repo" + os.pathsep + os.environ.get("PYTHONPATH", "")

import math

from pyspark.sql import functions as F


def emb_inputs(spark, sf_dir):
    from courlan_spark.plans.catalog import _table_rows_from_metadata, _views

    _views(spark, sf_dir, "embeddings")
    emb = spark.table("embeddings")
    n = _table_rows_from_metadata(sf_dir, "embeddings") or emb.count()
    planes = max(4, math.ceil(math.log2(max(n, 64) / 32)))
    tables = 48 if n <= 600 else 16
    return emb, planes, tables


def _bucketed(emb, planes, tables):
    from courlan_spark.operators.dedup import capped_buckets
    from courlan_spark.operators.similarity import make_hyperplane_bucket_udf

    udf = make_hyperplane_bucket_udf(64, planes, tables, 42)
    bucketed = emb.select(
        F.col("vec_id").alias("vec_id"),
        F.explode(udf(F.col("embedding"))).alias("bucket"),
    )
    bucketed, _ = capped_buckets(bucketed, "bucket", 2000)
    left = bucketed.select("bucket", F.col("vec_id").alias("doc_a"))
    right = bucketed.select("bucket", F.col("vec_id").alias("doc_b"))
    return (
        left.join(right, "bucket")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def _finish(paired):
    from courlan_spark.operators.similarity import _cosine_expr

    cos = F.round(_cosine_expr(F.col("va"), F.col("vb")), 4)
    return (
        paired.withColumn("cosine", cos)
        .where(F.col("cosine") >= 0.35)
        .select(F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b"), "cosine")
    )


def emb_current(spark, sf_dir):
    from courlan_spark.plans.catalog import q_embedding_neardup_lsh

    return q_embedding_neardup_lsh(spark, sf_dir)


def emb_bcast(spark, sf_dir):
    emb, planes, tables = emb_inputs(spark, sf_dir)
    pairs = _bucketed(emb, planes, tables)
    vecs = emb.select(F.col("vec_id").alias("_pid"), F.col("embedding").alias("_payload"))
    tagged = pairs.select(
        "doc_a", "doc_b", F.explode(F.array("doc_a", "doc_b")).alias("_pid")
    )
    paired = (
        F.broadcast(tagged).join(vecs, "_pid")
        .groupBy("doc_a", "doc_b")
        .agg(
            F.max(F.when(F.col("_pid") == F.col("doc_a"), F.col("_payload"))).alias("va"),
            F.max(F.when(F.col("_pid") == F.col("doc_b"), F.col("_payload"))).alias("vb"),
        )
    )
    return _finish(paired)


def emb_2join(spark, sf_dir):
    emb, planes, tables = emb_inputs(spark, sf_dir)
    pairs = _bucketed(emb, planes, tables)
    va = emb.select(F.col("vec_id").alias("doc_a"), F.col("embedding").alias("va"))
    vb = emb.select(F.col("vec_id").alias("doc_b"), F.col("embedding").alias("vb"))
    paired = pairs.join(F.broadcast(va), "doc_a").join(F.broadcast(vb), "doc_b")
    return _finish(paired)


def emb_inline(spark, sf_dir):
    from courlan_spark.operators.dedup import bucket_pair_explode
    from courlan_spark.operators.similarity import make_hyperplane_bucket_udf

    emb, planes, tables = emb_inputs(spark, sf_dir)
    udf = make_hyperplane_bucket_udf(64, planes, tables, 42)
    bucketed = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").alias("vec"),
        F.explode(udf(F.col("embedding"))).alias("bucket"),
    )
    pairs = bucket_pair_explode(
        bucketed, "bucket", 2000, payload_col="vec", out_payload=("va", "vb")
    ).dropDuplicates(["doc_a", "doc_b"])
    return _finish(pairs)


def mh_current(spark, sf_dir):
    from courlan_spark.plans.catalog import q_minhash_lsh_pairs

    return q_minhash_lsh_pairs(spark, sf_dir)


def mh_persist(spark, sf_dir):
    from courlan_spark.operators import dedup
    from courlan_spark.plans.catalog import _views

    _views(spark, sf_dir, "documents")
    docs = spark.table("documents")
    sigs = dedup.minhash_signatures(docs).persist()
    pairs, _ = dedup.lsh_candidate_pairs(sigs)
    return dedup.verify_pairs_jaccard(pairs, docs, signatures=sigs, threshold=0.5)


VARIANTS = {
    "emb_current": emb_current,
    "emb_bcast": emb_bcast,
    "emb_2join": emb_2join,
    "emb_inline": emb_inline,
    "mh_current": mh_current,
    "mh_persist": mh_persist,
}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    which = sys.argv[2].split(",") if len(sys.argv) > 2 else list(VARIANTS)
    repeats = int(os.environ.get("EXP_REPEATS", "3"))

    from bench import _warm_workers

    from courlan_spark.plans.session import get_session

    spark = get_session(app_name="exp-attach", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    _warm_workers(spark, 32)

    samples: dict[str, list[float]] = {k: [] for k in which}
    counts: dict[str, int] = {}
    for rep in range(repeats):
        for name in which:
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            df = VARIANTS[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.time() - t0, 3))
            if rep == 0:
                counts[name] = VARIANTS[name](spark, sf_dir).count()
    for name in which:
        s = samples[name]
        print(f"{name}: n={counts[name]} min={min(s)} med={statistics.median(s)} {s}")
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
