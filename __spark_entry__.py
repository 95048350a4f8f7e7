"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship near-dup pipeline slice on sf0.001.
queries()      — operator catalog (SURVEY.md §2 + training-data ops),
                 implemented in courlan_spark.plans.catalog.
oracle_sql()   — DuckDB ground-truth SQL for EVERY query (45/45): the
                 kernel surfaces (MinHash/SimHash/LSH/suffix/ANN/
                 removal) are checked against independent re-derivations
                 (rolling-hash shingles, splitmix64 in HUGEINT
                 arithmetic, 63-gram diagonal runs, recursive-CTE
                 components, exact cosine top-k) — for the
                 probabilistic paths the oracle is the exact answer,
                 so the comparison also audits recall.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: MinHash -> LSH -> Jaccard verify -> connected
    components over the sf0.001 documents corpus; returns per-cluster
    sizes joined back to sample doc ids."""
    from pyspark.sql import functions as F

    from courlan_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    signatures = dedup.minhash_signatures(docs)
    pairs, _ = dedup.lsh_candidate_pairs(signatures)
    verified = dedup.verify_pairs_jaccard(
        pairs, docs, signatures=signatures, threshold=0.5
    )
    clusters = dedup.cluster_assignments(docs, verified.select("doc_a", "doc_b"))
    return (
        clusters.groupBy("cluster_id")
        .agg(F.count("*").alias("cluster_size"), F.min("doc_id").alias("min_doc_id"))
        .orderBy(F.col("cluster_size").desc(), F.col("cluster_id").asc())
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from courlan_spark.plans.catalog import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from courlan_spark.plans.catalog import ORACLES

    return {name: sql for name, sql in ORACLES.items() if sql is not None}
