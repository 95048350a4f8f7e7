"""Physical-plan assertions for the round-2 shuffle-count claims.

These lock in the architecture, not the timings: if a refactor
reintroduces a window+self-join candidate stage or a double payload
join, the Exchange counts change and these tests fail.
"""

from pyspark.sql import functions as F

from courlan_spark.operators import dedup


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_bucket_pair_explode_single_aggregation(spark):
    """Candidate generation is ONE hash aggregation over the bucket
    key: no join and no window in the plan (the round-1 shape cost a
    window shuffle+sort plus a sort-merge self-join)."""
    df = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 37).alias("k")
    )
    pairs = dedup.bucket_pair_explode(df, "k", 500)
    plan = _optimized(pairs)
    assert "Join" not in plan
    assert "Window" not in plan
    physical = _plan(pairs)
    # exactly the one exchange that partitions bucket members by key
    assert physical.count("Exchange") == 1


def test_attach_pair_payloads_single_table_pass(spark):
    """Both pair sides fetch their payload through ONE reference to the
    payload table (round 1 joined the heavy table twice)."""
    pairs = spark.range(0, 100).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1000).alias("doc_b")
    )
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("t"), "id").alias("text")
    )
    out = dedup.attach_pair_payloads(pairs, docs, "doc_id", "text", "ta", "tb")
    optimized = _optimized(out)
    # the docs range appears once in the logical plan (one scan/shuffle
    # of the payload table), and exactly one join total
    assert optimized.count("Range (0, 2000") == 1
    assert optimized.count("Join") == 1


def test_lsh_candidates_no_self_join(spark):
    "The banded-LSH candidate path inherits the no-join shape."
    docs = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text body number "), (F.col("id") % 40)).alias("text"),
    )
    sigs = dedup.minhash_signatures(docs)
    pairs, _ = dedup.lsh_candidate_pairs(sigs, max_bucket_size=100)
    plan = _optimized(pairs)
    assert "Join" not in plan
