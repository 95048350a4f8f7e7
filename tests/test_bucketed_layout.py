"""Bucketed LSH layout: the candidate self-join must be exchange-free
(both sides pre-partitioned by the bucketed band_key), and results
must equal the plain shuffle path."""

from courlan_spark.operators import dedup


def test_bucketed_lsh_join_no_exchange_and_same_pairs(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    signatures = dedup.minhash_signatures(docs).cache()

    plain, _ = dedup.lsh_candidate_pairs(signatures, max_bucket_size=1000)
    plain_pairs = {(r["doc_a"], r["doc_b"]) for r in plain.collect()}

    spark.sql("DROP TABLE IF EXISTS lsh_bands_test")
    bucketed = dedup.lsh_candidate_pairs_bucketed(
        signatures, "lsh_bands_test", max_bucket_size=1000
    )
    bucketed_pairs = {(r["doc_a"], r["doc_b"]) for r in bucketed.collect()}
    assert bucketed_pairs == plain_pairs

    # the join itself must consume the bucketed table without a shuffle:
    # no Exchange between the join and the table scans
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    join_idx = plan.find("SortMergeJoin")
    assert join_idx != -1
    below_join = plan[join_idx:]
    scan_idx = below_join.find("FileScan")
    assert scan_idx != -1
    assert "Exchange" not in below_join[:scan_idx], below_join[:scan_idx]
    assert "Bucketed: true" in plan
    spark.sql("DROP TABLE IF EXISTS lsh_bands_test")
