"""Pipeline edge cases: boilerplate storms and degenerate inputs."""

import shutil
import tempfile
from datetime import datetime, timedelta

from courlan_spark.plans.pipeline import DedupConfig, DedupPipeline


def _pages(spark, rows):
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


def test_identical_text_storm_clusters_to_one(spark):
    "200 copies of one text: every dedup path hits its bucket caps, but the exact-text evidence alone must still produce a single cluster."
    base = datetime(2025, 1, 1)
    rows = [
        (
            f"https://copy{i % 19}.example.org/a/{i}",
            base + timedelta(seconds=i),
            b"<html></html>",
            "exactly the same boilerplate text repeated across the whole site "
            "family with nothing else in it at all",
            "en",
        )
        for i in range(200)
    ]
    workdir = tempfile.mkdtemp(prefix="edge_storm_")
    try:
        pipe = DedupPipeline(
            spark,
            workdir,
            DedupConfig(jaccard_threshold=0.6, max_bucket_size=20),
        )
        summary = pipe.run(_pages(spark, rows))
        assert summary["n_output"] == 200
        clusters = pipe.assignments().select("cluster_id").distinct().count()
        assert clusters == 1
        assert summary["observed"]["canonical_rows"]["rows"] == 200
        assert summary["observed"]["evidence_pairs"]["rows"] >= 199
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_all_urls_rejected(spark):
    "A corpus where check_url rejects everything yields an empty, non-crashing run."
    base = datetime(2025, 1, 1)
    rows = [
        ("not-a-url-%d" % i, base, b"", "text %d" % i, "en") for i in range(10)
    ]
    workdir = tempfile.mkdtemp(prefix="edge_empty_")
    try:
        pipe = DedupPipeline(spark, workdir, DedupConfig())
        summary = pipe.run(_pages(spark, rows))
        assert summary["n_output"] == 0
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
