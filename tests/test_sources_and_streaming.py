"""URL-file ingestion, two-sink split, frontier persistence/pull, and
the Structured Streaming frontier ingest."""

import os
import shutil
import tempfile
from datetime import datetime

from pyspark.sql import functions as F

from courlan_spark.operators import frontier
from courlan_spark.sources.urlfile import (
    check_urls,
    read_url_list,
    split_valid_discarded,
    write_two_sinks,
)

# reference golden input shape (tests/data/input.txt + discard cases
# from unit_tests.py:1291-1305)
INPUT_LINES = [
    "https://example.org/valid",
    "http://ab",
    "not-a-url",
    "https://www.dwds.de/de/article-1",
    "http://media.example.com/video.avi",
    "",
]


def test_url_list_two_sink_split(spark, tmp_path):
    src = tmp_path / "input.txt"
    src.write_text("\n".join(INPUT_LINES) + "\n")
    urls = read_url_list(spark, str(src))
    assert urls.count() == 5  # blank line dropped

    checked = check_urls(urls)
    valid, discarded = split_valid_discarded(checked)
    valid_urls = {r["url"] for r in valid.collect()}
    discarded_urls = {r["url"] for r in discarded.collect()}
    assert "https://example.org/valid" in valid_urls
    assert "http://ab" in discarded_urls
    assert "not-a-url" in discarded_urls
    assert "http://media.example.com/video.avi" in discarded_urls

    out = tmp_path / "out"
    disc = tmp_path / "disc"
    write_two_sinks(checked, str(out), str(disc))
    out_lines = set()
    for name in os.listdir(out):
        if name.startswith("part-"):
            out_lines |= set((out / name).read_text().splitlines())
    assert "https://example.org/valid" in out_lines


def test_rate_limited_pull_and_persistence(spark, tmp_path):
    rows = [
        ("https://a.org", "/1", False, 1, 0, datetime(2025, 1, 1, 0, 0, 0)),
        ("https://a.org", "/2", False, 2, 0, datetime(2025, 1, 1, 0, 0, 0)),
        ("https://b.org", "/1", False, 3, 0, datetime(2025, 1, 1, 0, 0, 50)),
        ("https://c.org", "/1", False, 4, 0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "host string, path string, visited boolean, seq long, priority int, host_ts timestamp",
    )
    # now = 00:01:00; b.org was contacted 10s ago -> excluded at limit 30
    pulled = frontier.get_download_urls(
        df, time_limit=30.0, now_ts="2025-01-01 00:01:00"
    ).collect()
    assert {r["host"] for r in pulled} == {"https://a.org", "https://c.org"}
    assert {r["url"] for r in pulled} == {"https://a.org/1", "https://c.org/1"}

    # snapshot round-trip
    path = str(tmp_path / "frontier_snapshot")
    frontier.save_frontier(df, path)
    restored = frontier.load_frontier(spark, path)
    assert sorted(map(tuple, restored.collect())) == sorted(map(tuple, df.collect()))

    # done / threshold aggregates
    assert frontier.is_done(df) is False
    visited_df = df.withColumn("visited", F.lit(True))
    assert frontier.is_done(visited_df) is True
    assert frontier.download_threshold_reached(visited_df, 2) is True
    assert frontier.download_threshold_reached(visited_df, 3) is False


def test_streaming_frontier_ingest(spark):
    from courlan_spark.streaming.ingest import start_frontier_ingest

    base = tempfile.mkdtemp(prefix="stream_")
    src = os.path.join(base, "incoming")
    frontier_dir = os.path.join(base, "frontier")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src)
    os.makedirs(frontier_dir)
    try:
        with open(os.path.join(src, "batch1.txt"), "w") as fh:
            fh.write(
                "https://stream.example.org/a\n"
                "https://stream.example.org/tag/news/x?p=2\n"
                "not-a-url\n"
            )
        query = start_frontier_ingest(spark, src, frontier_dir, ckpt)
        query.awaitTermination(120)

        rows = spark.read.parquet(frontier_dir).collect()
        paths = {r["path"] for r in rows}
        assert "/a" in paths
        assert all(not r["visited"] for r in rows)

        # second batch: duplicate of /a must not re-append
        with open(os.path.join(src, "batch2.txt"), "w") as fh:
            fh.write("https://stream.example.org/a\nhttps://stream.example.org/b\n")
        query2 = start_frontier_ingest(spark, src, frontier_dir, ckpt)
        query2.awaitTermination(120)

        rows = spark.read.parquet(frontier_dir).collect()
        all_paths = [r["path"] for r in rows]
        assert all_paths.count("/a") == 1
        assert "/b" in all_paths
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_part_extraction_udfs(spark):
    from courlan_spark.functions.url_udfs import (
        base_url_udf,
        fix_relative_udf,
        is_external_udf,
    )

    df = spark.createDataFrame(
        [
            ("https://example.org/a/b?q=1", "page.html", "https://example.org/x"),
            ("https://example.org", "//www.eff.org", "https://other.net/"),
        ],
        "url string, href string, ref string",
    )
    rows = df.select(
        base_url_udf("url").alias("base"),
        fix_relative_udf("url", "href").alias("fixed"),
        is_external_udf("url", "ref").alias("ext"),
    ).collect()
    assert rows[0]["base"] == "https://example.org"
    assert rows[0]["fixed"] == "https://example.org/a/page.html"
    assert rows[0]["ext"] is False
    assert rows[1]["fixed"] == "https://www.eff.org"
    assert rows[1]["ext"] is True
