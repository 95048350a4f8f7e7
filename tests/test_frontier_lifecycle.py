"""Crawl-lifecycle scenario ported from the reference store suite
(/root/reference/tests/urlstore_tests.py:192-395), re-expressed in
batch semantics: ingest -> counts/state -> appendleft priority with
extendleft ordering -> variant dedup -> sequential pulls with
mark_visited -> membership probes -> schedule quotas."""

from pyspark.sql import functions as F

from courlan_spark.operators import frontier

DOM = "https://www.example.org"
TEST = "https://test.org"


def _ingest(spark, urls, **kw):
    df = spark.createDataFrame([(u,) for u in urls], "url string").coalesce(1)
    return frontier.ingest_urls(df, **kw).coalesce(1)


def test_crawl_lifecycle(spark):
    example_urls = [f"{DOM}/{a}" for a in range(100)]
    test_urls = [f"{TEST}/{a}" for a in range(100)]

    store = _ingest(spark, example_urls + test_urls).cache()
    assert store.count() == 200
    aggregates = {r["host"]: r for r in frontier.host_aggregates(store).collect()}
    assert aggregates[DOM]["total"] == 100 and aggregates[DOM]["state"] == "OPEN"

    # a fully-visited host is exhausted; adding an unvisited URL reopens it
    visited_store = store.unionByName(
        _ingest(spark, ["https://visited.com/visited"], visited=True, seq_offset=10_000)
    )
    states = {r["host"]: r["state"] for r in frontier.host_aggregates(visited_store).collect()}
    assert states["https://visited.com"] == "ALL_VISITED"
    reopened = visited_store.unionByName(
        _ingest(spark, ["https://visited.com/1"], seq_offset=20_000)
    )
    states = {r["host"]: r["state"] for r in frontier.host_aggregates(reopened).collect()}
    assert states["https://visited.com"] == "OPEN"

    # appendleft batch: trailing-slash forms normalize away, the batch
    # takes priority, and extendleft ordering puts the LAST added first
    right_batch = _ingest(spark, [f"{DOM}/1/{a}" for a in range(10)], seq_offset=1_000)
    left_batch = _ingest(
        spark,
        [f"{DOM}/1/{a}/" for a in range(11)],
        trailing_slash=False,
        appendleft=True,
        seq_offset=2_000,
    )
    merged = frontier.merge_new_urls(
        frontier.merge_new_urls(store, right_batch), left_batch
    ).cache()
    # /1/0../1/9 collapse with their slash variants; /1/10 is new
    assert merged.where(F.col("host") == DOM).count() == 100 + 11

    # sequential pulls follow deque order: the prepended /1/10 first,
    # then the original head /0 (matches the reference deque, where
    # extendleft added only the one unknown path before the old head)
    picks = frontier.next_urls(merged.where(F.col("host") == DOM), per_host=2)
    pulled = [r["url"] for r in picks.orderBy("rn").collect()]
    assert pulled == [f"{DOM}/1/10", f"{DOM}/0"]

    # mark them visited: they leave the unvisited set, counts move
    after = frontier.mark_visited(merged, picks).cache()
    unvisited_paths = {
        r["path"] for r in after.where((F.col("host") == DOM) & ~F.col("visited")).collect()
    }
    assert "/1/10" not in unvisited_paths and "/0" not in unvisited_paths
    aggregates = {r["host"]: r for r in frontier.host_aggregates(after).collect()}
    assert aggregates[DOM]["visited_count"] == 2

    # membership probes (is_known / has_been_visited analogs)
    probe = spark.createDataFrame(
        [
            (f"{TEST}/category/this",),
            (f"{DOM}/1",),
            ("https://otherdomain.org/",),
        ],
        "url string",
    )
    unknown = {r["url"] for r in frontier.filter_unknown_urls(after, probe).collect()}
    assert unknown == {f"{TEST}/category/this", "https://otherdomain.org/"}

    probe2 = spark.createDataFrame(
        [(f"{DOM}/1/10",), (f"{DOM}/this",), (f"{DOM}/999",)], "url string"
    )  # /999 is outside the generated range 0..99
    unvisited = {
        r["url"] for r in frontier.filter_unvisited_urls(after, probe2).collect()
    }
    assert unvisited == {f"{DOM}/this", f"{DOM}/999"}

    # schedule: quota max_urls // open_hosts, spaced by time_limit
    schedule = frontier.download_schedule(after, max_urls=6, time_limit=1.0).collect()
    assert len(schedule) == 6
    assert max(r["schedule_secs"] for r in schedule) == 2.0  # 3 per host
    assert frontier.download_threshold_reached(after, 3) is False
    assert frontier.download_threshold_reached(after, 2) is True
    assert frontier.is_done(after) is False


def test_seq_partition_invariance(spark):
    """Insertion-order seq is the input ordinal: ingesting the same
    list sliced into 1 vs 8 partitions yields identical next_urls and
    schedule output (VERDICT r1: monotonically_increasing_id leaked
    the partition layout into the deque order)."""
    urls = [f"{DOM}/p/{i}" for i in range(50)] + [f"{TEST}/q/{i}" for i in range(30)]

    def run(num_slices):
        rows = spark.sparkContext.parallelize([(u,) for u in urls], num_slices)
        df = spark.createDataFrame(rows, "url string")
        fr = frontier.ingest_urls(df)
        nxt = [
            (r["host"], r["path"], r["rn"])
            for r in frontier.next_urls(fr, per_host=5)
            .orderBy("host", "rn")
            .collect()
        ]
        sched = [
            (r["host"], r["url"], r["schedule_secs"])
            for r in frontier.download_schedule(fr, max_urls=20, time_limit=2.0)
            .collect()
        ]
        return nxt, sched

    assert run(1) == run(8)


def test_seq_offset_orders_batches(spark):
    """Two batches separated by seq_offset pull in batch order per host
    (the ADVICE r1 collision: partition-id bits swamped the offset)."""
    first = _ingest(spark, [f"{DOM}/a/{i}" for i in range(5)], seq_offset=0)
    second = _ingest(spark, [f"{DOM}/b/{i}" for i in range(5)], seq_offset=1000)
    merged = frontier.merge_new_urls(first, second)
    ordered = [
        r["path"]
        for r in frontier.next_urls(merged, per_host=10).orderBy("rn").collect()
    ]
    assert ordered == [f"/a/{i}" for i in range(5)] + [f"/b/{i}" for i in range(5)]


def test_ingest_with_explicit_order_col(spark):
    "order_col survives any repartitioning (arrival order from data)."
    rows = [(f"{DOM}/o/{i}", i) for i in range(20)]
    df = spark.createDataFrame(rows, "url string, arrival long").repartition(7)
    fr = frontier.ingest_urls(df, order_col="arrival")
    got = [
        r["path"]
        for r in frontier.next_urls(fr, per_host=20).orderBy("rn").collect()
    ]
    assert got == [f"/o/{i}" for i in range(20)]


def test_merge_after_mark_visited_and_discard(spark):
    """Lifecycle columns added by mark_visited (host_ts) and
    discard_hosts (busted) must not break later batch merges."""
    from datetime import datetime

    from pyspark.sql import functions as F

    store = _ingest(spark, [f"{DOM}/l/{i}" for i in range(4)])
    picks = frontier.get_download_urls(store, time_limit=5.0)
    hp = picks.withColumn("path", F.expr("substring(url, length(host) + 1)")).select(
        "host", "path"
    )
    stamped = frontier.mark_visited(store, hp, visit_ts=datetime(2025, 1, 1))
    busted = frontier.discard_hosts(stamped, [TEST])
    batch = _ingest(spark, [f"{DOM}/new/{i}" for i in range(3)], seq_offset=100)
    merged = frontier.merge_new_urls(busted, batch)
    assert "host_ts" in merged.columns and "busted" in merged.columns
    rows = merged.where(F.col("path").isNotNull()).count()
    assert rows == 4 + 3
    # new rows carry null lifecycle columns
    fresh = merged.where(F.col("path").startswith("/new/")).collect()
    assert all(r["host_ts"] is None and not r["busted"] for r in fresh)
