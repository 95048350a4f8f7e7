"""Frontier operators — the UrlStore re-expressed as a DataFrame.

The reference's UrlStore is a host-keyed dict of path deques with
visited flags and per-host state (/root/reference/courlan/urlstore.py).
The engine's frontier is a table

    frontier(host string, path string, visited boolean,
             seq long, priority int, host_ts timestamp)

partitioned/bucketed by host at scale.  Deque order becomes the
explicit (priority desc, seq asc) sort; per-host aggregates (count,
total, state) are derived, not stored.  All membership probes are
semi/anti joins — the distributed form of the reference's
sort-then-probe (_search_urls, urlstore.py:277-295).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.url_udfs import host_path_udf, make_buffer_url_udf, make_check_url_udf


def ingest_urls(
    urls: DataFrame,
    url_col: str = "url",
    strict: bool = False,
    language: str | None = None,
    trailing_slash: bool = True,
    visited: bool = False,
    priority: int = 0,
    seq_offset: int = 0,
    appendleft: bool = False,
) -> DataFrame:
    """Validate/normalize raw URLs into frontier rows (the _buffer_urls
    analog, urlstore.py:171-203): invalid and wrong-language rows drop,
    the rest split into (host, path) with insertion-order seq.

    ``appendleft=True`` mirrors the reference's deque.extendleft
    (urlstore.py:256-258): the batch is prioritized AND its internal
    order reverses — realized here as priority=1 with negated seq, so
    the deque order (priority desc, seq asc) reproduces left-appends
    exactly.

    NB: this runs the *buffer* validation (validate+lang+normalize),
    not the full check_url — matching the reference, which applies the
    content filters in filter_links before the store, never inside it."""
    buffer_udf = make_buffer_url_udf(
        strict=strict, language=language, trailing_slash=trailing_slash
    )
    checked = (
        urls.withColumn("_norm", buffer_udf(F.col(url_col)))
        .where(F.col("_norm").isNotNull())
        .withColumn("_hp", host_path_udf(F.col("_norm")))
        .where(F.col("_hp.host").isNotNull())
    )
    seq = F.monotonically_increasing_id() + F.lit(seq_offset)
    if appendleft:
        seq = -seq
        priority = max(priority, 1)
    return checked.select(
        F.col("_hp.host").alias("host"),
        F.col("_hp.path").alias("path"),
        F.lit(visited).alias("visited"),
        seq.alias("seq"),
        F.lit(priority).alias("priority"),
    )


def merge_scheme_variants(frontier: DataFrame) -> DataFrame:
    """http://X and https://X are one host: https absorbs http
    (urlstore.py:226-238), applied set-wide in one pass: a host keeps
    the https scheme iff any row for the scheme-less key saw https."""
    keyed = frontier.withColumn(
        "_hostkey", F.regexp_replace("host", r"^https?://", "")
    )
    schemes = keyed.groupBy("_hostkey").agg(
        F.max(F.col("host").startswith("https")).alias("_has_https")
    )
    return (
        keyed.join(schemes, "_hostkey")
        .withColumn(
            "host",
            F.concat(
                F.when(F.col("_has_https"), F.lit("https://")).otherwise(
                    F.lit("http://")
                ),
                F.col("_hostkey"),
            ),
        )
        .drop("_hostkey", "_has_https")
    )


def _canon_path():
    # built lazily: Column construction needs an active SparkContext
    return F.when(F.col("path") == "/", F.lit("/")).otherwise(
        F.regexp_replace("path", r"/+$", "")
    )


def exact_path_dedup(batch: DataFrame) -> DataFrame:
    """Within-batch dedup: exact (host, path) only, first occurrence
    wins — the reference's dict.fromkeys(data) in _buffer_urls
    (urlstore.py:175).  Trailing-slash *variants* survive inside one
    batch; the variant test only runs against the existing store."""
    w = Window.partitionBy("host", "path").orderBy(
        F.col("priority").desc(), F.col("seq").asc()
    )
    return (
        batch.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_new_urls(frontier: DataFrame, batch: DataFrame) -> DataFrame:
    """Cross-batch insert (urlstore.py:246-258): a batch row is new iff
    no ±trailing-slash variant of its path is already stored for the
    host (is_known_link's slash variants collapse onto one canonical
    key) — a left-anti join, then union.  Iceberg MERGE at scale."""
    batch = exact_path_dedup(batch)
    known = frontier.select(
        "host", _canon_path().alias("_canon")
    ).distinct()
    fresh = (
        batch.withColumn("_canon", _canon_path())
        .join(known, ["host", "_canon"], "left_anti")
        .drop("_canon")
    )
    return frontier.unionByName(fresh)


def dedup_variants(frontier: DataFrame) -> DataFrame:
    """Batch-global variant collapse: all ±trailing-slash variants of a
    path reduce to the earliest row.  Strictly stronger than the
    reference's insert-time behavior (which keeps within-batch
    variants — see exact_path_dedup/merge_new_urls); useful when the
    whole frontier is rebuilt at once."""
    w = Window.partitionBy("host", _canon_path()).orderBy(
        F.col("priority").desc(), F.col("seq").asc()
    )
    return (
        frontier.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def host_aggregates(frontier: DataFrame) -> DataFrame:
    """Derived DomainEntry aggregates (urlstore.py:84-95,270-273):
    total paths, visited count, and state (OPEN / ALL_VISITED)."""
    return frontier.groupBy("host").agg(
        F.count("*").alias("total"),
        F.sum(F.col("visited").cast("long")).alias("visited_count"),
        F.when(F.bool_and("visited"), F.lit("ALL_VISITED"))
        .otherwise(F.lit("OPEN"))
        .alias("state"),
    )


def next_urls(frontier: DataFrame, per_host: int = 1) -> DataFrame:
    """get_url analog (urlstore.py:409-430): the first `per_host`
    unvisited paths per host in deque order (priority desc, seq asc)."""
    w = Window.partitionBy("host").orderBy(F.col("priority").desc(), F.col("seq").asc())
    return (
        frontier.where(~F.col("visited"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= per_host)
        .select("host", "path", F.concat("host", "path").alias("url"), "rn")
    )


def download_schedule(
    frontier: DataFrame,
    max_urls: int = 100,
    time_limit: float = 10.0,
    crawl_delays: DataFrame | None = None,
) -> DataFrame:
    """establish_download_schedule analog (urlstore.py:455-505):
    per-host quota = max_urls // open_hosts (floor, min 1); the i-th
    pick of a host is scheduled i*delay seconds out; global order by
    schedule time.

    ``crawl_delays`` is an optional small table
    ``(host string, crawl_delay double)`` from parsed robots.txt rules
    (get_crawl_delay analog, urlstore.py:524-530): hosts present use
    their own delay, others fall back to ``time_limit``.  It is
    broadcast — robots tables are tiny relative to the frontier."""
    open_hosts = frontier.where(~F.col("visited")).select("host").distinct()
    n_open = open_hosts.count()
    if n_open == 0:
        return frontier.sparkSession.createDataFrame(
            [], "host string, url string, schedule_secs double"
        )
    per_host = max(max_urls // n_open, 1)

    w = Window.partitionBy("host").orderBy(F.col("priority").desc(), F.col("seq").asc())
    picks = (
        frontier.where(~F.col("visited"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= per_host)
    )
    if crawl_delays is not None:
        picks = picks.join(
            F.broadcast(crawl_delays.select("host", "crawl_delay")), "host", "left"
        ).withColumn("_delay", F.coalesce("crawl_delay", F.lit(time_limit)))
    else:
        picks = picks.withColumn("_delay", F.lit(time_limit))
    return (
        picks.withColumn(
            "schedule_secs", (F.col("rn") - F.lit(1)).cast("double") * F.col("_delay")
        )
        .select(
            "host",
            F.concat("host", "path").alias("url"),
            "schedule_secs",
        )
        .orderBy("schedule_secs", "host", "url")
        .limit(max_urls)
    )


def get_download_urls(
    frontier: DataFrame,
    time_limit: float = 10.0,
    max_urls: int = 10000,
    now_ts=None,
) -> DataFrame:
    """Rate-limited pull (get_download_urls analog, urlstore.py:432-453):
    one URL per host whose last contact (`host_ts`, nullable column) is
    older than `time_limit` seconds, capped at `max_urls` globally.
    Deterministic global order (host) replaces dict order."""
    w = Window.partitionBy("host").orderBy(F.col("priority").desc(), F.col("seq").asc())
    now_expr = F.lit(now_ts).cast("timestamp") if now_ts is not None else F.current_timestamp()
    eligible = frontier.where(~F.col("visited"))
    if "host_ts" in frontier.columns:
        eligible = eligible.where(
            F.col("host_ts").isNull()
            | (now_expr.cast("double") - F.col("host_ts").cast("double") > time_limit)
        )
    return (
        eligible.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("host", F.concat("host", "path").alias("url"))
        .orderBy("host")
        .limit(max_urls)
    )


def mark_visited(frontier: DataFrame, picks: DataFrame) -> DataFrame:
    """Flag (host, path) rows as visited — the batch analog of
    get_url's in-place mutation (urlstore.py:417-424).  At scale this
    is an Iceberg MERGE; here it is a broadcast-friendly left join on
    the (small) pick set."""
    flags = picks.select("host", "path").distinct().withColumn("_hit", F.lit(True))
    return (
        frontier.join(flags, ["host", "path"], "left")
        .withColumn("visited", F.col("visited") | F.coalesce("_hit", F.lit(False)))
        .drop("_hit")
    )


def is_done(frontier: DataFrame) -> bool:
    "True when every host is exhausted (done test, urlstore.py:213-216)."
    row = frontier.agg(F.bool_and("visited").alias("all_visited")).first()
    return bool(row["all_visited"]) if row["all_visited"] is not None else True


def download_threshold_reached(frontier: DataFrame, threshold: float) -> bool:
    "any(host download count >= threshold) (urlstore.py:542-544)."
    counts = frontier.where(F.col("visited")).groupBy("host").agg(
        F.count("*").alias("count")
    )
    row = counts.agg(F.max("count").alias("m")).first()
    return bool(row["m"] is not None and row["m"] >= threshold)


def save_frontier(frontier: DataFrame, path: str) -> None:
    """Persist the frontier as a snapshot (UrlStore.write analog,
    urlstore.py:573-583; Iceberg `writeTo` seam at scale)."""
    from ..sources.tables import write_snapshot

    write_snapshot(frontier, path)


def load_frontier(spark, path: str) -> DataFrame:
    "Restore a frontier snapshot (load_store analog)."
    from ..sources.tables import read_snapshot

    return read_snapshot(spark, path)


def _probe_host_path(probe: DataFrame, url_col: str) -> DataFrame:
    return (
        probe.withColumn("_hp", host_path_udf(F.col(url_col)))
        .where(F.col("_hp.host").isNotNull())
        .select(
            F.col(url_col).alias("url"),
            F.col("_hp.host").alias("host"),
            F.col("_hp.path").alias("path"),
        )
    )


def filter_unknown_urls(
    frontier: DataFrame, probe: DataFrame, url_col: str = "url"
) -> DataFrame:
    """filter_unknown_urls analog (urlstore.py:389-391): probe URLs not
    present in the frontier — a left-anti join on (host, path)."""
    probes = _probe_host_path(probe, url_col)
    return probes.join(
        frontier.select("host", "path"), ["host", "path"], "left_anti"
    ).select("url")


def filter_unvisited_urls(
    frontier: DataFrame, probe: DataFrame, url_col: str = "url"
) -> DataFrame:
    """filter_unvisited_urls analog (urlstore.py:393-395): probe URLs
    that are not stored-and-visited — anti join against visited rows."""
    probes = _probe_host_path(probe, url_col)
    visited = frontier.where(F.col("visited")).select("host", "path")
    return probes.join(visited, ["host", "path"], "left_anti").select("url")
