"""Structured Streaming ingest: URL streams -> frontier appends.

The reference has no streaming surface — its incremental behavior is
the mutable UrlStore (SURVEY.md §2.10).  The engine's streaming analog
ingests a URL stream (file source, Kafka at scale), runs the same
vectorized check_url pass, and merges new frontier rows per
micro-batch with the known-link anti-join, so a crawler can feed
discoveries continuously while batch queries read the frontier
snapshots.  foreachBatch keeps the merge transactional per batch and
maps 1:1 onto an Iceberg MERGE on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.url_udfs import host_path_udf, make_check_url_udf
from ..sources import tables


def checked_url_stream(
    stream: DataFrame,
    url_col: str = "url",
    strict: bool = False,
    language: str | None = None,
) -> DataFrame:
    "Streaming-safe projection: url -> (host, path, priority)."
    from ..functions.native import is_navigation_col

    check_udf = make_check_url_udf(strict=strict, language=language)
    return (
        stream.withColumn("_c", check_udf(F.col(url_col)))
        .where(F.col("_c.norm_url").isNotNull())
        .withColumn("_hp", host_path_udf(F.col("_c.norm_url")))
        .where(F.col("_hp.host").isNotNull())
        .select(
            F.col("_hp.host").alias("host"),
            F.col("_hp.path").alias("path"),
            F.lit(False).alias("visited"),
            is_navigation_col(F.col("_c.norm_url")).cast("int").alias("priority"),
        )
    )


def start_frontier_ingest(
    spark: SparkSession,
    source_dir: str,
    frontier_dir: str,
    checkpoint_dir: str,
    strict: bool = False,
    language: str | None = None,
    trigger_once: bool = True,
):
    """File-source stream of URL lines -> frontier parquet appends.

    Each micro-batch: check/normalize -> (host, path) -> anti-join the
    existing frontier on (host, path) -> append only new rows with a
    batch-scoped seq.  Returns the StreamingQuery.
    """
    lines = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 16)
        .load(source_dir)
        .select(F.trim("value").alias("url"))
        .where(F.length("url") > 0)
    )
    checked = checked_url_stream(lines, strict=strict, language=language)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        # batch stride ABOVE monotonically_increasing_id's partition
        # bits: the id encodes partition in multiples of 2^33, so a
        # 2^33 stride made batch 1/partition 0 collide with batch
        # 0/partition 1; 2^50 clears any id below 2^17 partitions and
        # keeps cross-batch deque order (priority desc, seq asc) exact
        fresh = batch_df.dropDuplicates(["host", "path"]).withColumn(
            "seq",
            F.monotonically_increasing_id() + F.lit(batch_id) * F.lit(1 << 50),
        )
        # existence check through the tables seam (round-3 fix): the
        # frontier may live on an object store where os.path is blind;
        # the seam asks the Hadoop FS (or the Iceberg catalog)
        session = batch_df.sparkSession
        if tables.table_exists(session, frontier_dir):
            existing = tables.read_snapshot(session, frontier_dir)
            fresh = fresh.join(
                existing.select("host", "path"), ["host", "path"], "left_anti"
            )
        tables.append_rows(
            fresh.select("host", "path", "visited", "seq", "priority"),
            frontier_dir,
        )

    writer = (
        checked.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
