"""URL-list ingestion and the valid/discarded two-sink split.

Distributed form of the reference CLI (parity:
/root/reference/courlan/cli.py:102-176): the 10^5-line batch reads
become ``spark.read.text`` partitions, the ProcessPoolExecutor fan-out
becomes executor tasks, and the output/discard files become two
filtered writes off one checked DataFrame (single UDF pass — the
check result is computed once and reused by both sinks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.url_udfs import make_check_url_udf


def read_url_list(spark: SparkSession, path: str) -> DataFrame:
    "One URL per line -> DataFrame(url string); blank lines dropped."
    return (
        spark.read.text(path)
        .select(F.trim(F.col("value")).alias("url"))
        .where(F.length("url") > 0)
    )


def check_urls(
    urls: DataFrame,
    url_col: str = "url",
    strict: bool = False,
    language: str | None = None,
    with_nav: bool = False,
    trailing_slash: bool = True,
) -> DataFrame:
    "Annotate with (norm_url, domain, ok) via one vectorized pass."
    check_udf = make_check_url_udf(
        strict=strict, language=language, with_nav=with_nav,
        trailing_slash=trailing_slash,
    )
    return urls.withColumn("_c", check_udf(F.col(url_col))).select(
        F.col(url_col).alias("url"),
        F.col("_c.norm_url").alias("norm_url"),
        F.col("_c.domain").alias("domain"),
        F.col("_c.norm_url").isNotNull().alias("ok"),
    )


def split_valid_discarded(checked: DataFrame) -> tuple[DataFrame, DataFrame]:
    "(valid rows with norm_url+domain, discarded raw urls)."
    valid = checked.where("ok").select("url", "norm_url", "domain")
    discarded = checked.where("NOT ok").select("url")
    return valid, discarded


def write_two_sinks(
    checked: DataFrame, output_path: str, discarded_path: str | None = None
) -> None:
    """One pass, two sinks (cli.py:171-176 analog).  The checked frame
    is persisted so the UDF does not run twice."""
    checked = checked.persist()
    try:
        valid, discarded = split_valid_discarded(checked)
        valid.select("norm_url").write.mode("overwrite").text(output_path)
        if discarded_path is not None:
            discarded.write.mode("overwrite").text(discarded_path)
    finally:
        checked.unpersist()
