"""Per-domain URL sampling as a window operator.

Reference semantics (/root/reference/courlan/sampling.py:15-47):
for each host, drop the bare homepage path, skip hosts outside
[exclude_min, exclude_max], draw at most ``samplesize`` paths.  The
reference draws with ``random.sample`` (nondeterministic; its tests
assert counts only).  The engine draws the same counts
deterministically by ordering on a seeded md5 of the URL — stable
across runs/engines, uniform within a host, and reproducible in the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sample_per_domain(
    frontier: DataFrame,
    samplesize: int,
    exclude_min: int | None = None,
    exclude_max: int | None = None,
    host_col: str = "host",
    path_col: str = "path",
    seed: str = "42",
) -> DataFrame:
    """Deterministic per-host sample; returns (host, path, url).

    One shuffle on host (window + count reuse the same partitioning;
    Catalyst plans a single exchange for both window functions).
    """
    candidates = frontier.where(F.col(path_col) != "/")

    host_window = Window.partitionBy(host_col)
    pick_window = Window.partitionBy(host_col).orderBy(
        F.md5(F.concat(F.lit(seed), F.col(host_col), F.col(path_col)))
    )

    sized = candidates.withColumn("n_host_urls", F.count("*").over(host_window))
    gated = sized
    if exclude_min is not None:
        gated = gated.where(F.col("n_host_urls") >= exclude_min)
    if exclude_max is not None:
        gated = gated.where(F.col("n_host_urls") <= exclude_max)

    return (
        gated.withColumn("pick", F.row_number().over(pick_window))
        .where(F.col("pick") <= samplesize)
        .select(
            F.col(host_col).alias("host"),
            F.col(path_col).alias("path"),
            F.concat(F.col(host_col), F.col(path_col)).alias("url"),
        )
    )
