"""Adversarial replica of the driver's correctness gate under a
DRIVER-LIKE session: a vanilla SparkSession.builder (NONE of the
engine's get_session pins — no UTC timezone, no NTZ inference pin, no
shuffle/pushdown tuning), with the session timezone forced to a
non-UTC zone.  This is exactly the configuration class that kept
q_event_sessions red in rounds 3-4 while the UTC-pinned local replica
passed.  Every queries() entry must produce the same value hash as
its DuckDB oracle under THIS session too.

The compare loop is shared with check_oracles.py (run_gate) so the
replica cannot diverge from the gate it replicates.

Usage: python tools/check_oracles_driverlike.py [sf_dir] [names...]
"""

from __future__ import annotations

import os
import sys


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    # Python WORKERS spawn with PYTHONPATH from the environment, not the
    # driver's sys.path — without this, every UDF-bearing query dies with
    # ModuleNotFoundError when the script is launched outside /root/repo.
    os.environ["PYTHONPATH"] = "/root/repo" + os.pathsep + os.environ.get(
        "PYTHONPATH", ""
    )
    from check_oracles import run_gate

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driverlike-oracle-check")
        # Deliberately hostile-but-plausible driver configs: a non-UTC
        # session timezone and explicit LTZ reads.  A correct query
        # must hash identically regardless.
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    failures = run_gate(spark, sf_dir, only)
    spark.stop()
    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print("all driver-like oracle checks passed")


if __name__ == "__main__":
    main()
