"""Adversarial replica of the driver's correctness gate under a
DRIVER-LIKE session: a vanilla SparkSession.builder (NONE of the
engine's get_session pins — no UTC timezone, no NTZ inference pin, no
shuffle/pushdown tuning), with the session timezone forced to a
non-UTC zone.  This is exactly the configuration class that kept
q_event_sessions red in rounds 3-4 while the UTC-pinned local replica
passed.  Every queries() entry must produce the same value hash as
its DuckDB oracle under THIS session too.

Usage: python tools/check_oracles_driverlike.py [sf_dir] [names...]
"""

from __future__ import annotations

import os
import sys


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    # Python WORKERS spawn with PYTHONPATH from the environment, not the
    # driver's sys.path — without this, every UDF-bearing query dies with
    # ModuleNotFoundError when the script is launched outside /root/repo.
    os.environ["PYTHONPATH"] = "/root/repo" + os.pathsep + os.environ.get(
        "PYTHONPATH", ""
    )
    from check_oracles import normalize, value_hash  # noqa: E402

    import duckdb
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

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for table in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{sf_dir}/{table}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {exc}")
            failures.append(name)
            continue
        if sql is None:
            print(f"{name}: rows-only, {len(sdf)} rows")
            continue
        try:
            ddf = con.execute(sql).df()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {exc}")
            failures.append(name)
            continue
        problems = []
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
        if len(sdf) != len(ddf):
            problems.append(f"rows {len(sdf)} vs {len(ddf)}")
        if not problems:
            hs, hd = value_hash(normalize(sdf)), value_hash(normalize(ddf))
            if hs != hd:
                srows, drows = normalize(sdf), normalize(ddf)
                diff = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
                problems.append(f"value hash mismatch; first diffs: {diff}")
        if problems:
            print(f"{name}: MISMATCH — {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"{name}: OK ({len(sdf)} rows)")
    spark.stop()
    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print("all driver-like oracle checks passed")


if __name__ == "__main__":
    main()
