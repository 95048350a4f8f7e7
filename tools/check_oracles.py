"""Local replica of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
sf dir, compare row count, column names, and an order-insensitive
value hash.  Usage: python tools/check_oracles.py [sf_dir] [names...]

The compare loop lives here once; check_oracles_driverlike.py reuses
it with a hostile session so the two gates cannot diverge.
"""

from __future__ import annotations

import hashlib
import sys

import duckdb


def normalize(df):
    "Canonical pandas form: sorted columns, stringified rows, sorted."
    import pandas as pd

    df = df[sorted(df.columns)].copy()

    def cell(v):
        if v is None or (isinstance(v, float) and v != v):
            return "NULL"
        # floats stringify VERBATIM (str, not %.6g): the driver hashes
        # typewise, so `42.0` (a float64 the oracle got from a HUGEINT
        # through pandas) must NOT collapse to `42` here — the %.6g
        # masking is exactly why three rounds of local replicas passed
        # while the driver's q_event_sessions cell stayed red (r5
        # verdict, "What's wrong" #2)
        if isinstance(v, bytes):
            return v.hex()
        return str(v)

    rows = sorted(
        "\x1f".join(cell(v) for v in row) for row in df.itertuples(index=False)
    )
    return rows


def value_hash(rows):
    h = hashlib.md5()
    for row in rows:
        h.update(row.encode("utf-8", "surrogatepass"))
        h.update(b"\n")
    return h.hexdigest()


def run_gate(spark, sf_dir: str, only: set[str] | None = None) -> list[str]:
    """Run every (or the named) queries() entry against its DuckDB
    oracle on the given session; print per-query verdicts and return
    the failing names."""
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
                diff = [
                    (a, b) for a, b in zip(srows, drows) if a != b
                ][:3]
                problems.append(f"value hash mismatch; first diffs: {diff}")
        if problems:
            print(f"{name}: MISMATCH — {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"{name}: OK ({len(sdf)} rows)")
    return failures


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    from courlan_spark.plans.session import get_session

    spark = get_session(cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    failures = run_gate(spark, sf_dir, only)
    spark.stop()
    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print("all oracle checks passed")


if __name__ == "__main__":
    main()
