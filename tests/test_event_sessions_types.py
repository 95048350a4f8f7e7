"""q_event_sessions must emit IDENTICAL epoch-microsecond integers no
matter how the consuming session reads the events parquet — the
rounds-3/4 red CORRECTNESS cell.

The parquet `ts` column is physically timestamp[us] with no timezone,
but the surfaced Spark type depends on the session's
spark.sql.parquet.inferTimestampNTZ.enabled config: true -> NTZ,
false -> TIMESTAMP (LTZ).  Round 4's fix (NTZ timestampdiff on both
sides) was correct only for the NTZ read; an LTZ read coerces the NTZ
epoch literal through the session timezone and shifts every bound by
the tz offset — rows match, hash doesn't.  q_event_sessions now
dispatches on events.schema["ts"].dataType (NTZ -> timestampdiff,
LTZ -> unix_micros); this test pins all four combinations of
{NTZ read, LTZ read} x {UTC, non-UTC session timezone} to the same
output, so no driver-session config can move the hash again."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"

_CONFIGS = [
    ("true", "UTC"),
    ("true", "America/New_York"),
    ("false", "UTC"),
    ("false", "America/New_York"),
]


def _rows_under(spark, infer_ntz: str, tz: str, query=None):
    """Run q_event_sessions (or another sessionization query) with the
    parquet-read + timezone configs a foreign driver session might use.
    _views re-reads the parquet on every call, so runtime conf changes
    take effect."""
    from courlan_spark.plans.catalog import q_event_sessions

    old_ntz = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", None)
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", infer_ntz)
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        df = (query or q_event_sessions)(spark, SF_DIR)
        read_type = spark.table("events").schema["ts"].dataType.typeName()
        rows = sorted(
            (r["user_id"], r["session_no"], r["n_events"],
             r["session_start_us"], r["session_end_us"])
            for r in df.collect()
        )
        return read_type, rows
    finally:
        if old_ntz is not None:
            spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", old_ntz)
        spark.conf.set("spark.sql.session.timeZone", old_tz)
        # re-register the view under the restored configs so later
        # tests in the shared session see the default read type
        spark.read.parquet(f"{SF_DIR}/events.parquet").createOrReplaceTempView(
            "events"
        )


def test_event_sessions_identical_under_all_read_configs(spark):
    results = {cfg: _rows_under(spark, *cfg) for cfg in _CONFIGS}

    # the configs must actually exercise BOTH read types, or this test
    # stops covering the failure mode
    read_types = {rt for rt, _ in results.values()}
    assert read_types == {"timestamp_ntz", "timestamp"}, read_types

    baseline_cfg = _CONFIGS[0]
    _, baseline = results[baseline_cfg]
    assert len(baseline) > 100
    for cfg, (read_type, rows) in results.items():
        assert rows == baseline, (
            f"q_event_sessions drifted under infer_ntz={cfg[0]} tz={cfg[1]} "
            f"(read type {read_type})"
        )

    # spot-check the values are true epoch micros (2024-01-01 corpus) —
    # a tz-shifted run would move these by hours of microseconds
    first_start = baseline[0][3]
    assert 1_700_000_000_000_000 < first_start < 1_800_000_000_000_000


def test_stream_sessions_identical_under_all_read_configs(spark):
    """The streaming dual (q_stream_sessions) must be just as immune to
    the consuming session's parquet-read + timezone configs: an NTZ
    read is rebuilt as timestamp_micros(NTZ epoch diff) before the
    watermark, an LTZ read already carries the raw stored micros, and
    unix_micros emission is instant-based on both branches."""
    from courlan_spark.plans.catalog import q_event_sessions, q_stream_sessions

    results = {
        cfg: _rows_under(spark, *cfg, query=q_stream_sessions) for cfg in _CONFIGS
    }
    # read_type from _rows_under reflects the "events" temp view, which
    # q_stream_sessions does not register — recompute from a fresh read
    read_types = set()
    for infer_ntz, _tz in _CONFIGS:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", infer_ntz)
        read_types.add(
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .schema["ts"].dataType.typeName()
        )
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    assert read_types == {"timestamp_ntz", "timestamp"}, read_types

    _, baseline = results[_CONFIGS[0]]
    assert len(baseline) > 100
    for cfg, (_rt, rows) in results.items():
        assert rows == baseline, f"q_stream_sessions drifted under {cfg}"

    # and the streaming dual equals the batch gap-and-island output
    _, batch_rows = _rows_under(spark, "true", "UTC", query=q_event_sessions)
    assert baseline == batch_rows


def test_session_no_dtype_matches_oracle(spark):
    """The rounds-3-5 red cell, pinned at the DTYPE level: DuckDB types
    the oracle's windowed sum(CASE…) as HUGEINT; pandas has no int128,
    so .df() converts it to float64, while a bigint Spark column
    arrives int64 — a typewise stringify then hashes `42.0` vs `42`
    (rows and schema match, hash doesn't).  This test runs the REAL
    oracle through .df() and the REAL query through toPandas() and
    asserts (a) column dtypes agree exactly and (b) the honest
    (str, not %.6g) value hash agrees — the check that would have
    caught the red cells in rounds 3-5."""
    import sys

    import duckdb

    sys.path.insert(0, "/root/repo/tools")
    from check_oracles import normalize, value_hash

    from courlan_spark.plans.catalog import ORACLES, q_event_sessions

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    )
    oracle = con.execute(ORACLES["q_event_sessions"]).df()
    spark_df = q_event_sessions(spark, SF_DIR).toPandas()

    cols = sorted(oracle.columns)
    assert sorted(spark_df.columns) == cols
    oracle_dtypes = {c: str(oracle[c].dtype) for c in cols}
    spark_dtypes = {c: str(spark_df[c].dtype) for c in cols}
    assert oracle_dtypes == spark_dtypes, (
        f"dtype divergence the driver would hash as red: "
        f"oracle={oracle_dtypes} spark={spark_dtypes}"
    )
    # the oracle REALLY emits float64 here (the HUGEINT->pandas path);
    # if DuckDB ever changes that, this assert flags the pin for review
    assert oracle_dtypes["session_no"] == "float64", oracle_dtypes

    assert value_hash(normalize(spark_df)) == value_hash(normalize(oracle))
