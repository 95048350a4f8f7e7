"""CLI for the end-to-end near-duplicate pipeline.

The `courlan_spark.cli` module mirrors the reference binary's
clean/filter/sample surface; this one drives the engine's flagship
addition — the full dedup pipeline — from the command line:

    python -m courlan_spark.pipeline_cli \
        --input pages.parquet --workdir /data/dedup_run \
        [--threshold 0.6] [--snapshot-mode all|minimal] [--resume]
        [--parallel 8] [--language de] [--strict]

Incremental ingest (a delta batch against previous runs' fingerprint
store — operators/incremental.py):

    python -m courlan_spark.pipeline_cli \
        --input delta.parquet --workdir /data/dedup_day2 \
        --store-workdir /data/dedup_run [--store-workdir /data/dedup_day1]

`--store-workdir` may repeat (oldest first) to chain delta batches;
the run writes delta-scoped snapshots plus the fully merged
09_assignments, so its own workdir becomes the next chain link.

Input: a parquet table shaped (url string, warc_ts timestamp,
html binary, text string, lang string) — the Common-Crawl-style page
table of the north rule.  Output: `<workdir>/09_assignments` snapshot
(doc_id, norm_url, domain, cluster_id) plus `<workdir>/metrics.json`;
the run summary prints as one JSON line.  `--resume` skips every
stage whose snapshot already committed (identical final clusters —
see tests/test_pipeline_recall.py).

On a cluster, submit with the package zip:
    spark-submit --py-files courlan_spark.zip -m courlan_spark.pipeline_cli ...
(see tools/make_pyfiles_zip.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(args: list[str] | None = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="run the MinHash/SimHash/substring near-dup pipeline"
    )
    parser.add_argument("--input", required=True, help="pages parquet path")
    parser.add_argument("--workdir", required=True, help="snapshot/checkpoint dir")
    parser.add_argument("--threshold", type=float, default=0.6, help="Jaccard verify threshold")
    parser.add_argument("--snapshot-mode", choices=["all", "minimal"], default="all")
    parser.add_argument("--resume", action="store_true", help="reuse committed stage snapshots")
    parser.add_argument("--strict", action="store_true")
    parser.add_argument("--language")
    parser.add_argument("--num-perm", type=int, default=128)
    parser.add_argument("--bands", type=int, default=32)
    parser.add_argument("--shingle-k", type=int, default=9)
    parser.add_argument("--max-bucket-size", type=int, default=2000)
    parser.add_argument("--no-simhash", action="store_true")
    parser.add_argument("--min-tokens", type=int, default=None,
                        help="quality gate: drop docs with fewer tokens")
    parser.add_argument("--max-tokens", type=int, default=None,
                        help="quality gate: drop docs with more tokens")
    parser.add_argument("--min-alpha-ratio", type=float, default=None,
                        help="quality gate: drop docs below this alphabetic ratio")
    parser.add_argument("--no-substring", action="store_true")
    parser.add_argument(
        "--store-workdir", action="append", default=None,
        help="run incrementally: fingerprint-store workdir(s) of the "
        "base run and any earlier deltas, oldest first (repeatable)",
    )
    parser.add_argument(
        "--delta-shuffle-partitions", type=int, default=None,
        help="incremental runs: pin the delta's shuffle width (default "
        "auto = clamp(delta_rows/1000, 8, session width) — a delta job "
        "sized to the cluster pays the per-task floor on every stage)",
    )
    parser.add_argument(
        "-p", "--parallel", type=int, default=None,
        help="local cores (cluster: use spark-submit instead)",
    )
    parser.add_argument("-v", "--verbose", action="store_true")
    return parser.parse_args(args)


def run(args: argparse.Namespace, spark=None) -> dict:
    from .plans.pipeline import DedupConfig, DedupPipeline

    own_session = spark is None
    if own_session:
        from .plans.session import get_session

        spark = get_session(app_name="courlan-spark-pipeline", cpus=args.parallel)
        if not args.verbose:
            spark.sparkContext.setLogLevel("ERROR")
    try:
        pages = spark.read.parquet(args.input)
        config = DedupConfig(
            strict=args.strict,
            language=args.language,
            num_perm=args.num_perm,
            bands=args.bands,
            shingle_k=args.shingle_k,
            jaccard_threshold=args.threshold,
            max_bucket_size=args.max_bucket_size,
            with_simhash_stage=not args.no_simhash,
            with_substring_stage=not args.no_substring,
            snapshot_mode=args.snapshot_mode,
            min_tokens=args.min_tokens,
            max_tokens=args.max_tokens,
            min_alpha_ratio=args.min_alpha_ratio,
        )
        if args.store_workdir and config.snapshot_mode == "minimal":
            # an incremental run's workdir is the next chain link only
            # if its delta-scoped 02_url_dedup/04_fingerprints snapshots
            # exist — minimal mode skips them, and the gap would only
            # surface at the NEXT run's FingerprintStore load
            print(
                "warning: --snapshot-mode minimal cannot serve as a "
                "--store-workdir chain link; upgrading to 'all'",
                file=sys.stderr,
            )
            config.snapshot_mode = "all"
        pipeline = DedupPipeline(spark, args.workdir, config)
        page_cols = pages.select("url", "warc_ts", "html", "text", "lang")
        if args.store_workdir:
            from .plans.pipeline import FingerprintStore

            store = FingerprintStore.from_workdirs(spark, *args.store_workdir)
            summary = pipeline.run_incremental(
                page_cols,
                store,
                resume=args.resume,
                shuffle_partitions=(
                    args.delta_shuffle_partitions
                    if args.delta_shuffle_partitions is not None
                    else "auto"
                ),
            )
        else:
            summary = pipeline.run(page_cols, resume=args.resume)
        return summary
    finally:
        if own_session:
            spark.stop()


def main() -> None:
    print(json.dumps(run(parse_args()), default=str))


if __name__ == "__main__":
    main()
