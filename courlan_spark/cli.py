"""Command-line entry point — the reference CLI re-expressed on Spark.

Argument surface mirrors the reference (`courlan` binary, parity:
/root/reference/courlan/cli.py:20-75): input/output/discarded files,
--strict, --language, --sample/--exclude-min/--exclude-max, and
--parallel (which maps to local[] cores here; on a cluster the
parallelism comes from spark-submit).

    python -m courlan_spark.cli -i urls.txt -o clean.txt -d bad.txt
    python -m courlan_spark.cli -i urls.txt -o sample.txt --sample 50
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def parse_args(args: list[str] | None = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="clean, filter and sample URL lists at scale"
    )
    io_group = parser.add_argument_group("I/O")
    io_group.add_argument("-i", "--inputfile", required=True, help="input file (one URL per line)")
    io_group.add_argument("-o", "--outputfile", required=True, help="output file/dir")
    io_group.add_argument("-d", "--discardedfile", help="file/dir for discarded URLs")
    io_group.add_argument("-v", "--verbose", action="store_true")
    io_group.add_argument(
        "-p", "--parallel", type=int, default=4, help="local cores (cluster: use spark-submit)"
    )

    filter_group = parser.add_argument_group("Filtering")
    filter_group.add_argument("--strict", action="store_true", help="stricter filtering")
    filter_group.add_argument("--language", help="target language (ISO 639-1)")

    sample_group = parser.add_argument_group("Sampling")
    sample_group.add_argument("--sample", type=int, help="per-domain sample size")
    sample_group.add_argument("--exclude-min", dest="exclude_min", type=int)
    sample_group.add_argument("--exclude-max", dest="exclude_max", type=int)
    return parser.parse_args(args)


def process_args(args: argparse.Namespace, spark: SparkSession | None = None) -> None:
    from .operators.frontier import exact_path_dedup, ingest_urls, merge_scheme_variants
    from .operators.sampling import sample_per_domain
    from .sources.urlfile import check_urls, read_url_list, write_two_sinks

    own_session = spark is None
    if own_session:
        from .plans.session import get_session

        spark = get_session(app_name="courlan-spark-cli", cpus=args.parallel)
        if not args.verbose:
            spark.sparkContext.setLogLevel("ERROR")
    try:
        urls = read_url_list(spark, args.inputfile)
        if args.sample:
            frontier = exact_path_dedup(
                merge_scheme_variants(
                    ingest_urls(urls, strict=args.strict, language=args.language)
                )
            )
            sample = sample_per_domain(
                frontier,
                samplesize=args.sample,
                exclude_min=args.exclude_min,
                exclude_max=args.exclude_max,
            )
            sample.select("url").write.mode("overwrite").text(args.outputfile)
        else:
            checked = check_urls(
                urls, strict=args.strict, language=args.language
            )
            write_two_sinks(checked, args.outputfile, args.discardedfile)
    finally:
        if own_session:
            spark.stop()


def main() -> None:
    process_args(parse_args())


if __name__ == "__main__":
    main()
