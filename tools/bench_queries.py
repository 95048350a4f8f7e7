"""Per-query isolation bench + explain-plan capture (round 6).

bench.py is FROZEN for the official measurement; this tool exists for
guide-§1 methodology during optimization: each catalog query is timed
alone against the noop sink (computation, not sink), labeled via
setJobDescription, repeated, with min/median reported, and its
.explain("formatted") output optionally written to plans/r06/.

Usage:
  python tools/bench_queries.py [--sf DIR] [--cpus N] [--repeats N]
      [--queries q_a,q_b] [--explain-dir plans/r06] [--tag before]
      [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--queries", default=None, help="comma-separated; default: bench.py HEADLINE_QUERIES")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--json", dest="json_out", default=None)
    args = ap.parse_args()

    os.environ["PYTHONPATH"] = "/root/repo" + os.pathsep + os.environ.get("PYTHONPATH", "")

    from bench import HEADLINE_QUERIES, _cpu_probe, _dram_probe, _warm_workers

    from courlan_spark.plans.catalog import QUERIES
    from courlan_spark.plans.session import get_session

    names = args.queries.split(",") if args.queries else list(HEADLINE_QUERIES)

    spark = get_session(app_name="bench-queries", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    _warm_workers(spark, args.cpus)

    results: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        if args.explain_dir:
            import contextlib
            import io

            os.makedirs(args.explain_dir, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, args.sf).explain("formatted")
            with open(os.path.join(args.explain_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        samples = []
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(f"{name} [{args.tag} rep{i}]")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = {
            "samples": samples,
            "min": min(samples),
            "median": round(statistics.median(samples), 3),
        }
        print(f"{name}: min={min(samples)} median={results[name]['median']} {samples}", flush=True)

    out = {
        "sf": args.sf,
        "cpus": args.cpus,
        "tag": args.tag,
        "cpu_probe_mops": _cpu_probe(),
        "dram_probe_gbs": _dram_probe(),
        "queries": results,
    }
    print(json.dumps({k: v["min"] for k, v in results.items()}))
    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
