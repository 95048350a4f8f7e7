"""Round-6 session-2: targeted e2e pipeline measurement (bench shape:
120k pages, minimal snapshot mode, local[SPARK_GRAFT_CPUS]), N runs in
fresh sessions with probes, without the frozen bench's other sections.

Usage: python tools/exp_r06_e2e.py [n_runs] [n_pages]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench  # noqa: E402


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 120_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from courlan_spark.plans.session import get_session
    from courlan_spark.sources.pages import generate_pages

    corpus_dir = tempfile.mkdtemp(prefix="expe2e_corpus_")
    corpus_path = os.path.join(corpus_dir, "pages")
    spark = get_session(app_name="expe2e-gen", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    generate_pages(spark, n_pages).write.mode("overwrite").parquet(corpus_path)
    spark.stop()

    runs = []
    try:
        for _ in range(n_runs):
            runs.append(bench._run_pipeline(cpus, corpus_path, n_pages=n_pages))
        print(json.dumps({
            "n_pages": n_pages,
            "cpus": cpus,
            "secs": [r["secs"] for r in runs],
            "probes_cpu": [r["cpu_probe_mops"] for r in runs],
            "probes_dram": [r["dram_probe_gbs"] for r in runs],
            "stages_best": min(runs, key=lambda r: r["secs"])["stages"],
        }))
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
