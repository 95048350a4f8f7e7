"""Measure the incremental delta's full-core (local[32]) penalty vs
half-core, and whether right-sizing spark.sql.shuffle.partitions to the
delta's row count removes it.

Round-4 driver run: delta at 32 cores = 70.7s vs 18.2s at 16 — with a
~5-6s UNIFORM inflation per stage, i.e. a scheduling/contention floor,
not one hot stage (VERDICT r4 "What's wrong" #3).  Hypotheses:

  H1 (shuffle width): 32 shuffle partitions on a 12k-row delta = ~375
     rows/task; every one of ~8 stages pays 32 task launches + AQE
     planning.  Right-sizing shuffle partitions (8) at 32 cores should
     recover most of the gap if true.
  H2 (session width itself): the local[32] scheduler/JVM with 32 task
     slots has a fixed per-stage cost the shuffle knob can't touch;
     then only the documented config rule (run deltas at cores ~
     delta_rows/1k) holds.

Usage: python tools/exp_delta_sizing.py [reps]
Writes /tmp/exp_delta_sizing.json and prints per-leg timings.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import CPUS, N_PAGES, _warm_workers  # noqa: E402
from courlan_spark.plans.pipeline import (  # noqa: E402
    DedupConfig,
    DedupPipeline,
    FingerprintStore,
)
from courlan_spark.plans.session import get_session  # noqa: E402
from courlan_spark.sources.pages import generate_pages, pages_view  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cut = int(N_PAGES * 0.9)
    cfg_kwargs = {"jaccard_threshold": 0.6}

    corpus = tempfile.mkdtemp(prefix="exp_corpus_") + "/pages.parquet"
    base_dir = tempfile.mkdtemp(prefix="exp_base_")

    half = max(4, CPUS // 2)
    spark = get_session(app_name="exp-build", cpus=half)
    spark.sparkContext.setLogLevel("ERROR")
    generate_pages(spark, N_PAGES).write.mode("overwrite").parquet(corpus)
    full = spark.read.parquet(corpus)
    DedupPipeline(spark, base_dir, DedupConfig(**cfg_kwargs), count_rows=False).run(
        pages_view(full.where(F.col("doc_id") < cut))
    )
    spark.stop()

    def delta_leg(session, store, shuffle) -> dict:
        workdir = tempfile.mkdtemp(prefix="exp_run_")
        pipe = DedupPipeline(
            session, workdir, DedupConfig(**cfg_kwargs), count_rows=False
        )
        t0 = time.time()
        pipe.run_incremental(
            pages_view(session.read.parquet(corpus).where(F.col("doc_id") >= cut)),
            store,
            shuffle_partitions=shuffle,
        )
        secs = round(time.time() - t0, 2)
        return {"secs": secs, "stages": pipe.metrics,
                "width": pipe._delta_shuffle_partitions}

    results: list[dict] = []
    # interleave configs so host drift hits all equally; None = the
    # UNFIXED control (session width), "auto" = the run_incremental fix
    configs = [("wide_unfixed", CPUS, None), ("wide_auto", CPUS, "auto"),
               ("half_unfixed", half, None), ("half_auto", half, "auto")]
    for rep in range(reps):
        for name, cores, shuffle in configs:
            session = get_session(app_name=f"exp-{name}-{rep}", cpus=cores)
            session.sparkContext.setLogLevel("ERROR")
            _warm_workers(session, cores)
            store = FingerprintStore.from_workdir(session, base_dir)
            leg = delta_leg(session, store, shuffle)
            leg.update({"name": name, "cores": cores, "shuffle": shuffle, "rep": rep})
            results.append(leg)
            print(json.dumps({k: leg[k] for k in ("name", "cores", "shuffle", "width", "rep", "secs")}))
            session.stop()

    with open("/tmp/exp_delta_sizing.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote /tmp/exp_delta_sizing.json")


if __name__ == "__main__":
    main()
