"""Round-6 session-2: does a generic engine warm-up at session build
remove the first-query JIT penalty?

A fresh session + frozen _warm_workers pays ~1.5-2.5 s of JVM/codegen
warm-up on whichever query runs first (q_url_canonical_dedup in the
bench's fixed order).  This experiment measures, in SEPARATE fresh
subprocesses (JIT state is per-JVM):
  A) _warm_workers -> q_url_canonical_dedup          (status quo)
  B) _warm_workers -> composite engine warm-up -> q_url_canonical_dedup

The composite warm-up runs one tiny query exercising the codepaths the
first real query compiles: exchange, window, hash/object aggregate,
broadcast join, sort, distinct — on spark.range data, no test inputs.

Usage: python tools/exp_r06_warmup.py          # orchestrates A and B
       python tools/exp_r06_warmup.py A|B      # one leg (subprocess)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def engine_warmup(spark) -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = (
        spark.range(0, 20_000, numPartitions=8)
        .select(
            F.col("id"),
            (F.col("id") % 97).alias("k"),
            (F.col("id") % 13).alias("v"),
        )
    )
    w = Window.partitionBy("k")
    small = spark.range(0, 97).select(F.col("id").alias("k"), F.lit(1).alias("t"))
    out = (
        df.repartition(8, "k")
        .withColumn("c", F.count(F.lit(1)).over(w))
        .withColumn("rn", F.row_number().over(w.orderBy("id")))
        .groupBy("k")
        .agg(
            F.array_sort(F.collect_list("v")).alias("ids"),
            F.sum("c").alias("s"),
        )
        .join(F.broadcast(small), "k")
        .select("k", "s", F.explode("ids").alias("x"))
        .distinct()
    )
    out.write.format("noop").mode("overwrite").save()


def leg(which: str) -> None:
    import bench
    from courlan_spark.plans.catalog import QUERIES
    from courlan_spark.plans.session import get_session

    spark = get_session(app_name=f"exp-warmup-{which}", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    bench._warm_workers(spark, 32)
    t_warm = 0.0
    if which == "B":
        t0 = time.perf_counter()
        engine_warmup(spark)
        t_warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    QUERIES["q_url_canonical_dedup"](spark, "/root/testdata/sf0.1").write.format(
        "noop"
    ).mode("overwrite").save()
    t_q = time.perf_counter() - t0
    # second query cold-plan for context
    t0 = time.perf_counter()
    QUERIES["q_minhash_lsh_pairs"](spark, "/root/testdata/sf0.1").write.format(
        "noop"
    ).mode("overwrite").save()
    t_q2 = time.perf_counter() - t0
    print(json.dumps({
        "leg": which,
        "warmup_secs": round(t_warm, 2),
        "q_url_canonical_secs": round(t_q, 2),
        "q_minhash_secs": round(t_q2, 2),
        "cpu_probe": bench._cpu_probe(),
        "dram_probe": bench._dram_probe(),
    }))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1:
        leg(sys.argv[1])
        return
    env = os.environ.copy()
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    for rep in range(2):
        for which in ("A", "B"):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), which],
                capture_output=True, text=True, timeout=600, env=env,
            )
            line = [l for l in r.stdout.splitlines() if l.startswith("{")]
            print(line[-1] if line else r.stderr[-400:], flush=True)


if __name__ == "__main__":
    main()
