"""The north rule's packaging claim, executed for real: the engine
must run via `spark-submit --py-files courlan_spark.zip job.py` on a
cluster.  This test builds the zip (tools/make_pyfiles_zip.py), then
launches a small end-to-end dedup job through the REAL spark-submit
binary from a foreign working directory with the repo stripped from
PYTHONPATH — so the driver import AND every executor-side Python
worker (the pandas-UDF imports of courlan_spark inside check_url /
fingerprints) can only resolve through the shipped archive.  A
resource missing from the zip, or an import that accidentally depends
on the repo checkout, fails here and nowhere else.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_JOB = """\
import sys

from pyspark.sql import SparkSession

# vanilla session on purpose: the shipped package must not depend on
# the engine's own session factory being the one that booted the JVM
spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import courlan_spark
assert "courlan_spark.zip" in courlan_spark.__file__, courlan_spark.__file__

from courlan_spark.plans.pipeline import DedupConfig, DedupPipeline
from courlan_spark.sources.pages import generate_pages

workdir = sys.argv[1]
pages = generate_pages(spark, 800)
pipe = DedupPipeline(
    spark,
    workdir,
    DedupConfig(snapshot_mode="minimal"),
    count_rows=False,
)
pipe.run(pages.select("url", "warc_ts", "html", "text", "lang"))
out = spark.read.parquet(workdir + "/09_assignments")
n_docs = out.count()
n_clusters = out.select("cluster_id").distinct().count()
print(f"PYFILES_RESULT docs={n_docs} clusters={n_clusters}")
spark.stop()
"""


def _spark_submit() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def test_pipeline_runs_via_spark_submit_pyfiles(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from make_pyfiles_zip import build

    zip_path = build(str(tmp_path / "courlan_spark.zip"))
    job_path = tmp_path / "job.py"
    job_path.write_text(_JOB)
    workdir = tmp_path / "work"

    env = dict(os.environ)
    # the zip must be the ONLY way to reach the package: drop any
    # PYTHONPATH entry pointing at the checkout
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and os.path.abspath(p) != REPO
    )
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            str(job_path),
            str(workdir),
        ],
        cwd=str(tmp_path),  # NOT the repo: relative imports can't cheat
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, (
        f"spark-submit failed\nstdout tail: {proc.stdout[-2000:]}\n"
        f"stderr tail: {proc.stderr[-2000:]}"
    )
    marker = [
        line for line in proc.stdout.splitlines()
        if line.startswith("PYFILES_RESULT ")
    ]
    assert marker, f"no result marker in stdout: {proc.stdout[-2000:]}"
    fields = dict(
        kv.split("=") for kv in marker[0].split()[1:]
    )
    n_docs, n_clusters = int(fields["docs"]), int(fields["clusters"])
    # the generator plants duplicate clusters: output rows exist and
    # clustering actually merged some of them
    assert n_docs > 0
    assert 0 < n_clusters < n_docs
