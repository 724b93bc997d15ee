"""Resumability across process death (SURVEY §5.5, north rule
"resumable from checkpoint with per-partition lineage + metrics").

A pipeline process is hard-killed after stage 1 commits but before
stage 2 starts; a fresh process re-runs the same job and must (a) skip
the completed stage — proven by the untouched stage-1 metrics file and
parquet — and (b) produce the identical final result.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = r"""
import os, sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from loganalyzer_spark.session import get_spark
from loganalyzer_spark.lineage import CheckpointedJob
from loganalyzer_spark import datagen
from loganalyzer_spark.operators import parse

spark = get_spark(app="resume_kill", cores=2, shuffle_partitions=4)
job = CheckpointedJob(spark, %(root)r)

washed = job.stage(
    "washed",
    lambda: parse.mask(parse.wash(datagen.raw_lines(spark, "/root/testdata/sf0.001"))).select(
        "doc_id", "line_no", "masked"
    ),
)

if os.environ.get("CRASH_AFTER_STAGE1") == "1":
    os._exit(137)  # simulated kill -9 between stages

agg = job.stage(
    "counts",
    lambda: washed.groupBy("masked").agg(F.count("*").alias("n")),
)
rows = sorted((r["masked"], r["n"]) for r in agg.collect())
print("FINAL", len(rows), sum(n for _, n in rows))
spark.stop()
"""


def _run(root: str, crash: bool) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    if crash:
        env["CRASH_AFTER_STAGE1"] = "1"
    else:
        env.pop("CRASH_AFTER_STAGE1", None)
    return subprocess.run(
        [sys.executable, "-c", JOB % {"repo": REPO, "root": root}],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )


def test_kill_between_stages_resumes(tmp_path):
    root = str(tmp_path / "ckpt")

    # 1st process: dies after stage 1 commits
    p1 = _run(root, crash=True)
    assert p1.returncode == 137, p1.stderr[-2000:]
    stage1_metrics = os.path.join(root, "_metrics", "washed.json")
    assert os.path.exists(stage1_metrics)
    assert os.path.exists(os.path.join(root, "washed", "_SUCCESS"))
    assert not os.path.exists(os.path.join(root, "counts", "_SUCCESS"))
    mtime_before = os.path.getmtime(stage1_metrics)

    # 2nd process: resumes — stage 1 untouched, job completes
    p2 = _run(root, crash=False)
    assert p2.returncode == 0, p2.stderr[-2000:]
    assert os.path.getmtime(stage1_metrics) == mtime_before  # skipped
    assert os.path.exists(os.path.join(root, "counts", "_SUCCESS"))
    final2 = [ln for ln in p2.stdout.splitlines() if ln.startswith("FINAL")]

    # 3rd, uninterrupted run in a clean root must agree exactly
    clean = str(tmp_path / "clean")
    p3 = _run(clean, crash=False)
    assert p3.returncode == 0, p3.stderr[-2000:]
    final3 = [ln for ln in p3.stdout.splitlines() if ln.startswith("FINAL")]
    assert final2 == final3 and final2
