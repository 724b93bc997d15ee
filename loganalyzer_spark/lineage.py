"""Checkpointed lineage + metrics + resume (north rule §4.3).

Spark has RDD checkpointing but no job-level resume; this is the
app-level layer: every stage writes to a deterministic path with a
success marker and a metrics record (row counts, per-output-file
lineage, wall time). A restarted job skips completed stages / sink
partitions and reproduces identical output.

The reference's analogue is its intermediate-file handoff
(``fzip['new']/['norm']`` files, preprocess_base.py:427-429,492-499)
— made restart-safe and metric-bearing.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MARKER = "_SUCCESS"


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, MARKER))


class CheckpointedJob:
    """stage(name, fn): compute-or-reload a stage with lineage metrics.

    Layout: <root>/<stage>/  (parquet + _SUCCESS)
            <root>/_metrics/<stage>.json
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.metrics_dir = os.path.join(root, "_metrics")
        os.makedirs(self.metrics_dir, exist_ok=True)

    def stage_path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def stage(self, name: str, fn: Callable[[], DataFrame]) -> DataFrame:
        out = self.stage_path(name)
        if _done(out):
            return self.spark.read.parquet(out)
        t0 = time.time()
        fn().write.mode("overwrite").parquet(out)
        back = self.spark.read.parquet(out)
        per_file = (
            back.groupBy(F.input_file_name().alias("file"))
            .count()
            .collect()
        )
        metrics = {
            "stage": name,
            "rows": int(sum(r["count"] for r in per_file)),
            "n_files": len(per_file),
            "wall_s": round(time.time() - t0, 3),
            "partitions": {
                os.path.basename(r["file"]): int(r["count"]) for r in per_file
            },
            "resumed": False,
        }
        with open(os.path.join(self.metrics_dir, f"{name}.json"), "w") as f:
            json.dump(metrics, f, indent=1)
        return back

    def read_metrics(self, name: str) -> dict:
        with open(os.path.join(self.metrics_dir, f"{name}.json")) as f:
            return json.load(f)


SINK_CLASSES = ["c001", "c002", "c003", "normal"]


def write_sinks_resumable(
    routed: DataFrame, out_dir: str, classes: list[str] | None = None
) -> dict[str, bool]:
    """Fan-out routing with per-sink resume granularity.

    Each sink class is an independent write with its own success
    marker; a restart only re-writes incomplete sinks. The routed
    DataFrame should be cached by the caller when several sinks are
    written in one run.

    Returns {sink_class: was_skipped}.
    """
    skipped: dict[str, bool] = {}
    for cls in classes or SINK_CLASSES:
        path = os.path.join(out_dir, f"sink_class={cls}")
        if _done(path):
            skipped[cls] = True
            continue
        (
            routed.filter(F.col("sink_class") == cls)
            .drop("sink_class")
            .write.mode("overwrite")
            .parquet(path)
        )
        skipped[cls] = False
    return skipped
