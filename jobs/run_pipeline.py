"""spark-submit entry point: parse→match→enrich→route→aggregate over a
parquet corpus of raw lines.

    spark-submit --master local[N] --py-files dist/loganalyzer_spark.zip \
        jobs/run_pipeline.py <corpus_parquet_dir> [out_json]

Prints a JSON line with rows, docs, wall seconds and docs/sec. The
package is resolved from --py-files (cluster mode) or the repo root
(direct invocation).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    corpus = sys.argv[1]
    out_json = sys.argv[2] if len(sys.argv) > 2 else None

    spark = SparkSession.builder.appName("loganalyzer_pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from loganalyzer_spark import pipeline
    from loganalyzer_spark.operators import parse

    src = spark.read.parquet(corpus)
    pages_shaped = "text" in src.columns

    def build():
        # fresh plan instance per run: re-counting the same DataFrame
        # would reuse AQE's materialized stages and measure nothing.
        lines = parse.pages_to_lines(src) if pages_shaped else src
        routed = pipeline.routed_lines(spark, lines)
        return lines, pipeline.sink_aggregates(routed, "1 minute")

    # Warm pass: JIT + whole-stage-codegen compilation is a fixed
    # ~8 s serial cost per JVM (measured via Amdahl fit across the
    # ladder); steady-state throughput is what scales with executors,
    # so the measured pass runs against a warmed code cache.
    build()[1].count()
    # Build the timed plan instance AFTER warming: a plan built before
    # the warm pass could (in principle) reuse AQE state across
    # instances and under-measure.
    lines, agg = build()
    # actual executor count entering the timed pass: local-cluster
    # executors register asynchronously (and pre-touched heaps start
    # slowly on a degraded host), so a run can silently execute on
    # fewer executors than configured — record it so every rep is
    # attributable (the bench also sets minRegisteredResourcesRatio=1).
    infos = spark.sparkContext._jsc.sc().statusTracker().getExecutorInfos()
    n_exec = max(0, len(infos) - 1)
    t0 = time.time()
    groups = agg.count()
    wall = time.time() - t0
    n_docs = src.count() if pages_shaped else (
        src.agg(F.countDistinct("doc_id")).collect()[0][0]
    )
    n_rows = lines.count()
    result = {
        "rows": n_rows,
        "docs": n_docs,
        "agg_groups": groups,
        "wall_s": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 1),
        "rows_per_sec": round(n_rows / wall, 1),
        "parallelism": spark.sparkContext.defaultParallelism,
        "executors_at_run": n_exec,
    }
    print("RESULT " + json.dumps(result))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(result, f)
    spark.stop()


if __name__ == "__main__":
    main()
