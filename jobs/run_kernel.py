"""Bare-kernel calibration job (no project code): measures what THIS
host can scale at all in a given Spark deploy mode, so pipeline
scaling numbers are read against the machine's own ceiling rather
than an ideal 1.0.

    spark-submit --master <mode> jobs/run_kernel.py <n_rows>

Two single-stage kernels, no shuffle, no Python workers:
  * md5  — ALU-bound: md5(cast(id)) aggregated with max()
  * regex — memory-bound: regexp_replace over generated strings

Each kernel warms once (JIT/codegen), then times a fresh plan.
Prints RESULT {...} like jobs/run_pipeline.py.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    spark = SparkSession.builder.appName("kernel_calibration").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    par = spark.sparkContext.defaultParallelism

    def md5_df():
        return (
            spark.range(0, n, 1, par * 8)
            .select(F.md5(F.col("id").cast("string")).alias("h"))
            .agg(F.max("h").alias("m"))
        )

    def regex_df():
        return (
            spark.range(0, n // 10, 1, par * 8)
            .select(
                F.concat(
                    F.lit("usr="),
                    F.col("id").cast("string"),
                    F.lit(" ip=10.0."),
                    (F.col("id") % 255).cast("string"),
                    F.lit(".7 path=/a/b/c?q="),
                    F.md5(F.col("id").cast("string")),
                ).alias("s")
            )
            .select(
                F.regexp_replace(
                    F.regexp_replace("s", r"\d+\.\d+\.\d+\.\d+", "<ip>"),
                    r"[0-9a-f]{32}",
                    "<hash>",
                ).alias("t")
            )
            .agg(F.sum(F.length("t")).alias("m"))
        )

    # settle action: make every executor run at least one task so the
    # status tracker reflects the full roster (registration with the
    # scheduler precedes appearance in getExecutorInfos).
    spark.range(0, 1_000_000, 1, par * 4).agg(F.max("id")).collect()
    infos = spark.sparkContext._jsc.sc().statusTracker().getExecutorInfos()
    out = {
        "n_rows": n,
        "parallelism": par,
        "executors_at_run": max(0, len(infos) - 1),
    }
    for name, build in (("md5", md5_df), ("regex", regex_df)):
        build().collect()  # warm: JIT + codegen
        df = build()  # fresh plan for the timed pass
        t0 = time.time()
        df.collect()
        out[f"{name}_wall_s"] = round(time.time() - t0, 3)
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
