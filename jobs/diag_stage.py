"""Diagnostic: narrow-stage vs exchange scaling in executor mode.

    spark-submit --master local-cluster[N,2,3072] ... jobs/diag_stage.py <corpus>

Times (a) the fused narrow stage only (wash->mask->match->route forced
via a column-sum action, no exchange) and (b) the full sink_ecm
aggregate, each on a fresh plan after a warm pass.
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
    spark = SparkSession.builder.appName("diag_stage").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from loganalyzer_spark import pipeline
    from loganalyzer_spark.operators import parse

    src = spark.read.parquet(corpus)

    def narrow():
        routed = pipeline.routed_lines(spark, parse.pages_to_lines(src))
        # force the whole chain but keep the plan exchange-free
        return routed.select(
            F.sum(F.length("event_id") + F.length("sink_class")).alias("s")
        )

    def full():
        routed = pipeline.routed_lines(spark, parse.pages_to_lines(src))
        return pipeline.sink_aggregates(routed, "1 minute")

    out = {"parallelism": spark.sparkContext.defaultParallelism}
    for name, build in (("narrow", narrow), ("full", full)):
        build().collect() if name == "narrow" else build().count()  # warm
        df = build()
        t0 = time.time()
        df.collect() if name == "narrow" else df.count()
        out[f"{name}_wall_s"] = round(time.time() - t0, 3)
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
