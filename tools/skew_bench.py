"""Skew evidence: salted vs naive fan-out sink writes.

The routed stream is heavily skewed (most rows land in the 'normal'
sink; event_ids are Zipfian). A naive repartition("sink_class") before
the per-class write serializes each sink into one writer task — the hot
sink becomes a single-threaded bottleneck. `enrich.write_sinks` salts
the shuffle key so each sink's rows spread over N writer tasks.

Usage: python tools/skew_bench.py [n_docs]
Prints one JSON line with both walls and the speedup.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    from pyspark.sql import functions as F

    from loganalyzer_spark import datagen, pipeline
    from loganalyzer_spark.operators import enrich
    from loganalyzer_spark.session import get_spark

    spark = get_spark(app="skew_bench")
    corpus = f"/tmp/loganalyzer_bench/corpus_{n_docs}"
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        datagen.gen_raw_lines(spark, n_docs).write.mode("overwrite").parquet(
            corpus
        )
    routed = pipeline.routed_lines(
        spark, spark.read.parquet(corpus)
    ).select("doc_id", "line_no", "event_id", "severity", "sink_class")
    routed = routed.localCheckpoint(eager=True)  # isolate write cost

    dist = {
        r["sink_class"]: r["count"]
        for r in routed.groupBy("sink_class").count().collect()
    }

    out = "/tmp/loganalyzer_bench/skew_out"

    def naive():
        # one writer task per sink: repartition on the raw key
        routed.repartition("sink_class").write.mode("overwrite").partitionBy(
            "sink_class"
        ).parquet(out)

    def salted():
        enrich.write_sinks(routed, out, salt_buckets=16)

    results = {}
    for name, fn in (("naive", naive), ("salted", salted)):
        shutil.rmtree(out, ignore_errors=True)
        fn()  # warm
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        fn()
        results[name] = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "rows": sum(dist.values()),
                "sink_distribution": dist,
                "naive_wall_s": results["naive"],
                "salted_wall_s": results["salted"],
                "speedup": round(results["naive"] / results["salted"], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
