"""spark-submit entry point: one LLM-tier operator over a staged
parquet input, warmed then timed on a fresh plan instance.

    spark-submit --master local[N] --py-files dist/loganalyzer_spark.zip \
        jobs/llmops_scale.py <op> <input_parquet_dir>

ops: c4 (lines → c4_clean), dsir (docs → dsir_weights),
     pack (docs → pack_sequences), minhash (docs → LSH candidate pairs).
Prints RESULT {rows_in, rows_out, wall_s, rows_in_per_sec, parallelism}.
Same measurement protocol as jobs/run_pipeline.py (warm pass first,
fresh plan for the timed pass, parallelism recorded).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    op = sys.argv[1]
    path = sys.argv[2]

    spark = SparkSession.builder.appName(f"llmops_{op}").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from loganalyzer_spark.operators import dedup as DD
    from loganalyzer_spark.operators import pack as PK
    from loganalyzer_spark.operators import web as W

    src = spark.read.parquet(path)

    def build():
        if op == "c4":
            return W.c4_clean(src)
        if op == "dsir":
            return W.dsir_weights(src)
        if op == "pack":
            return PK.pack_sequences(src, ctx_len=2048, shards=64)
        if op == "minhash":
            return DD.lsh_candidate_pairs(DD.minhash_signatures(src))
        raise SystemExit(f"unknown op {op!r}")

    from pyspark.sql import functions as F

    def materialize(df):
        # NOT count(): count() lets Catalyst prune the operator under
        # test (ADVICE r4 — the counted pack plan was just Filter+Range,
        # c4 a bare groupBy count). Hashing every output column forces
        # the full computation.
        # bit_xor, not sum: summing 64-bit hashes overflows in ANSI mode.
        row = (
            df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("_h"))
            .agg(F.count(F.lit(1)).alias("n"), F.expr("bit_xor(_h)").alias("h"))
            .collect()[0]
        )
        return int(row["n"])

    materialize(build())  # warm: JIT + codegen outside the timed window
    # A fresh plan instance is NOT enough when the operator persists an
    # intermediate (dsir's rank projection): the CacheManager matches
    # the identical logical subtree from the warm pass and the "timed"
    # run reads the InMemoryRelation instead of computing (observed:
    # dsir 47.8 s -> 0.6 s, i.e. the cache, not the operator). Drop all
    # cached data so the timed pass pays its own materialization.
    spark.catalog.clearCache()
    # build() INSIDE the timed window: dsir's cutoff selection runs
    # driver-side jobs (count/percentile/nth-key) at build time — they
    # are part of the operator's cost, not setup.
    t0 = time.time()
    rows_out = materialize(build())  # fresh plan instance, timed
    wall = time.time() - t0
    rows_in = src.count()
    print(
        "RESULT "
        + json.dumps(
            {
                "op": op,
                "rows_in": rows_in,
                "rows_out": rows_out,
                "wall_s": round(wall, 3),
                "rows_in_per_sec": round(rows_in / wall, 1),
                # master carries the true task-slot count (local[N]);
                # defaultParallelism just echoes spark.default.parallelism
                # when the launcher sets it, so it is NOT the rung
                "master": spark.sparkContext.master,
                "parallelism": spark.sparkContext.defaultParallelism,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
