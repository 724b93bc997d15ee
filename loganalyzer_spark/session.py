"""SparkSession construction with scale-appropriate defaults.

Local testing runs one JVM (local[N]); the same settings translate to a
multi-executor cluster: AQE on (runtime coalesce + skew-join splitting),
shuffle partitions sized to parallelism, Arrow enabled for every
pandas-UDF exchange, UTC session timezone so results compare exactly
against DuckDB oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

SEED = 42


def get_spark(
    app: str = "loganalyzer_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores=None`` -> ``local[*]``. Shuffle partitions default to the
    parallelism level: hugely oversized shuffles (the 200 default) are
    as wrong locally as undersized ones are at cluster scale.
    """
    if cores is None:
        cores_env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cores_env}]" if cores_env else "local[*]"
        n = int(cores_env) if cores_env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        n = cores
    sp = shuffle_partitions if shuffle_partitions is not None else max(8, n)

    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.default.parallelism", str(max(8, n)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # 16g is the measured sweet spot on this 32-core VM: 8g doubles
        # GC time at 32 threads, 48g collapses throughput ~4x
        # (ParallelGC scans of a huge cold heap); see BENCH/BASELINE.md.
        .config("spark.driver.memory", (_mem := os.environ.get("SPARK_DRIVER_MEM", "16g")))
        # Pre-touch the whole heap at JVM launch: this VM's virtio
        # free-page-reporting discards freed guest pages, so LAZY heap
        # growth faults fresh pages mid-run at host-paging speed —
        # observed 5x wall inflation on unchanged plans (BENCH_r03) and
        # 27k → 49k docs/s on the executor ladder when fixed
        # (BENCH/EXECUTORS.md). -Xms=-Xmx + AlwaysPreTouch moves the
        # fault cost to startup, outside every timed window. Only the
        # FIRST getOrCreate in a process launches the JVM, so the
        # startup cost is paid once.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_DRIVER_JAVA_OPTS", f"-Xms{_mem} -XX:+AlwaysPreTouch"
            ),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # measured on this VM (BENCH/BASELINE.md): small parquet files
        # otherwise bin-pack into one task wave per core count —
        # multiple waves load-balance stragglers (+43% at 32 threads)
        .config("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
