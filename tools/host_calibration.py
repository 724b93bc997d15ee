"""Host thread-scaling calibration, independent of the pipeline.

Measures how THIS VM scales a minimal Spark job from N to 4N local
threads — the ceiling against which the pipeline's own scaling must be
judged (a VM that cannot scale a bare `spark.range → md5 → count` will
not scale any real job).

Two kernels:
  * cpu:    md5 over spark.range — ALU-bound, near-zero memory traffic
  * string: repeat+regexp_replace over generated strings — memory/GC
            bound, the same resource profile as the parse pipeline

Usage: python tools/host_calibration.py [rows_millions]
Prints one JSON line per (kernel, cores) plus efficiency summary.
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORES = [2, 8, 32]

JOB = r"""
import sys, time, json
from pyspark.sql import SparkSession, functions as F
kernel, rows = sys.argv[1], int(sys.argv[2])
spark = SparkSession.builder.appName("calib").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

def build():
    # fresh plan instance each time: re-collecting the SAME DataFrame
    # reuses AQE's materialized stages and measures nothing.
    if kernel == "cpu":
        df = spark.range(0, rows, 1, 256).select(
            F.md5(F.col("id").cast("string")).alias("h"))
        return df.select(F.max("h"))
    df = spark.range(0, rows // 10, 1, 256).select(
        F.concat(F.lit("line <ip> 192.168.0."), (F.col("id") % 255).cast("string"),
                 F.lit(" code="), F.col("id").cast("string"),
                 F.lit(" payload "), F.repeat(F.lit("x"), 200)).alias("s"))
    m = F.regexp_replace(F.regexp_replace("s", r"\d+\.\d+\.\d+\.\d+", "<*>"),
                         r"code=\d+", "code=<*>")
    return df.select(m.alias("t")).select(F.max(F.length("t")))

build().collect()  # warm (JIT, codegen)
t0 = time.time(); build().collect(); w = time.time() - t0
print("CAL " + json.dumps({"kernel": kernel, "wall_s": round(w, 3),
                           "rate": round(rows / w, 1)}))
spark.stop()
"""


def run(kernel: str, cores: int, rows: int) -> dict:
    job = os.path.join("/tmp", "calib_job.py")
    with open(job, "w") as f:
        f.write(JOB)
    cmd = [
        "spark-submit", "--master", f"local[{cores}]",
        "--conf", "spark.sql.shuffle.partitions=32",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.driver.memory=16g",
        "--conf", "spark.driver.extraJavaOptions=-XX:+UseParallelGC",
        "--conf", "spark.ui.enabled=false",
        job, kernel, str(rows),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1200)
    m = re.search(r"CAL (\{.*\})", out.stdout)
    if not m:
        raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])
    return json.loads(m.group(1))


def main() -> None:
    rows = int(sys.argv[1]) * 1_000_000 if len(sys.argv) > 1 else 200_000_000
    results: dict[str, dict[int, dict]] = {}
    for kernel in ("cpu", "string"):
        results[kernel] = {}
        for cores in CORES:
            r = run(kernel, cores, rows)
            results[kernel][cores] = r
            print(f"{kernel} local[{cores}]: {r}")
    summary = {}
    for kernel, by_cores in results.items():
        lo, mid, hi = CORES
        e_lo = (by_cores[mid]["rate"] / by_cores[lo]["rate"]) / (mid / lo)
        e_hi = (by_cores[hi]["rate"] / by_cores[mid]["rate"]) / (hi / mid)
        summary[f"{kernel}_eff_{lo}_to_{mid}"] = round(e_lo, 3)
        summary[f"{kernel}_eff_{mid}_to_{hi}"] = round(e_hi, 3)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
