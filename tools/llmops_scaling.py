"""Two-parallelism scaling evidence for the LLM training-data tier.

Stages big inputs once (docs + C4 lines derived from the seeded pages
corpus), then runs each op via spark-submit (jobs/llmops_scale.py) at
local[8] and local[32] — separate pre-touched JVMs, the same protocol
as tools/scaling_bench.py — and rewrites BENCH/LLMOPS_SCALING.md with
throughput at both rungs plus the 8→32 efficiency, read against the
host-calibration ceiling (BENCH/BASELINE.md: the VM's own bare kernels
compound to ~0.62 over 1→32; 8→32 pipeline reference is 143.6k/52.6k/4
= 0.68).

Usage: python tools/llmops_scaling.py [n_docs] [reps] [ops_csv]

pack consumes METADATA only (doc key + token count), so its staged
input is 20x n_docs rows — sub-second walls on n_docs rows measure
scheduling overhead, not the operator.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OPS = ["c4", "dsir", "pack", "minhash"]
CORES = [8, 32]


def stage_inputs(n_docs: int) -> dict[str, str]:
    """Generate docs/lines inputs ONCE (subprocess JVM, like
    scaling_bench.ensure_corpus) keyed by size; generation cost never
    touches the measured runs."""
    base = f"/tmp/loganalyzer_bench/llmops_{n_docs}"
    paths = {
        "docs": f"{base}/docs",        # doc_id, text, is_target (dsir)
        "pack": f"{base}/pack_docs",   # doc_id, n_tok (20x n_docs rows)
        "lines": f"{base}/c4_lines",   # doc_id, line_no, line
    }
    if all(os.path.exists(os.path.join(p, "_SUCCESS")) for p in paths.values()):
        return paths
    code = f"""
import sys; sys.path.insert(0, {REPO!r})
from pyspark.sql import functions as F
from loganalyzer_spark import datagen
from loganalyzer_spark.session import get_spark
spark = get_spark(app='llmops_stage')
pages = datagen.gen_web_pages(spark, {n_docs})
docs = pages.select(
    "doc_id", "text", (F.col("lang") == "en").alias("is_target"))
docs.repartition(64).write.mode("overwrite").parquet({paths['docs']!r})
spark.range(0, {n_docs} * 20).select(
    F.col("id").alias("doc_id"), (50 + F.col("id") % 300).alias("n_tok")
).repartition(64).write.mode("overwrite").parquet({paths['pack']!r})
pages.select("doc_id").createOrReplaceTempView("__c4_docs")
spark.sql(datagen.c4_lines_sql("spark", "__c4_docs")).repartition(64) \\
    .write.mode("overwrite").parquet({paths['lines']!r})
spark.stop()
"""
    subprocess.run([sys.executable, "-c", code], check=True, cwd=REPO, timeout=1800)
    return paths


def run_once(op: str, inp: str, cores: int, zpath: str) -> dict:
    cmd = [
        "spark-submit",
        "--master", f"local[{cores}]",
        "--py-files", zpath,
        "--conf", f"spark.sql.shuffle.partitions={max(8, cores)}",
        "--conf", "spark.default.parallelism=32",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.driver.memory=16g",
        "--conf", "spark.sql.files.maxPartitionBytes=4194304",
        "--conf", "spark.sql.files.openCostInBytes=524288",
        "--conf",
        "spark.driver.extraJavaOptions=-XX:+UseParallelGC "
        "-Xms16g -XX:+AlwaysPreTouch",
        "--conf", "spark.ui.enabled=false",
        os.path.join(REPO, "jobs", "llmops_scale.py"),
        op,
        inp,
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, timeout=1800)
    m = re.search(r"RESULT (\{.*\})", out.stdout)
    if not m:
        sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-3000:])
        raise RuntimeError(f"no RESULT for {op} local[{cores}]")
    return json.loads(m.group(1))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    ops = sys.argv[3].split(",") if len(sys.argv) > 3 else OPS

    from bench import _host_mem_probe_mb_s
    from tools.scaling_bench import make_zip

    paths = stage_inputs(n_docs)
    zpath = make_zip()
    op_input = {
        "c4": paths["lines"],
        "dsir": paths["docs"],
        "pack": paths["pack"],
        "minhash": paths["docs"],
    }

    results: dict[str, dict[int, dict]] = {}
    for op in ops:
        results[op] = {}
        for cores in CORES:
            best = None
            probes = []
            for _ in range(reps):
                probes.append(_host_mem_probe_mb_s())
                r = run_once(op, op_input[op], cores, zpath)
                # one-sided hazard: keep the best rep per rung
                if best is None or r["rows_in_per_sec"] > best["rows_in_per_sec"]:
                    best = r
            best["probes_mb_s"] = probes
            results[op][cores] = best
            print(f"{op} local[{cores}]: {best}", flush=True)

    lines = [
        f"# BENCH/LLMOPS_SCALING — LLM-tier ops at two parallelism levels "
        f"({n_docs} docs)",
        "",
        "Separate pre-touched 16g JVMs per run (the scaling_bench",
        "protocol: warm pass in-process, fresh plan timed, best-of-"
        f"{reps} per rung under the one-sided host-paging hazard,",
        "per-rep probes published). Timed action hashes every output",
        "column (jobs/llmops_scale.py::materialize) so Catalyst cannot",
        "prune the operator under test. Efficiency = throughput32 /",
        "throughput8 / 4 = (t8/t32)/4, read",
        "against this VM's bare-kernel 8→32 compound ceiling ~0.62-0.68",
        "(BENCH/BASELINE.md / HOST calibration).",
        "",
        "| op | input rows | local[8] rows/s | local[32] rows/s | "
        "8→32 eff | probes 8 / 32 (MB/s) |",
        "|---|---|---|---|---|---|",
    ]
    for op in ops:
        r8, r32 = results[op][8], results[op][32]
        eff = round((r32["rows_in_per_sec"] / r8["rows_in_per_sec"]) / 4.0, 3)
        lines.append(
            f"| {op} | {r8['rows_in']} | {r8['rows_in_per_sec']} "
            f"| {r32['rows_in_per_sec']} | {eff} "
            f"| {r8['probes_mb_s']} / {r32['probes_mb_s']} |"
        )
    lines += ["", "```json", json.dumps(results), "```", ""]
    suffix = "" if ops == OPS else "_" + "_".join(ops)
    out_path = os.path.join(REPO, "BENCH", f"LLMOPS_SCALING{suffix}.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
