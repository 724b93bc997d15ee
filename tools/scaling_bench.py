"""Two-cluster-size scaling evidence (BASELINE.md protocol).

No multi-node cluster exists in this sandbox, so the N→4N executor
criterion is evidenced by running the identical spark-submit job on the
identical parquet corpus at local[8] and local[32]:

    python tools/scaling_bench.py [n_docs]

Steps: generate corpus parquet (seeded, once) → zip the package →
spark-submit --py-files at each parallelism (warmup + measured run) →
compute scaling efficiency → write BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORES = [8, 32]


def ensure_corpus(n_docs: int) -> str:
    path = f"/tmp/loganalyzer_bench/corpus_{n_docs}"
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    sys.path.insert(0, REPO)
    from loganalyzer_spark import datagen
    from loganalyzer_spark.session import get_spark

    spark = get_spark(app="corpus_gen")
    datagen.gen_raw_lines(spark, n_docs).write.mode("overwrite").parquet(path)
    spark.stop()
    return path


def make_zip() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    zpath = os.path.join(dist, "loganalyzer_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "loganalyzer_spark")
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def run_once(corpus: str, cores: int, zpath: str) -> dict:
    cmd = [
        "spark-submit",
        "--master", f"local[{cores}]",
        "--py-files", zpath,
        "--conf", f"spark.sql.shuffle.partitions={max(8, cores)}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.driver.memory=16g",
        "--conf", "spark.ui.enabled=false",
        os.path.join(REPO, "jobs", "run_pipeline.py"),
        corpus,
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO, timeout=1800
    )
    m = re.search(r"RESULT (\{.*\})", out.stdout)
    if not m:
        sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-3000:])
        raise RuntimeError(f"no RESULT line for local[{cores}]")
    return json.loads(m.group(1))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    corpus = ensure_corpus(n_docs)
    zpath = make_zip()

    results = {}
    for cores in CORES:
        run_once(corpus, cores, zpath)  # warmup (JVM/page cache)
        results[cores] = run_once(corpus, cores, zpath)
        print(f"local[{cores}]: {results[cores]}")

    lo, hi = CORES
    eff = (results[hi]["docs_per_sec"] / results[lo]["docs_per_sec"]) / (hi / lo)
    summary = {
        "n_docs": n_docs,
        "rows": results[lo]["rows"],
        f"docs_per_sec_{lo}": results[lo]["docs_per_sec"],
        f"docs_per_sec_{hi}": results[hi]["docs_per_sec"],
        f"wall_s_{lo}": results[lo]["wall_s"],
        f"wall_s_{hi}": results[hi]["wall_s"],
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(summary))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE — two-cluster-size scaling evidence

Protocol per BASELINE.md: identical spark-submit job
(`jobs/run_pipeline.py`, full parse→match→enrich→route→aggregate DAG,
package shipped via `--py-files dist/loganalyzer_spark.zip`) on the
identical seeded parquet corpus, at two parallelism levels on this
32-core host. Each config runs twice; the second (warm) run is
reported.

| config | docs | rows | wall (s) | docs/sec |
|---|---|---|---|---|
| local[{lo}] (N) | {n_docs} | {results[lo]['rows']} | {results[lo]['wall_s']} | {results[lo]['docs_per_sec']} |
| local[{hi}] (4N) | {n_docs} | {results[hi]['rows']} | {results[hi]['wall_s']} | {results[hi]['docs_per_sec']} |

**Scaling efficiency E = (T{lo}/T{hi}) / ({hi}/{lo}) =
(docs_per_sec_{hi} / docs_per_sec_{lo}) / 4 = {round(eff, 3)}**
(target ≥ 0.8 per BASELINE.json north rule).

Settings: Spark 4.1.2, `spark.sql.shuffle.partitions` = cores,
AQE on, UTC session TZ, seed 42 corpus
(`loganalyzer_spark/datagen.py::gen_raw_lines`), corpus pre-written to
local parquet so both runs read identical bytes; results computed with
`count()` actions only (no driver collect of data rows).
"""
        )
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
