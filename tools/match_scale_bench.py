"""Template-match cost vs library size (13 → 2000 templates).

The reference caps its library at 2000 templates (config_default.yaml:23);
ftp ships 199, cm 983. The D1/D2 match joins each line against
candidates sharing (token_count, first_token) — cost grows with the
candidate-bucket size, not the library size, so a 150x bigger library
should NOT cost 150x. This bench measures it.

Synthetic library: the real datagen templates plus N generated ones
with realistic shape (2-10 tokens, Zipfian first-token reuse so
candidate buckets actually grow).

Usage: python tools/match_scale_bench.py [n_docs] [lib_sizes...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synth_templates(n: int) -> list[str]:
    """Deterministic template strings with drain-like shape."""
    first = ["Trace:", "Command:", "Response:", "Status:", "Error:",
             "Warn:", "Info:", "Debug:"]
    verbs = ["opening", "closing", "sending", "receiving", "retrying",
             "binding", "parsing", "flushing"]
    nouns = ["socket", "channel", "buffer", "session", "handle",
             "queue", "stream", "frame"]
    out = []
    i = 0
    while len(out) < n:
        f = first[i % len(first)]
        v = verbs[(i // 7) % len(verbs)]
        nn = nouns[(i // 3) % len(nouns)]
        k = i % 5
        tail = ["<*>"] * k + [f"v{i}"]
        out.append(" ".join([f, v, nn] + tail))
        i += 1
    return out


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    sizes = [int(x) for x in sys.argv[2:]] or [13, 200, 1000, 2000]

    from pyspark.sql import functions as F

    from loganalyzer_spark import datagen
    from loganalyzer_spark.operators import match, parse
    from loganalyzer_spark.session import get_spark

    spark = get_spark(app="match_scale")
    corpus = f"/tmp/loganalyzer_bench/corpus_{n_docs}"
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        datagen.gen_raw_lines(spark, n_docs).write.mode("overwrite").parquet(
            corpus
        )
    masked = parse.mask(parse.wash(spark.read.parquet(corpus)))
    masked = masked.select("doc_id", "line_no", "masked").localCheckpoint(
        eager=True
    )
    n_rows = masked.count()

    results = {}
    for size in sizes:
        extra = synth_templates(max(0, size - 13))
        rows = datagen.template_rows() + [
            (
                datagen.event_id_of(t),
                t,
                len(t.split(" ")),
                t.split(" ")[0],
                t.split(" ")[1],
                sum(1 for x in t.split(" ") if x == "<*>"),
                datagen.template_regex(t),
            )
            for t in extra
        ]
        tmpl = spark.createDataFrame(rows, datagen.TEMPLATE_SCHEMA)

        def build():
            return match.match_templates(masked, tmpl).select(
                F.sum(F.length("event_id")), F.sum("is_new")
            )

        build().collect()  # warm
        t0 = time.time()
        build().collect()
        results[size] = round(time.time() - t0, 3)
        print(f"lib={size}: {results[size]}s")

    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "rows": n_rows,
                "walls_by_lib_size": results,
                "cost_ratio_2000_vs_13": round(
                    results[max(sizes)] / results[min(sizes)], 2
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
