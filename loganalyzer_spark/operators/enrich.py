"""Enrichment + routing (SURVEY.md §2.5, §3 / north rule "route").

All reference lookups are dict/list lookups; here they are broadcast
hash joins against small dimensions:

  J2 knowledge base  → (event_id → severity/descpt), default 'info'
                       (extensions/ftp/knowledgebase.py:44-52 — events
                       absent from the KB carry no recommendation).
  J4 lang dim        → optional broadcast join on lang.
  routing            → sink_class from severity + the 'abn: ' label,
                       mirroring the per-class report fan-out
                       (loglab.py:747-800, oldschool.py:137-157).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SINK_CASE = (
    "CASE WHEN is_abn = 1 THEN 'c001' "
    "WHEN severity IN ('fatal', 'error') THEN 'c001' "
    "WHEN severity = 'warning' THEN 'c002' "
    "WHEN severity = 'notice' THEN 'c003' "
    "ELSE 'normal' END"
)


def enrich_kb(lines: DataFrame, kb: DataFrame) -> DataFrame:
    return lines.join(F.broadcast(kb), "event_id", "left").withColumn(
        "severity", F.coalesce("severity", F.lit("info"))
    )


def route(lines: DataFrame) -> DataFrame:
    """Assign exactly one sink_class per row (routed-row equality gate)."""
    return lines.withColumn("sink_class", F.expr(SINK_CASE))


def write_sinks(
    routed: DataFrame, out_dir: str, salt_buckets: int = 16
) -> None:
    """Fan-out to per-class sinks (S11) via a single partitionBy write.

    Sink-class frequency is skewed (most rows are 'normal'); salting the
    shuffle key spreads each sink's rows over ``salt_buckets`` writer
    tasks instead of one hot task per class (SURVEY.md §4.1).
    """
    (
        routed.repartition(
            salt_buckets * 4,
            "sink_class",
            (F.rand(42) * salt_buckets).cast("int"),
        )
        .write.mode("overwrite")
        .partitionBy("sink_class")
        .parquet(out_dir)
    )
