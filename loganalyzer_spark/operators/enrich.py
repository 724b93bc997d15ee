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


# ---------------------------------------------------------------------------
# J2: param-dependent KB rules + stateful context rule
# ---------------------------------------------------------------------------

from pyspark.sql import Window  # noqa: E402

# event ids the rules key on (computed like drain.py:732)
import hashlib as _hashlib  # noqa: E402

_RETR_ID = _hashlib.md5(b"Command: RETR <*>").hexdigest()[:8]
_CONN_ID = _hashlib.md5(b"Trace: Connecting to <*> port <*>").hexdigest()[:8]
_TLS_ID = _hashlib.md5(b"Error: GnuTLS error <*> in gnutls_record_recv").hexdigest()[:8]
_DISC_ID = _hashlib.md5(b"Status: Disconnected from server").hexdigest()[:8]


def apply_param_rules(lines: DataFrame) -> DataFrame:
    """The KB's ~12 param-dependent rules re-expressed as generated
    ``when()`` predicates over the extracted ``params`` array
    (extensions/ftp/knowledgebase.py:62-83 switches on int(params[0])
    etc.), plus the one rule that is stateful across rows
    (context_store, extensions/cm/knowledgebase.py:25,299-305): a
    disconnect after an earlier TLS fatal in the same document
    escalates to 'error' — expressed as max-flag-so-far over a window,
    exactly SURVEY §2.5 J2's disposition.

    Input needs: event_id, params, severity, doc_id, line_no.
    Output: severity_kb column (refined severity).
    """
    p1 = F.element_at("params", 1)
    p2 = F.element_at("params", 2)

    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    had_fatal = F.coalesce(
        F.max((F.col("event_id") == _TLS_ID).cast("int")).over(w_prev), F.lit(0)
    )

    refined = (
        # rule: RETR of a *0.dat file is a notable checkpoint fetch
        F.when(
            (F.col("event_id") == _RETR_ID) & p1.rlike("0\\.dat$"),
            F.lit("notice"),
        )
        # rule: connects to an odd port are suspicious
        .when(
            (F.col("event_id") == _CONN_ID)
            & (p2.cast("long") % 2 == 1),
            F.lit("warning"),
        )
        # stateful rule: disconnect following a TLS fatal in-document
        .when(
            (F.col("event_id") == _DISC_ID) & (had_fatal == 1),
            F.lit("error"),
        )
        .otherwise(F.col("severity"))
    )
    return lines.withColumn("severity_kb", refined)
