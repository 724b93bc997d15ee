"""Custom stateful streaming operator — ``applyInPandasWithState``.

The reference's only incremental state is per-session bookkeeping during
its sequential scans (preprocess_base.py:684-731) and partial-fit model
updates (loglizer.py:429-471). Under Structured Streaming the equivalent
is keyed state: this operator maintains a running per-document event
profile (lines seen, anomaly lines, distinct-event map) across
micro-batches, emitting the updated profile on every batch (update mode).

State is bounded: one small tuple + a ≤vocab-sized map per live key, and
keys can be expired with a processing-time timeout in production (pass
``timeout='ProcessingTimeTimeout'`` and call ``state.setTimeoutDuration``
— left off here for deterministic tests). Arrow moves the batches;
there is no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = "lines BIGINT, abn BIGINT, events MAP<STRING, BIGINT>"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lines", T.LongType()),
        T.StructField("abn", T.LongType()),
        T.StructField("n_events", T.IntegerType()),
        T.StructField("top_event", T.StringType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        lines, abn, events = state.get
        events = dict(events) if events else {}
    else:
        lines, abn, events = 0, 0, {}
    for pdf in pdfs:
        lines += len(pdf)
        abn += int(pdf["is_abn"].sum())
        for eid, c in pdf["event_id"].value_counts().items():
            events[eid] = events.get(eid, 0) + int(c)
    state.update((lines, abn, events))
    top = max(events.items(), key=lambda kv: (kv[1], kv[0]))[0] if events else None
    yield pd.DataFrame(
        {
            "doc_id": [key[0]],
            "lines": [lines],
            "abn": [abn],
            "n_events": [len(events)],
            "top_event": [top],
        }
    )


def stateful_doc_profiles(routed_stream: DataFrame) -> DataFrame:
    """streaming routed lines → per-doc running profile (keyed state).

    Input needs (doc_id, is_abn, event_id). Output one row per key per
    micro-batch with the accumulated profile — proof that state carries
    across batches (tests feed the same keys in two batches and assert
    the totals are cumulative).
    """
    return (
        routed_stream.select("doc_id", "is_abn", "event_id")
        .groupBy("doc_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
