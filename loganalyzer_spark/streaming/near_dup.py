"""Streaming near-dup detection — MinHash LSH with keyed band state.

The batch tier detects near-duplicate documents with banded MinHash
(``operators/dedup.py::minhash_signatures`` / ``lsh_candidate_pairs``);
this module is its streaming twin for an at-least-once 100 TB ingest:
suppress near-duplicates AT INGEST, against everything already seen,
without re-scanning the corpus per micro-batch.

Shape: the signature/banding steps are the SAME stateless column
expressions as batch (projection + explode work unchanged under
Structured Streaming), then ``applyInPandasWithState`` keyed on
``(band_id, band_hash)`` holds one value per live band bucket — the
first document that claimed it. Later documents landing in a claimed
bucket emit ``(doc_id, dup_of, band_id)`` collision candidates, the
same candidate-pair contract as ``lsh_candidate_pairs`` (a downstream
verifier applies the Jaccard check; a doc colliding on several bands
emits once per band, distinct() is the consumer's).

State is ONE long per non-empty band bucket — the minimum any
LSH index must remember — and can be bounded with a processing-time
timeout (``ttl``): buckets idle longer than the TTL are evicted, so a
re-arrival after the horizon re-claims the bucket instead of flagging
(the same bounded-state trade-off as streaming_dedup's watermark).

Reference parity: the reference is batch-only (SURVEY §2.11); this
extends its template-library "have I seen this before" semantics to the
document tier under streaming, the way stream_ecm extends A12.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from loganalyzer_spark.operators.dedup import minhash_signatures

STATE_SCHEMA = "first_doc BIGINT"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("dup_of", T.LongType()),
        T.StructField("band_id", T.IntegerType()),
    ]
)


def _bucket_update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    ttl_ms: int | None = None,
) -> Iterator[pd.DataFrame]:
    if ttl_ms is not None and state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        first = int(state.get[0])
    else:
        first = None
    # Accumulate ALL chunks before picking the claimant: a key group
    # can span multiple pandas chunks in the iterator, and sorting
    # per-chunk would let an earlier chunk's larger doc_id claim the
    # bucket over a later chunk's smaller one — the dup_of orientation
    # would then vary with chunking (run-to-run at scale), breaking
    # the batch tier's a < b contract (ADVICE r4).
    all_ids: set[int] = set()
    for pdf in pdfs:
        all_ids.update(int(x) for x in pdf["doc_id"])
    docs: list[int] = []
    dups: list[int] = []
    for d in sorted(all_ids):
        if first is None:
            first = d
        elif d != first:
            docs.append(d)
            dups.append(first)
    state.update((first,))
    if ttl_ms is not None:
        # must follow update(): a timeout can only be set on live state
        state.setTimeoutDuration(ttl_ms)
    if docs:
        yield pd.DataFrame(
            {
                "doc_id": docs,
                "dup_of": dups,
                "band_id": [int(key[0])] * len(docs),
            }
        )


def streaming_near_dup(
    docs_stream: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    ttl_ms: int | None = None,
) -> DataFrame:
    """streaming docs → banded MinHash → keyed band-bucket state →
    (doc_id, dup_of, band_id) collision candidates.

    ``ttl_ms`` None keeps state forever (deterministic tests); set it in
    production to evict idle buckets (bounded state)."""
    rows = num_hashes // bands
    sigs = minhash_signatures(
        docs_stream.select(F.col(key).alias("doc_id"), text),
        "doc_id",
        text,
        n,
        num_hashes,
    )
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands} - 1),"
                f" b -> md5(array_join(slice(sig, b * {rows} + 1, {rows}), '_')))"
            )
        ).alias("band_id", "band_hash"),
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def update(key, pdfs, state):
        return _bucket_update(key, pdfs, state, ttl_ms)

    return banded.groupBy("band_id", "band_hash").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
