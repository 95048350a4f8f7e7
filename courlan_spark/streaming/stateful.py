"""Structured Streaming operators beyond the ingest merge:
event-time windowed aggregation with a late-data watermark, and a
custom stateful operator (applyInPandasWithState) for streaming
first-seen dedup.

These are the streaming counterparts of the batch frontier/dedup
aggregations: per-host crawl-rate windows mirror host_aggregates over
a live event stream, and the stateful dedup is the streaming form of
``dedup.exact_dedup`` — only the FIRST row per key ever crosses the
sink, regardless of how micro-batches slice the input.  State is
checkpointed by the engine; at production scale state lives in the
state store (RocksDB provider) keyed by the dedup key.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_rate_windows(
    events: DataFrame,
    ts_col: str = "ts",
    host_col: str = "host",
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-host event counts over event-time windows with a late-data
    watermark (the crawl-rate monitor).  Works on both a streaming and
    a batch DataFrame (the batch form is the oracle in tests).

    Late rows beyond ``watermark`` are dropped by the engine instead of
    reopening closed windows — the contract that makes the aggregation
    state bounded at web scale."""
    w = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    source = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return source.groupBy(w.alias("win"), F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("n_bytes")).alias("total_bytes"),
    ).select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "host",
        "n_events",
        "total_bytes",
    )


def user_session_windows(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user session aggregation via Spark's native session_window —
    the streaming dual of the batch gap-and-island formulation
    (plans/catalog.q_event_sessions; their equality is pinned in
    tests/test_catalog_oracles).  Works on both a streaming and a
    batch DataFrame.  In streaming append mode only sessions the
    watermark has closed are emitted — merge state stays bounded, the
    contract that matters when the stream is a crawl's event firehose."""
    source = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        source.groupBy(
            F.col(key_col).alias("user_id"),
            F.session_window(F.col(ts_col), gap).alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


def streaming_minhash_candidates(
    docs_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 32,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Incremental near-duplicate CANDIDATE pairs over a document
    stream: each arriving document's MinHash band keys probe per-bucket
    state (the ids already seen in that bucket) and emit (doc_a, doc_b,
    band_key) for every collision — the streaming form of the batch
    LSH candidate stage, with the bucket self-join replaced by
    applyInPandasWithState keyed on band_key.

    State per bucket is the bounded id list (``max_bucket_size``, the
    same no-silent-cap rule as the batch path: full buckets stop
    ACCUMULATING but still report collisions against the stored
    members).  Pairs are candidates only — exact Jaccard verification
    runs downstream (foreachBatch or offline), exactly as in the batch
    pipeline.  Within a batch, documents are processed in ascending id
    order so output is deterministic; doc_a < doc_b always."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..functions.hashing import make_band_hash_udf, make_minhash_udf

    minhash = make_minhash_udf(num_perm=num_perm)
    band_udf = make_band_hash_udf(bands=bands)
    banded = docs_stream.select(
        F.col(id_col).alias("doc_id"),
        F.explode(band_udf(minhash(F.col(text_col)))).alias("band_key"),
    )

    def probe(key, pdfs: Iterable[pd.DataFrame], state):
        stored: list[int] = list(state.get[0]) if state.exists else []
        members = set(stored)
        incoming: set[int] = set()
        for pdf in pdfs:
            incoming.update(int(x) for x in pdf["doc_id"])
        out_a, out_b = [], []
        new_ids: list[int] = []
        for doc in sorted(incoming):
            if doc in members:
                continue
            for other in members:
                lo, hi = (other, doc) if other < doc else (doc, other)
                out_a.append(lo)
                out_b.append(hi)
            members.add(doc)
            new_ids.append(doc)
        if len(stored) < max_bucket_size and new_ids:
            state.update((stored + new_ids[: max_bucket_size - len(stored)],))
        if out_a:
            yield pd.DataFrame(
                {
                    "doc_a": out_a,
                    "doc_b": out_b,
                    "band_key": [key[0]] * len(out_a),
                }
            )

    return banded.groupBy("band_key").applyInPandasWithState(
        probe,
        outputStructType="doc_a long, doc_b long, band_key long",
        stateStructType="ids array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_streaming_neardup(
    docs_stream: DataFrame,
    docs_table_path: str,
    out_path: str,
    checkpoint_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
    trigger_once: bool = True,
    **candidate_kwargs,
):
    """Full incremental near-duplicate pipeline on Structured
    Streaming: MinHash band-bucket state emits candidate pairs as
    documents arrive (:func:`streaming_minhash_candidates`); each
    micro-batch's candidates are exact-Jaccard verified in
    foreachBatch against the document store at ``docs_table_path``
    (the crawl's accumulated doc table — at production scale an
    Iceberg table; any doc that produced a candidate is already
    persisted there by the ingest path) and verified pairs append to
    ``out_path``.

    Returns the StreamingQuery.  Cross-batch pairs work because the
    bucket state carries earlier members: a doc arriving in batch N
    pairs against docs from batches < N without re-reading them.

    Sink idempotence (round-3 ADVICE fix): each micro-batch OVERWRITES
    its own ``batch_id=<id>`` partition directory under ``out_path``,
    so a foreachBatch retry (same batch_id) replaces rather than
    appends — the previous plain append would double-write on retries.
    Source RE-deliveries are a different case: a doc re-sent in a
    LATER batch re-emits its pairs when its bucket was already full
    (full buckets stop persisting new member ids, by design — bounded
    state), landing in a different batch directory.  Consumers must
    therefore dedup (doc_a, doc_b) across batches —
    :func:`read_verified_pairs` does exactly that."""
    import os

    from ..operators import dedup

    candidates = streaming_minhash_candidates(
        docs_stream, id_col=id_col, text_col=text_col, **candidate_kwargs
    )

    def verify_batch(batch_df: DataFrame, batch_id: int) -> None:
        pairs = batch_df.select("doc_a", "doc_b").distinct()
        docs = batch_df.sparkSession.read.parquet(docs_table_path)
        verified = dedup.verify_pairs_jaccard(
            pairs, docs, id_col=id_col, text_col=text_col, threshold=threshold
        )
        verified.write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch_id={batch_id}")
        )

    writer = candidates.writeStream.foreachBatch(verify_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_verified_pairs(spark, out_path: str) -> DataFrame:
    """Read the streaming near-dup sink: distinct verified (doc_a,
    doc_b, jaccard) across all batch directories.  The per-pair dedup
    absorbs source re-deliveries of full-bucket docs (see
    start_streaming_neardup)."""
    return (
        spark.read.parquet(out_path)
        .select("doc_a", "doc_b", "jaccard")
        .dropDuplicates(["doc_a", "doc_b"])
    )


_DEDUP_STATE_SCHEMA = "emitted boolean"


def streaming_first_seen(
    stream: DataFrame,
    key_col: str,
    order_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Streaming exact dedup via applyInPandasWithState: for every
    distinct ``key_col`` value, exactly ONE row (the minimum by
    ``order_col`` within the first batch that carries the key) is
    emitted across the whole stream; later occurrences — same batch or
    any later micro-batch — are swallowed by the per-key state.

    Output schema: key_col, order_col, *payload_cols."""
    out_fields = [key_col, order_col, *payload_cols]

    def first_seen(key, pdfs: Iterable[pd.DataFrame], state):
        if state.exists:
            return
        best = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            cand = pdf.sort_values(order_col).iloc[:1]
            if best is None or cand[order_col].iloc[0] < best[order_col].iloc[0]:
                best = cand
        state.update((True,))
        if best is not None:
            yield best[out_fields]

    by_name = {f.name: f for f in stream.schema}
    out_schema = ", ".join(
        f"{name} {by_name[name].dataType.simpleString()}" for name in out_fields
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy(key_col).applyInPandasWithState(
        first_seen,
        outputStructType=out_schema,
        stateStructType=_DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
