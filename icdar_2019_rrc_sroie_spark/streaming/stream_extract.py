"""Structured Streaming face of the extraction engine.

The reference is batch-only (SURVEY.md §2.10), and the north rule keeps
the engine batch-first — but because the flagship extraction plan is a
*stateless projection* (plans/extraction.py), the identical code runs
unchanged under ``readStream``: micro-batches of transcript turns in,
span rows out, no state store needed.

Two streaming extras are provided for pipeline telemetry:

* ``streaming_spans`` — extraction over any streaming transcripts
  source (the same `extract_spans` call).
* ``windowed_span_counts`` — watermarked tumbling-window span counts
  per label (late data handled by the watermark), the streaming analog
  of the reference's running meters (A7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.extraction import extract_spans_stateless


def streaming_spans(transcript_stream: DataFrame) -> DataFrame:
    """Stateless strategy of the same plan — streaming-legal as-is."""
    return extract_spans_stateless(transcript_stream)


def windowed_span_counts(transcript_stream: DataFrame,
                         window: str = "1 minute",
                         watermark: str = "2 minutes") -> DataFrame:
    """Spans per (event-time window, label) with late-data watermark.

    ``transcript_stream`` must carry the ``ts`` column; the span rows
    inherit it via a join-free pass-through projection.
    """
    spans = extract_spans_stateless(transcript_stream, passthrough=("ts",))
    return (
        spans.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "label")
        .agg(F.count(F.lit(1)).alias("n_spans"))
    )


def sessionize_conversations(transcript_stream: DataFrame,
                             gap: str = "30 minutes",
                             watermark: str = "10 minutes") -> DataFrame:
    """Custom stateful operator: per-conversation session assembly via
    ``applyInPandasWithState`` (§2.10 — the W2 turn-order restore as a
    stream).

    State per conv_id: turn count, receipt-turn count, min/max event
    time. A session closes when event time advances past the last turn
    plus ``gap`` (event-time timeout against the watermark); the closed
    session is emitted as one summary row. This is the streaming analog
    of grouping a conversation's turns in batch — bounded state (a few
    counters per live conversation), skew-free (state is per conv_id,
    emission is O(1) per session).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("n_tool_turns", T.LongType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
    ])
    state_schema = T.StructType([
        T.StructField("n_turns", T.LongType()),
        T.StructField("n_tool_turns", T.LongType()),
        T.StructField("first_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ])
    gap_ms = int(pd.Timedelta(gap).total_seconds() * 1000)

    def fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            n, tool, first_us, last_us = state.get
            state.remove()
            yield pd.DataFrame({
                "conv_id": [key[0]],
                "n_turns": [n],
                "n_tool_turns": [tool],
                "first_ts": [pd.Timestamp(first_us, unit="us")],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
            })
            return
        n = tool = 0
        first_us = last_us = None
        if state.exists:
            n, tool, first_us, last_us = state.get
        for pdf in pdf_iter:
            n += len(pdf)
            tool += int((pdf["role"] == "tool").sum())
            ts_us = pdf["ts"].astype("int64") // 1000
            lo, hi = int(ts_us.min()), int(ts_us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        state.update((n, tool, first_us, last_us))
        state.setTimeoutTimestamp(last_us // 1000 + gap_ms)
        return
        yield  # pragma: no cover - generator marker

    return (
        transcript_stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_dedup(doc_stream: DataFrame,
                    watermark: str = "10 minutes",
                    id_col: str = "doc_id",
                    text_col: str = "text",
                    ts_col: str = "ts") -> DataFrame:
    """Streaming exact dedup: emit ONE occurrence of each
    normalized-content fingerprint (operators/dedup.py semantics) as
    documents arrive — the within-batch survivor is arbitrary, like
    batch dropDuplicates; only the fingerprint key is the contract.

    ``dropDuplicatesWithinWatermark`` keys the state store on the
    md5 fingerprint and evicts entries once the watermark passes —
    bounded state (the batch groupBy's streaming analog), unlike a
    plain ``dropDuplicates`` whose state grows without bound. Within
    the watermark horizon a re-arriving duplicate is suppressed
    regardless of micro-batch boundaries; after eviction a duplicate
    would re-emit, which is exactly the documented horizon contract
    (at 100 TB/day the horizon bounds state to the dedup window you
    can afford, and the batch `dedup_clusters` pass catches the rest).
    """
    from ..operators.dedup import fingerprint

    keyed = doc_stream.withColumn("fp", fingerprint(F.col(text_col)))
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
        .select(id_col, "fp", ts_col, text_col)
    )


def enrich_spans_stream(transcript_stream: DataFrame,
                        label_dim: DataFrame) -> DataFrame:
    """Stream-static join: streaming span rows enriched with a static
    dimension table (per-label weights/config). Spark plans the static
    side as a broadcast against every micro-batch — no state store, no
    watermark needed. Note the static side's FILE LISTING (for a
    file-backed dim) is pinned when the DataFrame is created: the
    values are re-read per batch from those files, but a dim replaced
    on disk (new part files) is NOT picked up and its deleted files
    can fail the stream — swap dims by restarting the query or joining
    inside foreachBatch (same contract as
    incremental.streaming_band_candidates). This is the streaming
    analog of the batch plan's broadcast class-weights join (A3)."""
    spans = extract_spans_stateless(transcript_stream)
    return spans.join(F.broadcast(label_dim), "label", "left")
