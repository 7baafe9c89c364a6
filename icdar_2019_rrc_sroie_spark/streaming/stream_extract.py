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
