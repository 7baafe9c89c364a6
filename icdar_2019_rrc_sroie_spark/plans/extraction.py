"""Flagship end-to-end extraction plan (SURVEY.md §3.2 recast).

transcripts (conv_id, turn_idx, role, text, tool, ts)
  → boilerplate strip (pure Catalyst)
  → line explode
  → deterministic span classifier (Catalyst)
  → run segmentation + entity rules (Catalyst)
  → spans (conv_id, turn_idx, label, text)

Scale notes: the unit of parallelism is the *turn*, not the conversation —
partitioning on (conv_id, turn_idx) makes long-conversation skew a
non-issue for this stage (a 5,000-turn conversation spreads over all
executors). The single exchange introduced by the window/groupBys is
hash(conv_id, turn_idx); Catalyst reuses it across the window, both
aggregations and the join (verified via explain in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.boilerplate import to_clean_lines
from ..operators.classify import classify_lines
from ..operators.spans import assemble_spans

SPAN_COLUMNS = ("conv_id", "turn_idx", "label", "text")


def turn_lines(transcripts: DataFrame) -> DataFrame:
    """Strip boilerplate and explode payloads into ordered line rows."""
    return transcripts.select(
        "conv_id",
        "turn_idx",
        F.posexplode(to_clean_lines(F.col("text"))).alias("line_idx", "text"),
    )


def extract_spans(transcripts: DataFrame) -> DataFrame:
    """Full pipeline: transcripts → labeled entity spans per turn."""
    lines = turn_lines(transcripts)
    classified = classify_lines(lines)
    return assemble_spans(classified)


def ordered_spans(spans: DataFrame) -> DataFrame:
    """Stable (conv_id, turn_idx, label) output ordering (north rule W2)."""
    return spans.repartitionByRange("conv_id", "turn_idx").sortWithinPartitions(
        "conv_id", "turn_idx", "label"
    )
