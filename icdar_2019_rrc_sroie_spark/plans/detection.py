"""Detection plan (SURVEY.md §3.1 recast): the reference's
``TextDetector.__call__`` (data/postprocessing/detector.py:27-93) as a
DataFrame pipeline:

predictions (doc_id, anchor_id, vc, vh, score)
  ⋈ broadcast anchor grid
  → decode (X14) → clip (F2) → score filter (F1)   [pure Catalyst]
  → per-doc greedy NMS (J3)                        [applyInPandas]
  → per-doc connector (J4/J5/A1)                   [applyInPandas]
  → text lines (doc_id, line_id, box, score)

Catalyst keeps decode/clip/filter fused in one codegen stage before the
only exchange (hash on doc_id for the grouped kernels); the score
filter runs *before* the shuffle, exactly like the reference orders
threshold before NMS (detector.py:70-83).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import MIN_SCORE, NMS_THRESH
from ..operators.detection_kernels import connect_lines_per_doc, nms_per_doc
from ..operators.geometry import clip_expr, decode_box


def detect_text_lines(predictions: DataFrame, anchors: DataFrame,
                      img_w: float, img_h: float,
                      min_score: float = MIN_SCORE,
                      nms_thresh: float = NMS_THRESH) -> DataFrame:
    """predictions: (doc_id, anchor_id, vc, vh, score);
    anchors: (anchor_id, xmin, ymin, xmax, ymax) — broadcast dim."""
    a = F.broadcast(anchors).select(
        "anchor_id",
        F.col("xmin").alias("a_xmin"), F.col("ymin").alias("a_ymin"),
        F.col("xmax").alias("a_xmax"), F.col("ymax").alias("a_ymax"),
    )
    joined = predictions.join(a, "anchor_id")
    d_ymin, d_ymax = decode_box(
        F.col("vc"), F.col("vh"), F.col("a_ymin"), F.col("a_ymax")
    )
    proposals = joined.select(
        "doc_id",
        F.col("anchor_id").alias("proposal_id"),
        clip_expr(F.col("a_xmin"), F.lit(img_w)).alias("xmin"),
        clip_expr(d_ymin, F.lit(img_h)).alias("ymin"),
        clip_expr(F.col("a_xmax"), F.lit(img_w)).alias("xmax"),
        clip_expr(d_ymax, F.lit(img_h)).alias("ymax"),
        "score",
    ).filter(F.col("score") > min_score)

    survivors = nms_per_doc(proposals, nms_thresh)
    survivors = survivors.withColumn(
        "proposal_id", F.col("pick_order")
    )
    return connect_lines_per_doc(survivors, int(img_w), int(img_h))
