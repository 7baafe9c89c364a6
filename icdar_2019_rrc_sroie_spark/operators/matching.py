"""Anchor↔ground-truth matching as relational algebra (J1/J2/F4/F5/X13).

The reference computes a dense M×N IoU matrix per image and vectorized
argmaxes (target_transformation.py:118-193). Here the same semantics are
expressed as: broadcast cross join (anchor grid is a small dim table) →
IoU expression → two argmax windows → forced-assignment override →
threshold labeling → encode.

At 100 TB scale the anchor grid stays a broadcast constant; the join is
per-document and never shuffles the anchor side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..constants import (
    IGNORE_LABEL,
    NEGATIVE_JACCARD_OVERLAP,
    NEGATIVE_LABEL,
    POSITIVE_JACCARD_OVERLAP,
    POSITIVE_LABEL,
)
from .geometry import encode_box, iou_expr


def match_anchors(anchors: DataFrame, gt: DataFrame,
                  img_w: float, img_h: float,
                  pos_iou: float = POSITIVE_JACCARD_OVERLAP,
                  neg_iou: float = NEGATIVE_JACCARD_OVERLAP) -> DataFrame:
    """Per (doc_id, anchor_id): matched gt, encoded targets and label.

    ``anchors``: (anchor_id, xmin, ymin, xmax, ymax) — broadcast.
    ``gt``: (doc_id, gt_id, xmin, ymin, xmax, ymax).

    Reproduces the reference tie/override semantics:
      * per-anchor argmax over gt → first (lowest gt_id) on ties,
      * per-gt argmax over anchors → first (lowest anchor_id) on ties,
      * every gt forces its best anchor to itself; when several gt share
        one best anchor the highest gt_id wins (vectorized scatter,
        last write wins — target_transformation.py:163),
      * forced anchors are positive regardless of IoU
        (target_transformation.py:166),
      * outside-image anchors are ignored last
        (target_transformation.py:177-185).
    """
    a = F.broadcast(anchors).select(
        "anchor_id",
        F.col("xmin").alias("a_xmin"), F.col("ymin").alias("a_ymin"),
        F.col("xmax").alias("a_xmax"), F.col("ymax").alias("a_ymax"),
    )
    g = gt.select(
        "doc_id", "gt_id",
        F.col("xmin").alias("g_xmin"), F.col("ymin").alias("g_ymin"),
        F.col("xmax").alias("g_xmax"), F.col("ymax").alias("g_ymax"),
    )
    pairs = g.crossJoin(a).withColumn(
        "iou",
        iou_expr(
            F.col("a_xmin"), F.col("a_ymin"), F.col("a_xmax"), F.col("a_ymax"),
            F.col("g_xmin"), F.col("g_ymin"), F.col("g_xmax"), F.col("g_ymax"),
        ),
    )

    w_anchor = Window.partitionBy("doc_id", "anchor_id").orderBy(
        F.desc("iou"), F.asc("gt_id")
    )
    best_gt = (
        pairs.withColumn("rn", F.row_number().over(w_anchor))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )

    w_gt = Window.partitionBy("doc_id", "gt_id").orderBy(
        F.desc("iou"), F.asc("anchor_id")
    )
    forced = (
        pairs.withColumn("rn", F.row_number().over(w_gt))
        .filter(F.col("rn") == 1)
        .groupBy("doc_id", "anchor_id")
        .agg(F.max("gt_id").alias("forced_gt_id"))
    )

    merged = best_gt.join(forced, ["doc_id", "anchor_id"], "left")
    gt_dim = g.withColumnRenamed("gt_id", "forced_gt_id")
    resolved = (
        merged.alias("m")
        .join(
            gt_dim.alias("fg"),
            ["doc_id", "forced_gt_id"],
            "left",
        )
        .select(
            "doc_id",
            "anchor_id",
            F.col("m.a_xmin").alias("a_xmin"),
            F.col("m.a_ymin").alias("a_ymin"),
            F.col("m.a_xmax").alias("a_xmax"),
            F.col("m.a_ymax").alias("a_ymax"),
            F.coalesce("forced_gt_id", F.col("m.gt_id")).alias("matched_gt_id"),
            F.coalesce(F.col("fg.g_ymin"), F.col("m.g_ymin")).alias("m_ymin"),
            F.coalesce(F.col("fg.g_ymax"), F.col("m.g_ymax")).alias("m_ymax"),
            F.when(F.col("forced_gt_id").isNotNull(), F.lit(1.0))
            .otherwise(F.col("iou"))
            .alias("eff_iou"),
        )
    )

    vc, vh = encode_box(
        F.col("m_ymin"), F.col("m_ymax"), F.col("a_ymin"), F.col("a_ymax")
    )
    outside = (
        (F.col("a_xmin") < 0) | (F.col("a_ymin") < 0)
        | (F.col("a_xmax") > img_w) | (F.col("a_ymax") > img_h)
    )
    label = (
        F.when(outside, F.lit(IGNORE_LABEL))
        .when(F.col("eff_iou") > pos_iou, F.lit(POSITIVE_LABEL))
        .when(F.col("eff_iou") < neg_iou, F.lit(NEGATIVE_LABEL))
        .otherwise(F.lit(IGNORE_LABEL))
    )
    return resolved.select(
        "doc_id", "anchor_id", "matched_gt_id",
        vc.alias("vc"), vh.alias("vh"),
        label.alias("label"), "eff_iou",
    )
