"""Extraction F1 vs ground truth (the reference's task-3 score,
README.md:157 / keyword_information_extraction/README.md:106-175).

SROIE task-3 scoring: an extracted field counts as a true positive iff
its text equals the ground truth exactly; precision = TP / #extracted,
recall = TP / #gt, hmean = 2PR/(P+R). Computed corpus-wide and
per-label as plain joins/aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import ENTITY_LABELS

_KEYS = ("conv_id", "turn_idx")


def gt_spans(gt_entities: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, company, date, address, total) → span rows,
    null fields dropped."""
    stacked = gt_entities.select(
        *_KEYS,
        F.expr(
            "stack({n}, {args}) as (label, text)".format(
                n=len(ENTITY_LABELS),
                args=", ".join(f"'{l}', {l}" for l in ENTITY_LABELS),
            )
        ),
    )
    return stacked.filter(F.col("text").isNotNull() & (F.col("text") != ""))


def extraction_scores(spans: DataFrame, gt_entities: DataFrame) -> DataFrame:
    """Per-label precision/recall/hmean + corpus row (label='__all__')."""
    gt = gt_spans(gt_entities)
    tp = (
        spans.join(gt, [*_KEYS, "label", "text"], "inner")
        .groupBy("label").agg(F.count(F.lit(1)).alias("tp"))
    )
    n_ext = spans.groupBy("label").agg(F.count(F.lit(1)).alias("extracted"))
    n_gt = gt.groupBy("label").agg(F.count(F.lit(1)).alias("expected"))
    per_label = (
        n_gt.join(n_ext, "label", "full").join(tp, "label", "full")
        .fillna(0, ["tp", "extracted", "expected"])
    )
    corpus = per_label.agg(
        F.lit("__all__").alias("label"),
        F.sum("expected").alias("expected"),
        F.sum("extracted").alias("extracted"),
        F.sum("tp").alias("tp"),
    )
    both = per_label.select("label", "expected", "extracted", "tp") \
        .unionByName(corpus)
    precision = F.when(F.col("extracted") > 0,
                       F.col("tp") / F.col("extracted")).otherwise(0.0)
    recall = F.when(F.col("expected") > 0,
                    F.col("tp") / F.col("expected")).otherwise(0.0)
    hmean = F.when(precision + recall > 0,
                   2 * precision * recall / (precision + recall)).otherwise(0.0)
    return both.select(
        "label",
        F.col("expected").cast("long").alias("expected"),
        F.col("extracted").cast("long").alias("extracted"),
        F.col("tp").cast("long").alias("tp"),
        precision.alias("precision"),
        recall.alias("recall"),
        hmean.alias("hmean"),
    )
