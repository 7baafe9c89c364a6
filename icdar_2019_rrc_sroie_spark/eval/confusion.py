"""Multilabel confusion matrix + per-class P/R/F1 (A4/A5).

Relational re-expression of the reference's bincount computation
(keyword_information_extraction/utils/misc.py:171-230): rows with
targets outside [0, n_classes) are masked out; per retained class the
(tn, fp, fn, tp) quadruple is derived from tp/pred/true sums; classes
absent from both predictions and targets are dropped (the reference's
"retain only selected labels" step). F1 aggregation follows
train.py:309-334.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def multilabel_confusion(preds: DataFrame, n_classes: int,
                         pred_col: str = "pred",
                         target_col: str = "target") -> DataFrame:
    """(class, tn, fp, fn, tp) per retained class id."""
    masked = preds.filter(
        (F.col(target_col) >= 0) & (F.col(target_col) < n_classes)
    )
    total = masked.count()
    per_true = masked.groupBy(F.col(target_col).alias("cls")).agg(
        F.count(F.lit(1)).alias("true_sum"),
        F.sum((F.col(pred_col) == F.col(target_col)).cast("long"))
        .alias("tp"),
    )
    per_pred = masked.groupBy(F.col(pred_col).alias("cls")).agg(
        F.count(F.lit(1)).alias("pred_sum")
    )
    joined = per_true.join(per_pred, "cls", "full").select(
        "cls",
        F.coalesce("tp", F.lit(0)).alias("tp"),
        F.coalesce("true_sum", F.lit(0)).alias("true_sum"),
        F.coalesce("pred_sum", F.lit(0)).alias("pred_sum"),
    )
    fp = F.col("pred_sum") - F.col("tp")
    fn = F.col("true_sum") - F.col("tp")
    tn = F.lit(total) - F.col("tp") - fp - fn
    return joined.select(
        "cls",
        tn.cast("long").alias("tn"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        F.col("tp").cast("long").alias("tp"),
    )


def class_weights(labels: DataFrame, class_col: str = "cls",
                  mu: float = 0.15) -> DataFrame:
    """Unbalanced-dataset class weights (A3):
    ``max(1, log(mu * total / count))`` per class
    (functional/utils/dataset.py:64-92, default mu 0.15)."""
    counts = labels.groupBy(class_col).agg(F.count(F.lit(1)).alias("cnt"))
    total = labels.count()
    weight = F.greatest(
        F.lit(1.0), F.log(F.lit(mu) * F.lit(float(total)) / F.col("cnt"))
    )
    return counts.select(class_col, "cnt", weight.alias("weight"))


def per_class_prf(mcm: DataFrame) -> DataFrame:
    """precision/recall/F1 per class from the MCM quadruples."""
    precision = F.when(F.col("tp") + F.col("fp") > 0,
                       F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(0.0)
    recall = F.when(F.col("tp") + F.col("fn") > 0,
                    F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(0.0)
    f1 = F.when(precision + recall > 0,
                2 * precision * recall / (precision + recall)).otherwise(0.0)
    return mcm.select(
        "cls", "tn", "fp", "fn", "tp",
        precision.alias("precision"), recall.alias("recall"), f1.alias("f1"),
    )
