"""DetEval detection metrics (J8/J9/A6) as a Spark job.

Per-document constrained bipartite matching with one-to-one /
one-to-many / many-to-one cases and don't-care handling, semantics of
the ICDAR harness (scripts/evaluation/task1/script.py:62-366, default
params :22-36). The matcher is stateful and greedy → per-doc kernel in
``applyInPandas`` (cogrouped gt/det); corpus roll-up (A6,
script.py:337-361) is a plain aggregation.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

AREA_RECALL_CONSTRAINT = 0.8
AREA_PRECISION_CONSTRAINT = 0.4
CENTER_DIFF_THR = 1.0
MTYPE_OO_O = 1.0
MTYPE_OM_O = 0.8
MTYPE_OM_M = 1.0


def _inter_area(a, b) -> float:
    dx = min(a[2], b[2]) - max(a[0], b[0]) + 1
    dy = min(a[3], b[3]) - max(a[1], b[1]) + 1
    return float(dx * dy) if dx >= 0 and dy >= 0 else 0.0


def _rect_area(r) -> float:
    return float((r[2] - r[0] + 1) * (r[3] - r[1] + 1))


def _center_dist(a, b) -> float:
    ax = a[0] + (a[2] - a[0] + 1) / 2.0
    ay = a[1] + (a[3] - a[1] + 1) / 2.0
    bx = b[0] + (b[2] - b[0] + 1) / 2.0
    by = b[1] + (b[3] - b[1] + 1) / 2.0
    return math.hypot(ax - bx, ay - by)


def _diag(r) -> float:
    return math.hypot(r[2] - r[0] + 1, r[3] - r[1] + 1)


def deteval_doc(gt_rects: np.ndarray, gt_dontcare: np.ndarray,
                det_rects: np.ndarray) -> dict:
    """Metrics of one document. Faithful to script.py:245-345."""
    n_gt, n_det = len(gt_rects), len(det_rects)
    gt_dc = [i for i in range(n_gt) if gt_dontcare[i]]
    det_dc: list[int] = []
    recall_acc = precision_acc = 0.0
    recall = precision = hmean = 0.0

    for d in range(n_det):
        for g in gt_dc:
            inter = _inter_area(gt_rects[g], det_rects[d])
            det_area = _rect_area(det_rects[d])
            prec = 0.0 if det_area == 0 else inter / det_area
            if prec > AREA_PRECISION_CONSTRAINT:
                det_dc.append(d)
                break

    if n_gt == 0:
        recall = 1.0
        precision = 0.0 if n_det > 0 else 1.0

    if n_det > 0:
        recall_mat = np.zeros((n_gt, n_det))
        precision_mat = np.zeros((n_gt, n_det))
        for g in range(n_gt):
            for d in range(n_det):
                inter = _inter_area(gt_rects[g], det_rects[d])
                g_area = _rect_area(gt_rects[g])
                d_area = _rect_area(det_rects[d])
                recall_mat[g, d] = 0.0 if g_area == 0 else inter / g_area
                precision_mat[g, d] = 0.0 if d_area == 0 else inter / d_area

        gt_mat = np.zeros(n_gt, np.int8)
        det_mat = np.zeros(n_det, np.int8)

        def qualifies(g, d):
            return (recall_mat[g, d] >= AREA_RECALL_CONSTRAINT
                    and precision_mat[g, d] >= AREA_PRECISION_CONSTRAINT)

        def one_to_one(g, d):
            if sum(qualifies(g, j) for j in range(n_det)) != 1:
                return False
            if sum(qualifies(i, d) for i in range(n_gt)) != 1:
                return False
            return qualifies(g, d)

        def overlaps_gt(g):
            return sum(1 for d in range(n_det)
                       if d not in det_dc and recall_mat[g, d] > 0)

        def overlaps_det(d):
            return sum(1 for g in range(n_gt)
                       if g not in gt_dc and recall_mat[g, d] > 0)

        # one-to-one
        for g in range(n_gt):
            for d in range(n_det):
                if (gt_mat[g] == 0 and det_mat[d] == 0
                        and g not in gt_dc and d not in det_dc
                        and one_to_one(g, d)
                        and overlaps_gt(g) == 1 and overlaps_det(d) == 1):
                    norm = (2.0 * _center_dist(gt_rects[g], det_rects[d])
                            / (_diag(gt_rects[g]) + _diag(det_rects[d])))
                    if norm < CENTER_DIFF_THR:
                        gt_mat[g] = det_mat[d] = 1
                        recall_acc += MTYPE_OO_O
                        precision_acc += MTYPE_OO_O

        # one-to-many
        for g in range(n_gt):
            if g in gt_dc:
                continue
            many_sum, matches = 0.0, []
            for d in range(n_det):
                if gt_mat[g] == 0 and det_mat[d] == 0 and d not in det_dc \
                        and precision_mat[g, d] >= AREA_PRECISION_CONSTRAINT:
                    many_sum += recall_mat[g, d]
                    matches.append(d)
            if round(many_sum, 4) >= AREA_RECALL_CONSTRAINT \
                    and overlaps_gt(g) >= 2:
                gt_mat[g] = 1
                recall_acc += MTYPE_OO_O if len(matches) == 1 else MTYPE_OM_O
                precision_acc += (MTYPE_OO_O if len(matches) == 1
                                  else MTYPE_OM_O * len(matches))
                for d in matches:
                    det_mat[d] = 1

        # many-to-one
        for d in range(n_det):
            if d in det_dc:
                continue
            many_sum, matches = 0.0, []
            for g in range(n_gt):
                if gt_mat[g] == 0 and det_mat[d] == 0 and g not in gt_dc \
                        and recall_mat[g, d] >= AREA_RECALL_CONSTRAINT:
                    many_sum += precision_mat[g, d]
                    matches.append(g)
            if round(many_sum, 4) >= AREA_PRECISION_CONSTRAINT \
                    and overlaps_det(d) >= 2:
                det_mat[d] = 1
                recall_acc += (MTYPE_OO_O if len(matches) == 1
                               else MTYPE_OM_M * len(matches))
                precision_acc += (MTYPE_OO_O if len(matches) == 1
                                  else MTYPE_OM_M)
                for g in matches:
                    gt_mat[g] = 1

        n_gt_care = n_gt - len(gt_dc)
        if n_gt_care == 0:
            recall = 1.0
            precision = 0.0 if n_det > 0 else 1.0
        else:
            recall = recall_acc / n_gt_care
            n_det_care = n_det - len(det_dc)
            precision = 0.0 if n_det_care == 0 else precision_acc / n_det_care
        hmean = (0.0 if precision + recall == 0
                 else 2.0 * precision * recall / (precision + recall))

    return {
        "recall_accum": recall_acc,
        "precision_accum": precision_acc,
        "num_gt_care": n_gt - len(gt_dc),
        "num_det_care": n_det - len(det_dc),
        "recall": recall,
        "precision": precision,
        "hmean": hmean,
    }


DOC_METRICS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("recall_accum", T.DoubleType()),
        T.StructField("precision_accum", T.DoubleType()),
        T.StructField("num_gt_care", T.IntegerType()),
        T.StructField("num_det_care", T.IntegerType()),
        T.StructField("recall", T.DoubleType()),
        T.StructField("precision", T.DoubleType()),
        T.StructField("hmean", T.DoubleType()),
    ]
)


def deteval_per_doc(gt: DataFrame, det: DataFrame) -> DataFrame:
    """gt: (doc_id, xmin, ymin, xmax, ymax, dontcare bool, gt_id);
    det: (doc_id, xmin, ymin, xmax, ymax, det_id) → per-doc metrics."""

    def kernel(key, gt_pdf: pd.DataFrame, det_pdf: pd.DataFrame) -> pd.DataFrame:
        gt_pdf = gt_pdf.sort_values("gt_id")
        det_pdf = det_pdf.sort_values("det_id")
        res = deteval_doc(
            gt_pdf[["xmin", "ymin", "xmax", "ymax"]].to_numpy(float),
            gt_pdf["dontcare"].to_numpy(bool),
            det_pdf[["xmin", "ymin", "xmax", "ymax"]].to_numpy(float),
        )
        return pd.DataFrame([{"doc_id": key[0], **res}])

    return gt.groupBy("doc_id").cogroup(det.groupBy("doc_id")) \
        .applyInPandas(kernel, DOC_METRICS_SCHEMA)


def deteval_corpus(per_doc: DataFrame, by: tuple[str, ...] = ()) -> DataFrame:
    """Corpus roll-up (script.py:337-361). ``by`` optionally rolls up
    per group (e.g. per corpus slice) with the same accumulator
    semantics; the default stays the reference's single corpus row."""
    agg = (per_doc.groupBy(*by) if by else per_doc).agg(
        F.sum("recall_accum").alias("r_sum"),
        F.sum("precision_accum").alias("p_sum"),
        F.sum("num_gt_care").alias("n_gt"),
        F.sum("num_det_care").alias("n_det"),
    )
    recall = F.when(F.col("n_gt") == 0, F.lit(0.0)).otherwise(
        F.col("r_sum") / F.col("n_gt"))
    precision = F.when(F.col("n_det") == 0, F.lit(0.0)).otherwise(
        F.col("p_sum") / F.col("n_det"))
    return agg.select(
        *by,
        recall.alias("recall"),
        precision.alias("precision"),
    ).select(
        *by, "recall", "precision",
        F.when(F.col("recall") + F.col("precision") == 0, F.lit(0.0))
        .otherwise(2 * F.col("recall") * F.col("precision")
                   / (F.col("recall") + F.col("precision")))
        .alias("hmean"),
    )
