"""Task-1 chain closure: planted gt lines → anchor predictions →
decode/clip/filter → NMS → connector → DetEval vs the planted gt.
On clean synthetic layouts the corpus hmean must be exactly 1.0."""

import numpy as np
from pyspark.sql import functions as F

from icdar_2019_rrc_sroie_spark.eval.deteval import (
    deteval_corpus,
    deteval_per_doc,
)
from icdar_2019_rrc_sroie_spark.operators.geometry import anchor_grid
from icdar_2019_rrc_sroie_spark.plans.detection import detect_text_lines

IMG_W, IMG_H = 256.0, 128.0


def _plant(spark, n_docs=6):
    """gt text lines on the 16px grid + matching anchor predictions."""
    anchors = anchor_grid(spark, feat_h=8, feat_w=16,
                          heights=(11, 15, 22, 32))
    a_pdf = anchors.toPandas()
    gt_rows, pred_rows = [], []
    for d in range(n_docs):
        doc = f"doc{d}"
        for line_no in range(2):
            x0 = 16.0 * (1 + (d + line_no) % 3)
            x1 = x0 + 16.0 * (4 + d % 3) - 1.0
            y0 = 16.0 * (1 + 3 * line_no) + (d % 5)
            y1 = y0 + 12.0 + (d % 7)
            gt_rows.append((doc, 2 * line_no + 1, x0, y0, x1, y1, False))
            # positive anchors: every 16px strip covering [x0, x1]
            for r in a_pdf.itertuples(index=False):
                if r.xmin < x0 - 0.5 or r.xmax > x1 + 1.5:
                    continue
                cy = (y0 + y1) / 2.0
                h = y1 - y0 + 1.0
                ha = r.ymax - r.ymin + 1.0
                cya = (r.ymin + r.ymax) / 2.0
                if abs(cya - cy) > ha:  # keep only nearby anchor rows
                    continue
                vc = (cy - cya) / ha
                vh = float(np.log(h / ha))
                pred_rows.append((doc, int(r.anchor_id), vc, vh, 0.97))
    gt = spark.createDataFrame(
        gt_rows, "doc_id string, gt_id int, xmin double, ymin double,"
        " xmax double, ymax double, dontcare boolean")
    preds = spark.createDataFrame(
        pred_rows, "doc_id string, anchor_id long, vc double, vh double,"
        " score double")
    # background: everything else scores 0.01 → filtered by MIN_SCORE
    return anchors, gt, preds


def test_detection_chain_perfect_hmean(spark):
    anchors, gt, preds = _plant(spark)
    lines = detect_text_lines(preds, anchors, IMG_W, IMG_H)
    det = lines.select(
        "doc_id", F.col("line_id").alias("det_id"),
        "xmin", "ymin", "xmax", "ymax")
    per_doc = deteval_per_doc(gt, det)
    corpus = deteval_corpus(per_doc).collect()[0]
    assert corpus["recall"] == 1.0, per_doc.collect()
    assert corpus["precision"] == 1.0
    assert corpus["hmean"] == 1.0
