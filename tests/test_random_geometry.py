"""Seeded randomized robustness: NMS kernel and IoU expression vs slow
oracles on arbitrary box sets (tie handling included)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from icdar_2019_rrc_sroie_spark.operators.detection_kernels import nms_keep
from icdar_2019_rrc_sroie_spark.operators.geometry import iou_expr
from tests.test_detection import nms_oracle


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_nms_random_boxes(seed):
    rng = np.random.RandomState(seed)
    n = 60
    x0 = rng.uniform(0, 400, n)
    y0 = rng.uniform(0, 300, n)
    boxes = np.stack([x0, y0, x0 + rng.uniform(5, 120, n),
                      y0 + rng.uniform(5, 80, n)], axis=1)
    # quantize scores to force ties (the reference tie order matters)
    scores = np.round(rng.uniform(0.1, 1.0, n), 1)
    for thresh in (0.3, 0.5, 0.7):
        assert nms_keep(boxes, scores, thresh) == \
            nms_oracle(boxes.tolist(), scores.tolist(), thresh)


def test_nms_tie_order_matches_reference_semantics():
    # equal scores: stable-ascending-then-reversed picks the LARGER
    # original index first (non_max_suppression.py:29)
    boxes = np.array([(0, 0, 10, 10), (100, 0, 110, 10),
                      (200, 0, 210, 10)], float)
    scores = np.array([0.5, 0.5, 0.5])
    assert nms_keep(boxes, scores, 0.3) == [2, 1, 0]


def test_iou_expr_random_vs_numpy(spark):
    rng = np.random.RandomState(7)
    rows = []
    for i in range(300):
        a = rng.uniform(0, 200, 2)
        b = rng.uniform(0, 200, 2)
        rows.append((i, float(a[0]), float(a[1]),
                     float(a[0] + rng.uniform(1, 90)),
                     float(a[1] + rng.uniform(1, 60)),
                     float(b[0]), float(b[1]),
                     float(b[0] + rng.uniform(1, 90)),
                     float(b[1] + rng.uniform(1, 60))))
    df = spark.createDataFrame(
        rows, "id int, ax0 double, ay0 double, ax1 double, ay1 double,"
        " bx0 double, by0 double, bx1 double, by1 double")
    got = df.select(
        "id",
        iou_expr(F.col("ax0"), F.col("ay0"), F.col("ax1"), F.col("ay1"),
                 F.col("bx0"), F.col("by0"), F.col("bx1"), F.col("by1"))
        .alias("iou"),
    ).collect()
    by_id = {r["id"]: r["iou"] for r in got}
    for row in rows:
        i, ax0, ay0, ax1, ay1, bx0, by0, bx1, by1 = row
        iw = max(0.0, min(ax1, bx1) - max(ax0, bx0))
        ih = max(0.0, min(ay1, by1) - max(ay0, by0))
        inter = iw * ih
        area_a = (ax1 - ax0 + 1) * (ay1 - ay0 + 1)
        area_b = (bx1 - bx0 + 1) * (by1 - by0 + 1)
        exp = inter / (area_a + area_b - inter + 1e-6)
        assert by_id[i] == pytest.approx(exp, rel=1e-12)
