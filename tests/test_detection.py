"""Unit tests for the detection-stage operators (SURVEY.md §2.2-2.5)
against independent NumPy oracles on deterministic micro-fixtures
(FIXTURES.md §4)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from icdar_2019_rrc_sroie_spark.operators.detection_kernels import (
    connect_groups,
    nms_keep,
    nms_per_doc,
    connect_lines_per_doc,
    text_lines_from_proposals,
)
from icdar_2019_rrc_sroie_spark.operators.geometry import (
    anchor_grid,
    clip_expr,
    decode_box,
    encode_box,
    iou_expr,
    split_strips,
    xy_min_max,
)
from icdar_2019_rrc_sroie_spark.operators.matching import match_anchors

# The three hard-coded proposal sets exercised by the reference's own
# smoke test (nms_test.py:18-51) — inputs only, expectations recomputed.
NMS_SETS = [
    (
        np.array([(12, 84, 140, 212), (24, 84, 152, 212), (36, 84, 164, 212),
                  (12, 96, 140, 224), (24, 96, 152, 224), (24, 108, 152, 236),
                  (32, 84, 120, 202), (24, 74, 152, 222), (16, 84, 134, 212),
                  (12, 96, 140, 214), (24, 76, 152, 224), (34, 118, 142, 246)],
                 dtype=float),
        np.array([0.71553708, 0.44149134, 0.56920083, 0.66437074, 0.94646953,
                  0.5710134, 0.59851521, 0.86266735, 0.35275677, 0.63534861,
                  0.92070096, 0.58120545]),
    ),
    (
        np.array([(114, 60, 178, 124), (120, 60, 184, 124),
                  (114, 66, 178, 130)], dtype=float),
        np.array([0.39508096, 0.30129297, 0.55505935]),
    ),
    (
        np.array([(12, 30, 76, 94), (12, 36, 76, 100),
                  (72, 36, 200, 164), (84, 48, 212, 176)], dtype=float),
        np.array([0.60069897, 0.71678238, 0.59429882, 0.84540743]),
    ),
]


def nms_oracle(boxes, scores, thresh):
    """Slow O(n²) greedy suppression, written independently."""
    order = sorted(range(len(scores)),
                   key=lambda i: (scores[i], i), reverse=True)
    kept = []
    for i in order:
        ok = True
        for j in kept:
            ax = max(0.0, min(boxes[i][2], boxes[j][2]) - max(boxes[i][0], boxes[j][0]))
            ay = max(0.0, min(boxes[i][3], boxes[j][3]) - max(boxes[i][1], boxes[j][1]))
            inter = ax * ay
            area_i = (boxes[i][2] - boxes[i][0] + 1) * (boxes[i][3] - boxes[i][1] + 1)
            area_j = (boxes[j][2] - boxes[j][0] + 1) * (boxes[j][3] - boxes[j][1] + 1)
            if inter / (area_i + area_j - inter) > thresh:
                ok = False
                break
        if ok:
            kept.append(i)
    return kept


@pytest.mark.parametrize("idx", range(len(NMS_SETS)))
@pytest.mark.parametrize("thresh", [0.3, 0.5])
def test_nms_kernel_matches_oracle(idx, thresh):
    boxes, scores = NMS_SETS[idx]
    assert nms_keep(boxes, scores, thresh) == nms_oracle(boxes, scores, thresh)


def test_nms_distributed(spark):
    rows = []
    for d, (boxes, scores) in enumerate(NMS_SETS):
        for p, (b, s) in enumerate(zip(boxes, scores)):
            rows.append((f"doc{d}", p, *map(float, b), float(s)))
    df = spark.createDataFrame(
        rows, "doc_id string, proposal_id int, xmin double, ymin double,"
        " xmax double, ymax double, score double")
    got = nms_per_doc(df, 0.5).toPandas()
    for d, (boxes, scores) in enumerate(NMS_SETS):
        keep = nms_keep(boxes, scores, 0.5)
        sub = got[got.doc_id == f"doc{d}"].sort_values("pick_order")
        expected = boxes[keep]
        assert np.allclose(sub[["xmin", "ymin", "xmax", "ymax"]].to_numpy(),
                           expected)


def test_connector_two_rows():
    # two visual text rows of 16px strips, plus one isolated strip far away
    boxes, scores = [], []
    for r, y in enumerate((10.0, 60.0)):
        for k in range(5):
            boxes.append((100.0 + 16 * k, y, 115.0 + 16 * k, y + 20.0))
            scores.append(0.9 - 0.01 * k - 0.1 * r)
    boxes.append((400.0, 200.0, 415.0, 220.0))
    scores.append(0.8)
    boxes, scores = np.array(boxes), np.array(scores)
    lines, avg = text_lines_from_proposals(boxes, scores, im_w=500, im_h=300)
    assert len(lines) == 2  # isolated single strip forms no chain
    top = lines[np.argsort(lines[:, 1])]
    assert top[0][0] == 100.0 and top[0][2] == 179.0
    assert abs(top[0][1] - 10.0) < 1e-9 and abs(top[0][3] - 30.0) < 1e-9
    assert abs(avg.max() - np.mean([0.9, 0.89, 0.88, 0.87, 0.86])) < 1e-12


def test_connector_distributed(spark):
    boxes = [(100.0 + 16 * k, 10.0, 115.0 + 16 * k, 30.0) for k in range(4)]
    rows = [("d0", i, *b, 0.9) for i, b in enumerate(boxes)]
    df = spark.createDataFrame(
        rows, "doc_id string, proposal_id int, xmin double, ymin double,"
        " xmax double, ymax double, score double")
    out = connect_lines_per_doc(df, 500, 300).toPandas()
    assert len(out) == 1
    assert out.iloc[0].xmin == 100.0 and out.iloc[0].xmax == 163.0


def test_connect_groups_chains():
    adj = np.zeros((5, 5), bool)
    adj[0, 1] = adj[1, 2] = adj[3, 4] = True
    assert connect_groups(adj) == [[0, 1, 2], [3, 4]]


def _iou_np(a, b, eps=1e-6):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    area_a = (a[2] - a[0] + 1) * (a[3] - a[1] + 1)
    area_b = (b[2] - b[0] + 1) * (b[3] - b[1] + 1)
    return inter / (area_a + area_b - inter + eps)


def match_oracle(anchors, gts, img_w, img_h):
    m, n = len(anchors), len(gts)
    ious = np.zeros((m, n))
    for i in range(m):
        for j in range(n):
            ious[i, j] = _iou_np(anchors[i], gts[j])
    best_anchor_for_gt = ious.argmax(axis=0)
    best_iou = ious.max(axis=1)
    best_gt = ious.argmax(axis=1)
    best_gt[best_anchor_for_gt] = np.arange(n)
    best_iou[best_anchor_for_gt] = 1.0
    labels = np.full(m, -1)
    labels[best_iou > 0.5] = 1
    labels[best_iou < 0.3] = 0
    outside = ((anchors[:, 0] < 0) | (anchors[:, 1] < 0)
               | (anchors[:, 2] > img_w) | (anchors[:, 3] > img_h))
    labels[outside] = -1
    matched = gts[best_gt]
    h = matched[:, 3] - matched[:, 1] + 1.0
    ha = anchors[:, 3] - anchors[:, 1] + 1.0
    cy = (matched[:, 1] + matched[:, 3]) / 2.0
    cya = (anchors[:, 1] + anchors[:, 3]) / 2.0
    return best_gt, labels, (cy - cya) / ha, np.log(h / ha)


def test_match_anchors_vs_oracle(spark):
    img_w, img_h = 96.0, 64.0
    anchors_df = anchor_grid(spark, feat_h=4, feat_w=6,
                             heights=(11, 15, 22, 32)).cache()
    a_pdf = anchors_df.toPandas().sort_values("anchor_id")
    anchors = a_pdf[["xmin", "ymin", "xmax", "ymax"]].to_numpy()

    gts = np.array([
        (8.0, 10.0, 55.0, 24.0),
        (16.0, 40.0, 88.0, 58.0),
        (60.0, 8.0, 90.0, 30.0),
    ])
    gt_df = spark.createDataFrame(
        [("d0", j, *map(float, g)) for j, g in enumerate(gts)],
        "doc_id string, gt_id int, xmin double, ymin double,"
        " xmax double, ymax double")

    got = (match_anchors(anchors_df, gt_df, img_w, img_h)
           .toPandas().sort_values("anchor_id").reset_index(drop=True))
    exp_gt, exp_labels, exp_vc, exp_vh = match_oracle(anchors, gts, img_w, img_h)

    assert list(got["label"]) == list(exp_labels)
    pos = exp_labels >= 0
    assert list(got["matched_gt_id"][pos]) == list(exp_gt[pos])
    assert np.allclose(got["vc"], exp_vc)
    assert np.allclose(got["vh"], exp_vh)


def test_geometry_exprs(spark):
    df = spark.createDataFrame(
        [(10.0, 20.0, 15.0, 25.0)],
        "g_ymin double, g_ymax double, a_ymin double, a_ymax double")
    vc, vh = encode_box(F.col("g_ymin"), F.col("g_ymax"),
                        F.col("a_ymin"), F.col("a_ymax"))
    dec_lo, dec_hi = decode_box(vc, vh, F.col("a_ymin"), F.col("a_ymax"))
    row = df.select(vc.alias("vc"), vh.alias("vh"),
                    dec_lo.alias("lo"), dec_hi.alias("hi")).collect()[0]
    ha = 25.0 - 15.0 + 1
    assert row.vc == pytest.approx(((10 + 20) / 2 - (15 + 25) / 2) / ha)
    assert row.vh == pytest.approx(np.log((20 - 10 + 1) / ha))
    assert row.lo == pytest.approx(10.0 - 0.5)  # decode uses half-open h
    assert row.hi == pytest.approx(20.0 + 0.5)

    clipped = df.select(clip_expr(F.lit(-5.0), F.lit(100.0)).alias("a"),
                        clip_expr(F.lit(150.0), F.lit(100.0)).alias("b")
                        ).collect()[0]
    assert (clipped.a, clipped.b) == (0.0, 99.0)

    strips = df.select(
        split_strips(F.lit(10.0), F.lit(50.0)).alias("s")).collect()[0].s
    assert strips == [0, 1, 2, 3]

    quad = df.select(xy_min_max(
        F.array(*[F.lit(v) for v in
                  [30.2, 10.6, 60.4, 10.6, 60.4, 25.1, 30.2, 25.1]])
    ).alias("b")).collect()[0].b
    assert (quad.xmin, quad.ymin, quad.xmax, quad.ymax) == (30, 11, 60, 25)


def test_anchor_grid_matches_reference_layout(spark):
    got = (anchor_grid(spark, 2, 3, heights=(11, 15))
           .toPandas().sort_values("anchor_id").reset_index(drop=True))
    # oracle: reference nested loop semantics (anchor_boxes.py:61-96)
    rows = []
    base_cx = base_cy = 7.5
    idx = 0
    for y in range(2):
        for x in range(3):
            for h in (11, 15):
                rows.append((idx, x * 16 + base_cx - 8, y * 16 + base_cy - h / 2,
                             x * 16 + base_cx + 8, y * 16 + base_cy + h / 2))
                idx += 1
    exp = pd.DataFrame(rows, columns=["anchor_id", "xmin", "ymin", "xmax", "ymax"])
    assert np.allclose(got.to_numpy(), exp.to_numpy())
