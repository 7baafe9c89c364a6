"""Learned region localizer over real raster features (U1 — the
engine's CTPN-lite).

The reference scores 16-px anchor strips with a trained conv backbone
(text_localization/ctpn/model/architecture.py:137-177) and regresses
each positive anchor's vertical extent. This module reproduces that
*contract* with committed learned weights and real image features,
sized for a codec-free sandbox:

* per-anchor FEATURES come from the decoded raster — mean gray, mean
  Sobel gradient energy, dark-pixel fraction inside the anchor rect,
  plus normalized anchor height (operators/multimodal.py kernels);
* the SCORE is a logistic regression over those features, trained
  offline in pure NumPy on synthetic receipt pages with known
  text-line boxes (tools/train_ctpn_lite.py) and committed as
  ``models/ctpn_lite.npz`` — the same frozen-checkpoint seam as
  charlm_lite (broadcast once, one matmul per Arrow batch);
* the vertical REGRESSION (Vc, Vh) is computed from the raster: the
  dark-row run nearest the anchor center inside its x-strip gives the
  line's (y-center, height), encoded with the reference's exact
  ``encode_box`` formula (X13);
* everything downstream is the EXISTING pipeline: decode → clip →
  score filter → per-doc NMS → proposal connector
  (plans/detection.py:detect_text_lines).

Per-image work stays inside one mapInPandas kernel (no shuffle until
the per-doc NMS grouping); weights are broadcast, never re-read.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .multimodal import decode_payload, sobel_magnitude, to_gray

#: Feature vector per anchor: [mean_gray/255, mean_sobel/255,
#: dark_frac, anchor_h/64, 2-px-margin dark_frac] — see
#: anchor_features().
N_FEATURES = 5

#: Page geometry shared by the trainer, the tests, and the query:
#: 128×256 pages → an 8×16 feature map at stride 16; the first four
#: reference anchor heights cover the synthetic line heights (10-20 px).
PAGE_H, PAGE_W = 128, 256
FEAT_H, FEAT_W = 8, 16
DETECT_HEIGHTS = (11, 15, 22, 32)


def synth_page(seed: int) -> tuple[np.ndarray, list[tuple[float, ...]]]:
    """Deterministic synthetic receipt page: white background, textured
    dark text-line bands at seed-dependent positions. Returns
    (uint8 HxWx3 array, list of gt line boxes xyxy). The same builder
    feeds training (tools/train_ctpn_lite.py — EVEN seeds 0-94), the
    held-out tests (ODD seeds), and the ``detection_learned`` query
    (seeds 100-159, disjoint from training)."""
    rng = np.random.RandomState(seed)
    arr = np.full((PAGE_H, PAGE_W, 3), 245, dtype=np.uint8)
    boxes: list[tuple[float, ...]] = []
    n_lines = 3 + seed % 3
    y = 8 + seed % 7
    for li in range(n_lines):
        lh = (10, 14, 20)[int(rng.randint(3))]
        if y + lh >= PAGE_H - 4:
            break
        x1 = 8 + int(rng.randint(24))
        x2 = PAGE_W - 8 - int(rng.randint(48))
        yy, xx = np.mgrid[y:y + lh, x1:x2]
        tex = (30 + 60 * ((yy + xx + li) % 3)).astype(np.uint8)
        arr[y:y + lh, x1:x2, :] = tex[:, :, None]
        boxes.append((float(x1), float(y), float(x2), float(y + lh)))
        y += lh + 10 + int(rng.randint(8))
    return arr, boxes

PRED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("anchor_id", T.LongType(), False),
    T.StructField("vc", T.DoubleType(), False),
    T.StructField("vh", T.DoubleType(), False),
    T.StructField("score", T.DoubleType(), False),
])


def anchor_boxes_np(feat_h: int, feat_w: int,
                    heights: tuple[int, ...],
                    stride: int = 16, shift: int = 16) -> np.ndarray:
    """(n_anchors, 4) xyxy float array — NumPy mirror of
    geometry.anchor_grid (same anchor_id enumeration: y-major, x,
    height index)."""
    n_h = len(heights)
    out = np.zeros((feat_h * feat_w * n_h, 4), dtype=np.float64)
    c = (shift - 1) / 2.0
    for fy in range(feat_h):
        for fx in range(feat_w):
            for hi, h in enumerate(heights):
                a = (fy * feat_w + fx) * n_h + hi
                out[a] = (fx * stride + c - shift / 2,
                          fy * stride + c - h / 2,
                          fx * stride + c + shift / 2,
                          fy * stride + c + h / 2)
    return out


def anchor_features(arr: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """(n_anchors, N_FEATURES) from one decoded image via integral
    images — O(pixels + anchors), no per-pixel Python."""
    gray = to_gray(arr)
    h, w = gray.shape
    sob = sobel_magnitude(gray)
    dark = (gray < 128.0).astype(np.float64)

    def integral(m):
        ii = np.zeros((h + 1, w + 1))
        ii[1:, 1:] = m.cumsum(0).cumsum(1)
        return ii

    ig, isob, idark = integral(gray), integral(sob), integral(dark)
    x1 = np.clip(boxes[:, 0], 0, w).astype(int)
    y1 = np.clip(boxes[:, 1], 0, h).astype(int)
    x2 = np.clip(np.ceil(boxes[:, 2]), 0, w).astype(int)
    y2 = np.clip(np.ceil(boxes[:, 3]), 0, h).astype(int)
    area = np.maximum((x2 - x1) * (y2 - y1), 1)

    def box_sum(ii):
        return ii[y2, x2] - ii[y1, x2] - ii[y2, x1] + ii[y1, x1]

    feats = np.zeros((len(boxes), N_FEATURES))
    feats[:, 0] = box_sum(ig) / area / 255.0
    feats[:, 1] = box_sum(isob) / area / 255.0
    feats[:, 2] = box_sum(idark) / area
    feats[:, 3] = (boxes[:, 3] - boxes[:, 1]) / 64.0
    # 2-px margins above+below: a well-fitted anchor has dark inside
    # but light margins — separates "contains a line" from "inside a
    # bigger blob"
    my1 = np.clip(y1 - 2, 0, h)
    my2 = np.clip(y2 + 2, 0, h)
    s_out = (idark[my2, x2] - idark[my1, x2]
             - idark[my2, x1] + idark[my1, x1])
    a_out = np.maximum((x2 - x1) * (my2 - my1) - (x2 - x1) * (y2 - y1), 1)
    feats[:, 4] = (s_out - box_sum(idark)) / a_out
    return feats


def vertical_regression(arr: np.ndarray,
                        boxes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(vc, vh) per anchor from the raster: the dark-row run nearest
    the anchor center inside its x-strip (nearest-row ties pick the
    lower row), encoded with the reference's X13 formula — the
    deterministic analog of CTPN's regression head.

    All anchors sharing an x-strip (every height at one fx column) see
    the same dark-row profile, so the profile, run extents, and
    nearest-dark-row tables are computed ONCE per distinct strip in
    vectorized NumPy; the per-anchor step is a constant-time gather.
    Parity vs the straight per-anchor loop is pinned by
    tests/test_detect_learned.py."""
    gray = to_gray(arr)
    h, w = gray.shape
    dark = gray < 128.0
    vc = np.zeros(len(boxes))
    vh = np.zeros(len(boxes))

    x1s = np.maximum(boxes[:, 0], 0).astype(int)
    x2s = np.minimum(np.ceil(boxes[:, 2]), w).astype(int)
    rows = np.arange(h)
    profiles: dict[tuple[int, int], tuple | None] = {}
    for i in range(len(boxes)):
        key = (x1s[i], x2s[i])
        if key in profiles:
            continue
        x1, x2 = key
        if x2 <= x1:
            profiles[key] = None
            continue
        col = dark[:, x1:x2].mean(axis=1) > 0.5
        if not col.any():
            profiles[key] = None
            continue
        # run extents: lo[rid]/hi[rid] = first/last row of each dark run
        starts = col & ~np.roll(col, 1)
        starts[0] = col[0]
        rid = np.cumsum(starts) * col  # run id per row, 0 for light rows
        n_runs = int(rid.max()) + 1
        dark_idx = rows[col]
        lo = np.full(n_runs, h, dtype=np.int64)
        hi = np.full(n_runs, -1, dtype=np.int64)
        np.minimum.at(lo, rid[col], dark_idx)
        np.maximum.at(hi, rid[col], dark_idx)
        # nearest dark row per row (ties -> lower row)
        prev = np.where(col, rows, -1)
        prev = np.maximum.accumulate(prev)
        nxt = np.where(col, rows, h * 2)
        nxt = np.minimum.accumulate(nxt[::-1])[::-1]
        use_prev = (prev >= 0) & ((rows - prev) <= (nxt - rows))
        nearest = np.where(use_prev, prev, nxt)
        profiles[key] = (rid, lo, hi, nearest)

    cya = (boxes[:, 1] + boxes[:, 3]) / 2.0
    centers = np.clip(np.round(cya).astype(int), 0, h - 1)
    ha = boxes[:, 3] - boxes[:, 1] + 1.0
    for i in range(len(boxes)):
        prof = profiles[(x1s[i], x2s[i])]
        if prof is None:
            continue
        rid, lo, hi, nearest = prof
        seed = nearest[centers[i]]
        r = rid[seed]
        gt_ymin, gt_ymax = float(lo[r]), float(hi[r])
        cy = (gt_ymin + gt_ymax) / 2.0
        vc[i] = (cy - cya[i]) / ha[i]
        vh[i] = np.log((gt_ymax - gt_ymin + 1.0) / ha[i])
    return vc, vh


def default_weights_path() -> str:
    import os.path as osp

    return osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                    "models", "ctpn_lite.npz")


def load_detector_params(path: str | None = None) -> dict:
    with np.load(path or default_weights_path()) as z:
        return {"w": z["w"].astype(np.float64),
                "b": float(z["b"])}


def score_anchors(feats: np.ndarray, params: dict) -> np.ndarray:
    """Logistic score per anchor."""
    return 1.0 / (1.0 + np.exp(-(feats @ params["w"] + params["b"])))


def label_anchors(boxes: np.ndarray,
                  gt_lines: list[tuple[float, ...]],
                  pos_iou: float = 0.6,
                  neg_iou: float = 0.3) -> np.ndarray:
    """CTPN-style anchor targets: each GT line is split into 16-px
    x-strips (X16 semantics) and every anchor is scored by max IoU
    against the strip GTs. Returns +1 (positive), 0 (negative), -1
    (ignored — the F4/F5 dead zone between the thresholds). Mirrors
    match_anchors' forced-assignment rule: every GT strip forces its
    argmax anchor positive regardless of IoU
    (target_transformation.py:163-166), so no line can go unlearnable
    just because it sits between two anchor rows."""
    y = np.full(len(boxes), 0.0)
    best = np.zeros(len(boxes))
    forced: list[int] = []
    a_area = ((boxes[:, 2] - boxes[:, 0])
              * (boxes[:, 3] - boxes[:, 1]))
    for (gx1, gy1, gx2, gy2) in gt_lines:
        s1 = int(gx1) // 16
        s2 = int(np.ceil(gx2 / 16.0))
        for s in range(s1, s2):
            sx1, sx2 = s * 16.0, s * 16.0 + 16.0
            ix1 = np.maximum(boxes[:, 0], max(sx1, gx1))
            iy1 = np.maximum(boxes[:, 1], gy1)
            ix2 = np.minimum(boxes[:, 2], min(sx2, gx2))
            iy2 = np.minimum(boxes[:, 3], gy2)
            inter = (np.maximum(ix2 - ix1, 0) * np.maximum(iy2 - iy1, 0))
            g_area = (min(sx2, gx2) - max(sx1, gx1)) * (gy2 - gy1)
            iou = inter / np.maximum(a_area + g_area - inter, 1e-9)
            best = np.maximum(best, iou)
            forced.append(int(iou.argmax()))
    y[best >= pos_iou] = 1.0
    y[(best > neg_iou) & (best < pos_iou)] = -1.0
    y[forced] = 1.0
    return y


def predict_anchors(media: DataFrame, feat_h: int, feat_w: int,
                    heights: tuple[int, ...],
                    params: dict | None = None) -> DataFrame:
    """Image payload rows → (doc_id, anchor_id, vc, vh, score) — the
    learned front half of the detection pipeline, Arrow-batched with
    broadcast frozen weights. Feed the result straight into
    plans/detection.py:detect_text_lines."""
    sc = media.sparkSession.sparkContext
    bc = sc.broadcast(params or load_detector_params())
    boxes = anchor_boxes_np(feat_h, feat_w, heights)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = bc.value
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                meta = row.meta
                arr = decode_payload(bytes(row.payload),
                                     int(meta["width"] or 8),
                                     int(meta["height"] or 8),
                                     int(meta["channels"] or 1))
                feats = anchor_features(arr, boxes)
                scores = score_anchors(feats, model)
                vc, vh = vertical_regression(arr, boxes)
                out.append(pd.DataFrame({
                    "doc_id": row.media_id,
                    "anchor_id": np.arange(len(boxes), dtype=np.int64),
                    "vc": vc, "vh": vh, "score": scores,
                }))
            yield (pd.concat(out) if out else
                   pd.DataFrame(columns=["doc_id", "anchor_id", "vc",
                                         "vh", "score"]))

    return media.mapInPandas(kernel, PRED_SCHEMA)


def detect_lines_learned(media: DataFrame,
                         min_score: float = 0.7,
                         params: dict | None = None) -> DataFrame:
    """Full learned U1 path: payloads → learned anchor scores +
    raster regression → the EXISTING decode/clip/filter/NMS/connector
    plan (plans/detection.py). One Arrow kernel, one broadcast join,
    one exchange on doc_id — same shape as the deterministic pipeline."""
    from ..plans.detection import detect_text_lines
    from .geometry import anchor_grid

    preds = predict_anchors(media, FEAT_H, FEAT_W, DETECT_HEIGHTS,
                            params=params)
    anchors = anchor_grid(media.sparkSession, FEAT_H, FEAT_W,
                          heights=DETECT_HEIGHTS)
    return detect_text_lines(preds, anchors,
                             img_w=float(PAGE_W), img_h=float(PAGE_H),
                             min_score=min_score)
