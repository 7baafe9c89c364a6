"""Crop-preprocess job (X20 composed): raster kernels vs straight-loop
NumPy oracles, the per-image crop decision on planted-content BMPs, and
the build-once materialization semantics.

Reference contract: split_labels.py:71-136 (width gate, Sobel→Otsu→
morphology→largest-contour crop) + :38-68 (adjust_label coordinate
shift)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from icdar_2019_rrc_sroie_spark.operators.multimodal import (
    crop_bbox_for_image,
    crop_offsets,
    encode_bmp,
    gaussian_blur9,
    largest_component_bbox,
    morph_close_rect,
    sobel_subtract,
    _dilate_rect,
    _erode_rect,
)


# ---------------------------------------------------------------------------
# Kernel parity vs naive loop oracles
# ---------------------------------------------------------------------------


def _blur9_loop(gray):
    k, out = 9, np.zeros_like(gray, dtype=np.float64)
    sigma = 0.3 * ((k - 1) * 0.5 - 1) + 0.8
    xs = np.arange(k) - (k - 1) / 2
    w1 = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    w1 /= w1.sum()
    w2 = np.outer(w1, w1)
    p = np.pad(gray.astype(np.float64), 4, mode="reflect")
    h, w = gray.shape
    for y in range(h):
        for x in range(w):
            out[y, x] = (p[y:y + k, x:x + k] * w2).sum()
    return out


def test_gaussian_blur9_matches_direct_convolution():
    rng = np.random.RandomState(3)
    gray = rng.randint(0, 256, (14, 17)).astype(np.float64)
    assert np.allclose(gaussian_blur9(gray), _blur9_loop(gray), atol=1e-9)


def test_sobel_subtract_known_edge():
    # vertical step edge: gradX fires, gradY ~0 inside -> |gx - gy| > 0
    gray = np.zeros((8, 8))
    gray[:, 4:] = 200.0
    g = sobel_subtract(gray)
    assert g[4, 3] > 100 and g[4, 0] == 0.0


def _dilate_loop(b, kh, kw):
    h, w = b.shape
    out = np.zeros_like(b, dtype=bool)
    for y in range(h):
        for x in range(w):
            y0, y1 = y - kh // 2, y - kh // 2 + kh
            x0, x1 = x - kw // 2, x - kw // 2 + kw
            out[y, x] = b[max(y0, 0):y1, max(x0, 0):x1].any()
    return out


def _erode_loop(b, kh, kw):
    h, w = b.shape
    out = np.zeros_like(b, dtype=bool)
    for y in range(h):
        for x in range(w):
            y0, y1 = y - kh // 2, y - kh // 2 + kh
            x0, x1 = x - kw // 2, x - kw // 2 + kw
            win = np.ones((kh, kw), dtype=bool)  # outside = True (pad)
            wy0, wx0 = max(y0, 0) - y0, max(x0, 0) - x0
            sub = b[max(y0, 0):min(y1, h), max(x0, 0):min(x1, w)]
            win[wy0:wy0 + sub.shape[0], wx0:wx0 + sub.shape[1]] = sub
            out[y, x] = win.all()
    return out


@pytest.mark.parametrize("kh,kw", [(1, 3), (3, 1), (3, 5), (2, 4)])
def test_rect_morphology_matches_loops(kh, kw):
    rng = np.random.RandomState(11)
    b = rng.rand(13, 16) > 0.6
    assert (_dilate_rect(b, kh, kw) == _dilate_loop(b, kh, kw)).all()
    assert (_erode_rect(b, kh, kw) == _erode_loop(b, kh, kw)).all()
    want = _erode_loop(_dilate_loop(b, kh, kw), kh, kw)
    assert (morph_close_rect(b, kh, kw) == want).all()


def test_largest_component_bbox():
    b = np.zeros((10, 12), dtype=bool)
    b[1:3, 1:3] = True            # 4 px
    b[5:9, 4:10] = True           # 24 px -> the winner
    b[0, 11] = True               # 1 px
    assert largest_component_bbox(b) == (4, 5, 10, 9)
    assert largest_component_bbox(np.zeros((4, 4), dtype=bool)) is None
    # 8-connectivity: diagonal touch merges
    d = np.zeros((4, 4), dtype=bool)
    d[0, 0] = d[1, 1] = d[2, 2] = True
    assert largest_component_bbox(d) == (0, 0, 3, 3)


# ---------------------------------------------------------------------------
# Crop decision on planted content
# ---------------------------------------------------------------------------


def _receipt_image(h=96, w=120, y0=20, y1=70, x0=30, x1=90):
    """White page, dark content block with internal texture (texture
    keeps the gradient alive inside the block, like printed text)."""
    arr = np.full((h, w, 3), 245, dtype=np.uint8)
    yy, xx = np.mgrid[y0:y1, x0:x1]
    tex = (40 + 60 * ((yy + xx) % 3)).astype(np.uint8)
    arr[y0:y1, x0:x1, :] = tex[:, :, None]
    return arr


def test_crop_bbox_recovers_planted_content():
    arr = _receipt_image()
    x1, y1, x2, y2 = crop_bbox_for_image(arr, erode_iterations=2,
                                         dilate_iterations=2)
    # bbox must cover the content core and stay within a morphology
    # margin (blur radius 9 + close kernel) of its edges
    assert x1 <= 30 + 2 and x2 >= 90 - 2
    assert y1 <= 20 + 2 and y2 >= 70 - 2
    assert x1 >= 30 - 18 and x2 <= 90 + 18
    assert y1 >= 20 - 18 and y2 <= 70 + 18


def test_crop_bbox_blank_image_falls_back_to_full_frame():
    arr = np.full((32, 40, 3), 200, dtype=np.uint8)
    assert crop_bbox_for_image(arr) == (0, 0, 40, 32)


# ---------------------------------------------------------------------------
# Distributed job + build-once materialization
# ---------------------------------------------------------------------------


def _media_df(spark, specs):
    """specs: list of (media_id, h, w, kwargs) planted-content images."""
    rows = []
    for media_id, h, w, kw in specs:
        arr = _receipt_image(h=h, w=w, **kw)
        rows.append((media_id, "image", bytearray(encode_bmp(arr)),
                     {"width": w, "height": h, "channels": 3,
                      "sample_rate": None, "n_frames": None}))
    return spark.createDataFrame(
        rows,
        "media_id string, kind string, payload binary, "
        "meta map<string,int>")


def test_crop_offsets_width_gate_and_crop(spark):
    media = _media_df(spark, [
        ("small", 48, 60, dict(y0=10, y1=40, x0=10, x1=50)),
        ("wide", 96, 120, dict(y0=20, y1=70, x0=30, x1=90)),
    ])
    out = {r["media_id"]: r for r in
           crop_offsets(media, width_threshold=80,
                        erode_iterations=2, dilate_iterations=2).collect()}
    assert out["small"]["method"] == "copied"
    assert (out["small"]["dx"], out["small"]["dy"]) == (0, 0)
    assert out["small"]["crop_w"] == 60 and out["small"]["crop_h"] == 48
    assert out["wide"]["method"] == "cropped"
    # matches the single-node decision exactly
    x1, y1, x2, y2 = crop_bbox_for_image(
        _receipt_image(), erode_iterations=2, dilate_iterations=2)
    assert (out["wide"]["dx"], out["wide"]["dy"]) == (x1, y1)
    assert (out["wide"]["crop_w"], out["wide"]["crop_h"]) \
        == (x2 - x1, y2 - y1)


def test_materialize_crops_build_once(spark, tmp_path):
    from icdar_2019_rrc_sroie_spark.plans.crop_job import (
        adjust_annotations,
        materialize_crops,
    )

    media = _media_df(spark, [
        ("wide", 96, 120, dict(y0=20, y1=70, x0=30, x1=90)),
    ])
    annotations = spark.createDataFrame(
        [("wide", [40.0, 30.0, 80.0, 30.0, 80.0, 55.0, 40.0, 55.0],
          "TOTAL 12.30")],
        "media_id string, coords array<double>, transcript string")
    out_dir = str(tmp_path / "crops")

    off1, adj1 = materialize_crops(spark, media, annotations, out_dir,
                                   snapshot_id="snap1",
                                   width_threshold=80)
    got1 = off1.collect()[0]
    x1, y1, x2, y2 = crop_bbox_for_image(_receipt_image())
    assert (got1["dx"], got1["dy"]) == (x1, y1)
    coords1 = adj1.collect()[0]["coords"]
    assert coords1[0] == round(40.0 - x1) and coords1[1] == round(30.0 - y1)

    # second invocation: must read back, not recompute — poison the
    # media source so any recompute would change the offsets
    poisoned = _media_df(spark, [
        ("wide", 96, 120, dict(y0=5, y1=90, x0=5, x1=115)),
    ])
    off2, adj2 = materialize_crops(spark, poisoned, annotations, out_dir,
                                   snapshot_id="snap1",
                                   width_threshold=80)
    got2 = off2.collect()[0]
    assert (got2["dx"], got2["dy"]) == (got1["dx"], got1["dy"])
    assert adj2.collect()[0]["coords"] == coords1

    # a NEW snapshot does recompute (different content -> offsets move)
    off3, _ = materialize_crops(spark, poisoned, annotations, out_dir,
                                snapshot_id="snap2", width_threshold=80)
    got3 = off3.collect()[0]
    assert (got3["dx"], got3["dy"]) != (got1["dx"], got1["dy"])

    # adjust_annotations matches the reference's adjust_label shift
    offsets = spark.createDataFrame([("wide", 7, 3)],
                                    "media_id string, dx int, dy int")
    adj = adjust_annotations(annotations, offsets).collect()[0]["coords"]
    assert adj == [33, 27, 73, 27, 73, 52, 33, 52]
