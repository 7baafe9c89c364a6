"""Multimodal plumbing + sink encoders + end-to-end detection plan."""

import json

from pyspark.sql import functions as F

from icdar_2019_rrc_sroie_spark.operators.geometry import anchor_grid
from icdar_2019_rrc_sroie_spark.operators.multimodal import (
    decode_and_featurize,
    resize_meta,
    sample_frames,
)
from icdar_2019_rrc_sroie_spark.operators.sinks import (
    detection_submission,
    entity_submission,
)
from icdar_2019_rrc_sroie_spark.plans.detection import detect_text_lines


def _media_df(spark):
    rows = [
        ("img1", "image", b"\x01\x02\x03", (4, 3, 3, None, None)),
        ("img2", "image", b"\xff\xee", (8, 2, 1, None, None)),
        ("vid1", "video", b"0123456789abcdef", (4, 4, 3, None, 25)),
        ("aud1", "audio", b"\x00\x01", (None, None, 1, 16000, None)),
    ]
    return spark.createDataFrame(
        rows,
        "media_id string, kind string, payload binary,"
        " meta struct<width:int,height:int,channels:int,"
        "sample_rate:int,n_frames:int>",
    )


def test_decode_and_featurize(spark):
    out = {r["media_id"]: r
           for r in decode_and_featurize(_media_df(spark)).collect()}
    assert out["img1"]["decoded_bytes"] == 4 * 3 * 3
    assert len(out["img1"]["feature"]) == 8
    assert 0.0 <= out["img1"]["mean_intensity"] <= 255.0
    # determinism
    again = {r["media_id"]: r
             for r in decode_and_featurize(_media_df(spark)).collect()}
    assert out["img1"]["feature"] == again["img1"]["feature"]


def test_sample_frames(spark):
    frames = sample_frames(_media_df(spark), every_n=10).collect()
    assert {r["media_id"] for r in frames} == {"vid1"}
    assert sorted(r["frame_idx"] for r in frames) == [0, 10, 20]


def test_resize_meta(spark):
    got = {r["media_id"]: r for r in
           resize_meta(_media_df(spark).filter("kind = 'image'"),
                       1024, 2048).collect()}
    assert got["img1"]["ratio_w"] == 1024 / 4
    assert got["img1"]["ratio_h"] == 2048 / 3


def test_detection_submission(spark):
    lines = spark.createDataFrame(
        [("d0", 1, 10.9, 5.2, 99.9, 25.0, 0.9),
         ("d0", 0, 0.0, 0.0, 50.0, 20.0, 0.8)],
        "doc_id string, line_id int, xmin double, ymin double,"
        " xmax double, ymax double, score double")
    got = detection_submission(lines).collect()[0]["submission"]
    assert got == "0,0,50,20\n10,5,99,25"


def test_entity_submission(spark):
    spans = spark.createDataFrame(
        [("c0", 3, "total", "RM12.34"), ("c0", 3, "company", "ACME")],
        "conv_id string, turn_idx int, label string, text string")
    got = entity_submission(spans).collect()[0]["submission"]
    assert json.loads(got) == {"company": "ACME", "total": "RM12.34"}
    # fixed key order: company before total
    assert got.index("company") < got.index("total")


def test_detection_plan_end_to_end(spark):
    anchors = anchor_grid(spark, feat_h=4, feat_w=8, heights=(11, 15, 22))
    # one strong horizontal band of proposals at y≈16..27 across x cells
    a_pdf = anchors.toPandas()
    preds = []
    for r in a_pdf.itertuples(index=False):
        on_band = abs((r.ymin + r.ymax) / 2 - 23.5) < 3 and (r.ymax - r.ymin) < 14
        score = 0.97 if on_band else 0.05
        preds.append(("doc0", int(r.anchor_id), 0.0, 0.0, score))
    pred_df = spark.createDataFrame(
        preds, "doc_id string, anchor_id long, vc double, vh double,"
        " score double")
    lines = detect_text_lines(pred_df, anchors, img_w=128.0, img_h=64.0)
    got = lines.collect()
    assert len(got) == 1
    line = got[0]
    assert line["score"] > 0.9
    assert line["xmax"] - line["xmin"] > 60  # spans several 16px strips


def test_package_submission_zip(spark, tmp_path):
    from zipfile import ZipFile

    from icdar_2019_rrc_sroie_spark.operators.sinks import (
        detection_submission,
        package_submission_zip,
    )

    lines = spark.createDataFrame(
        [("X001", 1, 10.0, 20.0, 110.0, 40.0, 0.9),
         ("X001", 2, 10.0, 50.0, 110.0, 70.0, 0.8),
         ("X002", 1, 5.0, 5.0, 50.0, 25.0, 0.7)],
        "doc_id string, line_id int, xmin double, ymin double, "
        "xmax double, ymax double, score double")
    sub = detection_submission(lines)
    zp = str(tmp_path / "submit.zip")
    n = package_submission_zip(sub, zp)
    assert n == 2
    with ZipFile(zp) as zf:
        assert sorted(zf.namelist()) == ["X001.txt", "X002.txt"]
        assert zf.read("X001.txt").decode() == "10,20,110,40\n10,50,110,70"
        assert zf.read("X002.txt").decode() == "5,5,50,25"


def test_bmp_wav_real_decode_roundtrip(spark):
    """The decode seam is real for library-free formats: random pixels
    → BMP bytes → the distributed kernel decodes them back exactly
    (incl. row padding for non-multiple-of-4 widths and BGR/bottom-up
    layout); same for PCM16 WAV samples."""
    import numpy as np
    import pandas as pd

    from icdar_2019_rrc_sroie_spark.operators.multimodal import (
        decode_and_featurize,
        decode_bmp,
        decode_wav,
        encode_bmp,
        encode_wav,
    )

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (5, 7, 3), dtype=np.uint8)  # w=7 → padding
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)

    audio = rng.randint(-32768, 32767, (100, 2)).astype(np.int16)
    got, rate = decode_wav(encode_wav(audio, 16000))
    assert rate == 16000 and np.array_equal(got, audio)

    import pytest

    # through the distributed kernel: mean_intensity must equal the
    # true pixel mean, proving the real decoder ran (the stub's hash
    # expansion would give a different mean)
    rows = [{"media_id": "bmp0", "kind": "image",
             "payload": encode_bmp(img),
             "meta": {"width": 7, "height": 5, "channels": 3,
                      "sample_rate": None, "n_frames": None}},
            {"media_id": "wav0", "kind": "audio",
             "payload": encode_wav(audio, 16000),
             "meta": {"width": None, "height": None, "channels": 2,
                      "sample_rate": 16000, "n_frames": None}}]
    from icdar_2019_rrc_sroie_spark.operators.multimodal import MEDIA_SCHEMA
    media = spark.createDataFrame(pd.DataFrame(rows), MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in decode_and_featurize(media).collect()}
    assert out["bmp0"]["decoded_bytes"] == img.size
    assert out["bmp0"]["mean_intensity"] == pytest.approx(img.mean())
    want_wav = ((audio.astype(np.int32) + 32768) // 256).mean()
    assert out["wav0"]["mean_intensity"] == pytest.approx(want_wav)


def test_video_frame_sampling_real_bmp_stream(spark):
    """Concatenated-BMP video: the kernel splits frames via each BMP's
    own size field and every sampled frame decodes back to the exact
    source pixels."""
    import numpy as np
    import pandas as pd
    import pytest

    from icdar_2019_rrc_sroie_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_bmp,
        encode_bmp,
        sample_frames,
        split_bmp_stream,
    )

    rng = np.random.RandomState(4)
    frames = [rng.randint(0, 256, (4, 5, 3), dtype=np.uint8)
              for _ in range(9)]
    stream = b"".join(encode_bmp(f) for f in frames)
    assert len(split_bmp_stream(stream)) == 9

    rows = [{"media_id": "vid0", "kind": "video", "payload": stream,
             "meta": {"width": 5, "height": 4, "channels": 3,
                      "sample_rate": None, "n_frames": 9}}]
    media = spark.createDataFrame(pd.DataFrame(rows), MEDIA_SCHEMA)
    got = {r["frame_idx"]: bytes(r["frame"])
           for r in sample_frames(media, every_n=4).collect()}
    assert sorted(got) == [0, 4, 8]
    for idx, frame_bytes in got.items():
        assert np.array_equal(decode_bmp(frame_bytes), frames[idx])

    # malformed stream: truncated final frame raises, not silently drops
    with pytest.raises(Exception):
        split_bmp_stream(stream[:-10])


def test_apply_corrections_duplicate_patch_rows_do_not_fan_out(spark):
    from icdar_2019_rrc_sroie_spark.operators.sinks import apply_corrections

    spans = spark.createDataFrame(
        [("d1", "company", "OLD")], "doc_id string, label string, text string")
    corr = spark.createDataFrame(
        [("d1", "company", "NEW A"), ("d1", "company", "NEW B")],
        "doc_id string, label string, corrected string")
    out = apply_corrections(spans, corr).collect()
    assert len(out) == 1 and out[0]["text"].startswith("NEW")


def test_raster_ops_vs_naive_reference(spark):
    """Sobel/Otsu/morphology (X20) vs naive loop implementations on a
    random image, then the distributed raster_stats kernel end-to-end
    on a real BMP payload."""
    import numpy as np
    import pandas as pd
    import pytest

    from icdar_2019_rrc_sroie_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_bmp,
        morph_close,
        morph_open,
        otsu_threshold,
        raster_stats,
        sobel_magnitude,
        to_gray,
    )

    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, (12, 10, 3), dtype=np.uint8)
    gray = to_gray(img)

    # naive Sobel with explicit loops (edge padding)
    p = np.pad(gray, 1, mode="edge")
    want = np.zeros_like(gray)
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], float)
    ky = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], float)
    for y in range(gray.shape[0]):
        for x in range(gray.shape[1]):
            win = p[y:y + 3, x:x + 3]
            want[y, x] = np.hypot((win * kx).sum(), (win * ky).sum())
    assert np.allclose(sobel_magnitude(gray), want)

    # naive Otsu: exhaustive threshold search
    g8 = gray.clip(0, 255).astype(np.uint8).ravel()
    best_t, best_v = 0, -1.0
    for t in range(256):
        lo, hi = g8[g8 <= t], g8[g8 > t]
        if len(lo) == 0 or len(hi) == 0:
            continue
        v = len(lo) * len(hi) * (lo.mean() - hi.mean()) ** 2
        if v > best_v:
            best_v, best_t = v, t
    assert otsu_threshold(gray) == pytest.approx(best_t, abs=1)

    # morphology: open kills isolated pixels, close fills pinholes
    b = np.zeros((9, 9), bool)
    b[2:7, 2:7] = True
    b[4, 4] = False          # pinhole
    speck = b.copy()
    speck[0, 8] = True       # isolated speck
    assert not morph_open(speck)[0, 8]
    assert morph_close(b)[4, 4]

    # distributed kernel on a real BMP
    rows = [{"media_id": "r0", "kind": "image", "payload": encode_bmp(img),
             "meta": {"width": 10, "height": 12, "channels": 3,
                      "sample_rate": None, "n_frames": None}}]
    media = spark.createDataFrame(pd.DataFrame(rows), MEDIA_SCHEMA)
    out = raster_stats(media).collect()[0]
    assert out["otsu_t"] == pytest.approx(best_t, abs=1)
    assert out["edge_mean"] == pytest.approx(want.mean())
    fg = gray > out["otsu_t"]
    assert out["fg_frac"] == pytest.approx(fg.mean())


def test_decode_payload_malformed_magic_falls_back(spark):
    """A payload that merely starts with 'BM'/'RIFF…WAVE' but fails to
    parse must fall through to the stub, not crash the kernel."""
    import numpy as np

    from icdar_2019_rrc_sroie_spark.operators.multimodal import (
        _fake_decode,
        decode_payload,
    )

    for bad in (b"BMxx", b"BM" + b"\x00" * 30,
                b"RIFF\x00\x00\x00\x00WAVExx"):
        got = decode_payload(bad, 8, 8, 1)
        assert np.array_equal(got, _fake_decode(bad, 8, 8, 1))


def test_channel_stats_handles_audio_rows(spark):
    """channel_stats on a 2-D WAV decode (samples, channels) — per-
    channel stats over the flattened last axis, no IndexError."""
    import numpy as np
    import pandas as pd
    import pytest

    from icdar_2019_rrc_sroie_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        channel_stats,
        encode_wav,
    )

    rng = np.random.RandomState(2)
    audio = rng.randint(-32768, 32767, (64, 2)).astype(np.int16)
    rows = [{"media_id": "a0", "kind": "audio",
             "payload": encode_wav(audio, 8000),
             "meta": {"width": None, "height": None, "channels": 2,
                      "sample_rate": 8000, "n_frames": None}}]
    media = spark.createDataFrame(pd.DataFrame(rows), MEDIA_SCHEMA)
    out = {r["channel"]: r for r in channel_stats(media).collect()}
    u8 = ((audio.astype(np.int32) + 32768) // 256).astype(np.float64)
    for ch in (0, 1):
        assert out[ch]["n_pixels"] == 64
        assert out[ch]["mean"] == pytest.approx(u8[:, ch].mean())
        assert out[ch]["std"] == pytest.approx(u8[:, ch].std())


def test_codec_dispatch_uses_cv2_when_importable(monkeypatch):
    """Contract for the optional-dependency route: the moment a codec
    library is importable, decode_payload must route compressed
    payloads through it (and flip BGR->RGB) instead of the stub. The
    sandbox has no cv2, so a minimal fake is injected."""
    import sys
    import types

    import numpy as np

    from icdar_2019_rrc_sroie_spark.operators import multimodal as mm

    decoded_bgr = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    fake = types.ModuleType("cv2")
    fake.IMREAD_COLOR = 1
    fake.imdecode = lambda buf, flag: decoded_bgr
    monkeypatch.setitem(sys.modules, "cv2", fake)

    got = mm.decode_payload(b"\xff\xd8\xff fake jpeg", 3, 2, 3)
    assert (got == decoded_bgr[:, :, ::-1]).all()


def test_codec_dispatch_without_libs_falls_back_to_stub():
    import numpy as np
    import pytest

    from icdar_2019_rrc_sroie_spark.operators import multimodal as mm

    try:
        import cv2  # noqa: F401
        pytest.skip("cv2 present: stub no longer reachable here")
    except ImportError:
        pass
    try:
        import PIL  # noqa: F401
        pytest.skip("PIL present: stub no longer reachable here")
    except ImportError:
        pass
    payload = b"\xff\xd8\xff not decodable"
    got = mm.decode_payload(payload, 4, 5, 3)
    assert got.shape == (5, 4, 3)
    assert (got == mm._fake_decode(payload, 4, 5, 3)).all()


def test_codec_real_jpeg_decode_when_available():
    """Skip-marked real-decode path: runs only where cv2 or PIL exists
    (green in a codec-equipped environment, skipped here)."""
    import numpy as np
    import pytest

    from icdar_2019_rrc_sroie_spark.operators import multimodal as mm

    have_cv2 = have_pil = False
    try:
        import cv2  # noqa: F401
        have_cv2 = True
    except ImportError:
        pass
    try:
        from PIL import Image
        have_pil = True
    except ImportError:
        pass
    if not (have_cv2 or have_pil):
        pytest.skip("no codec library in this environment")
    # build a tiny PNG via PIL (or cv2) and decode it through the seam
    arr = np.zeros((4, 6, 3), dtype=np.uint8)
    arr[:, :3] = (255, 0, 0)
    if have_pil:
        import io

        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        payload = buf.getvalue()
    else:
        import cv2

        payload = cv2.imencode(".png", arr[:, :, ::-1])[1].tobytes()
    got = mm.decode_payload(payload, 6, 4, 3)
    assert got.shape == (4, 6, 3)
    assert (got == arr).all()
