"""Multimodal payload plumbing: opaque binary columns + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The codec libraries are not available in this
container, so the *byte-level decode* is a clearly marked deterministic
fake (`_fake_decode`) behind the real Spark plumbing — schema, batch
shape, partitioning and UDF signatures are production-shaped and
tested. Swap ``_fake_decode`` for cv2/PIL/ffmpeg calls on a real
cluster.

Reference analog: `read_image` + Resize/Normalize transforms
(functional/utils/dataset.py:95-111, transformation.py:39-164) — the
per-image work the reference does in the DataLoader happens here inside
executor-side Arrow batches.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("channels", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("decoded_bytes", T.LongType(), False),
        T.StructField("mean_intensity", T.DoubleType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def _fake_decode(payload: bytes, width: int, height: int,
                 channels: int) -> np.ndarray:
    """STUB — deterministic stand-in for a real image decoder.

    Real deployments replace this with e.g. ``cv2.imdecode``. The fake
    expands the payload bytes into a (h, w, c) uint8 array via a rolling
    hash so downstream numerics are deterministic and testable.
    """
    need = width * height * channels
    seed = hashlib.md5(payload).digest()
    reps = need // len(seed) + 1
    buf = np.frombuffer((seed * reps)[:need], dtype=np.uint8)
    return buf.reshape(height, width, channels)


def decode_and_featurize(media: DataFrame, feature_dim: int = 8) -> DataFrame:
    """binary payloads → per-item features, Arrow-batched (no per-row
    Python at the Spark level; the kernel is vectorized per batch)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                meta = row.meta
                w = int(meta["width"] or 8)
                h = int(meta["height"] or 8)
                c = int(meta["channels"] or 1)
                arr = _fake_decode(bytes(row.payload), w, h, c)
                pooled = arr.astype(np.float64).mean(axis=(0, 1))
                feat = np.resize(pooled, feature_dim) / 255.0
                out.append(
                    {
                        "media_id": row.media_id,
                        "kind": row.kind,
                        "decoded_bytes": int(arr.size),
                        "mean_intensity": float(arr.mean()),
                        "feature": feat.astype(np.float32).tolist(),
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video payloads → sampled frame rows (1 row per kept frame).

    Frame extraction itself is stubbed (slices of the payload); the
    explode-shaped output contract matches a real ffmpeg-based kernel.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                if row.kind != "video":
                    continue
                n_frames = int(row.meta["n_frames"] or 0)
                payload = bytes(row.payload)
                for idx in range(0, n_frames, every_n):
                    lo = idx % max(len(payload) - 4, 1)
                    out.append(
                        {
                            "media_id": row.media_id,
                            "frame_idx": idx,
                            "frame": payload[lo:lo + 4],
                        }
                    )
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame"])

    return media.mapInPandas(kernel, FRAME_SCHEMA)


CHANNEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("channel", T.IntegerType()),
        T.StructField("px_sum", T.DoubleType()),
        T.StructField("px_sumsq", T.DoubleType()),
        T.StructField("px_count", T.LongType()),
    ]
)


def channel_stats(media: DataFrame) -> DataFrame:
    """Per-channel corpus mean/std over decoded image payloads (A2 —
    functional/utils/dataset.py:13-49): partial (sum, sumsq, count) per
    Arrow batch inside ``mapInPandas``, exact global combine in a tiny
    aggregation. One pass, no image ever leaves its executor."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            acc: dict[int, list[float]] = {}
            for row in pdf.itertuples(index=False):
                meta = row.meta
                w = int(meta["width"] or 8)
                h = int(meta["height"] or 8)
                c = int(meta["channels"] or 1)
                arr = _fake_decode(bytes(row.payload), w, h, c).astype(np.float64)
                for ch in range(c):
                    s = acc.setdefault(ch, [0.0, 0.0, 0])
                    s[0] += float(arr[:, :, ch].sum())
                    s[1] += float((arr[:, :, ch] ** 2).sum())
                    s[2] += arr.shape[0] * arr.shape[1]
            if acc:
                yield pd.DataFrame(
                    [{"channel": ch, "px_sum": v[0], "px_sumsq": v[1],
                      "px_count": v[2]} for ch, v in acc.items()]
                )

    parts = media.mapInPandas(partials, CHANNEL_STATS_SCHEMA)
    mean = F.sum("px_sum") / F.sum("px_count")
    ex2 = F.sum("px_sumsq") / F.sum("px_count")
    return parts.groupBy("channel").agg(
        mean.alias("mean"),
        F.sqrt(ex2 - mean * mean).alias("std"),
        F.sum("px_count").cast("long").alias("n_pixels"),
    )


def filter_empty_regions(features: DataFrame,
                         white_threshold: float = 250.0) -> DataFrame:
    """F3 image analog (functional/utils/box.py:102-134): drop regions
    whose decoded mean intensity is white-ish (≥ threshold)."""
    return features.filter(F.col("mean_intensity") < white_threshold)


def resize_meta(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize bookkeeping (X18): rescale ratios as pure columns; the
    raster resample itself belongs to the decode kernel."""
    return media.select(
        "media_id",
        "kind",
        (F.lit(target_w) / F.col("meta.width")).alias("ratio_w"),
        (F.lit(target_h) / F.col("meta.height")).alias("ratio_h"),
    )
