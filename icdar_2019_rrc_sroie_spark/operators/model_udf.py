"""Model-inference surface (U3): Arrow-batched classifier UDF.

The default engine classifier is pure Catalyst (operators/classify.py).
This module is the *model-shaped* variant with the exact deployment
mechanics a real CharLM/CTPN checkpoint needs at cluster scale
(SURVEY.md §2.9):

* frozen parameters distributed with ``sparkContext.broadcast`` (the
  analog of loading functional/saving/checkpoint.py:22-63 weights),
* inference in ``mapInPandas`` over Arrow record batches (bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``) — vectorized NumPy
  per batch, zero per-row Python,
* per-line output contract ``(conv_id, turn_idx, line_idx, cls, prob)``
  identical to the reference's softmax/argmax output
  (keyword_information_extraction/evaluation.py:106-114).

The "model" here is a deterministic char-ngram logit table so results
are reproducible without torch; swapping in a real checkpoint changes
only ``_score_batch``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..constants import LABELS_CLASSES

OUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("line_idx", T.IntegerType()),
        T.StructField("cls", T.IntegerType()),
        T.StructField("prob", T.DoubleType()),
    ]
)

_KEYWORDS = {
    "date": ("DATE", "/", "-"),
    "total": ("TOTAL", "RM", "AMOUNT"),
    "address": ("JALAN", "LOT", ","),
    "company": ("SDN", "BHD", "MART"),
}


def build_model_params(seed: int = 7) -> dict:
    """Deterministic stand-in for frozen checkpoint weights: per-class
    keyword weight vectors derived from a hash of (seed, class)."""
    params = {}
    for cls_name, words in _KEYWORDS.items():
        h = hashlib.md5(f"{seed}|{cls_name}".encode()).digest()
        params[cls_name] = {
            "words": words,
            "bias": h[0] / 255.0,
            "scale": 1.0 + h[1] / 255.0,
        }
    return params


def _score_batch(texts: pd.Series, params: dict) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized scoring of one Arrow batch. Real deployments replace
    this with a torch forward over the padded char-index tensor."""
    n = len(texts)
    logits = np.zeros((n, 5), dtype=np.float64)
    logits[:, LABELS_CLASSES["none"]] = 1.0
    upper = texts.str.upper()
    for cls_name, p in params.items():
        cls_id = LABELS_CLASSES[cls_name]
        score = np.zeros(n)
        for w in p["words"]:
            score += upper.str.contains(w, regex=False).to_numpy() * p["scale"]
        logits[:, cls_id] = score + p["bias"] - 0.5
    exp = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs = exp / exp.sum(axis=1, keepdims=True)
    cls = probs.argmax(axis=1)
    return cls.astype(np.int32), probs.max(axis=1)


def classify_lines_model(lines: DataFrame, params: dict | None = None) -> DataFrame:
    """(conv_id, turn_idx, line_idx, text) → per-line (cls, prob) via a
    broadcast model and Arrow-batched inference."""
    sc = lines.sparkSession.sparkContext
    bc = sc.broadcast(params or build_model_params())

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = bc.value
        for pdf in batches:
            cls, prob = _score_batch(pdf["text"], model)
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"],
                    "turn_idx": pdf["turn_idx"].astype("int32"),
                    "line_idx": pdf["line_idx"].astype("int32"),
                    "cls": cls,
                    "prob": prob,
                }
            )

    return lines.mapInPandas(infer, OUT_SCHEMA)
