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


# --------------------------------------------------------------------------
# Trained path: REAL frozen weights through the same broadcast +
# Arrow-batch seam. charlm_lite is a hashed-char-trigram + rule-feature
# multinomial logistic regression trained offline in NumPy
# (tools/train_charlm_lite.py regenerates it deterministically) and
# committed as models/charlm_lite.npz — the engine analog of the
# reference's CharLM checkpoint restore
# (keyword_information_extraction/model/charlm/architecture.py:118-170
# consuming functional/saving/checkpoint.py:22-63 state).
# --------------------------------------------------------------------------

NGRAM_DIM = 256
_DENSE_PATTERNS: tuple[tuple[str, bool], ...] = (
    # (regex, is_regex) — order defines dense feature positions; keep
    # in lockstep between training and inference (same function).
    (r"(?:\d{4}|\d{2}|\d)[-/.](?:\d{2}|\d)[-/.](?:\d{4}|\d{2}|\d)", True),
    (r"(?:\d{4}|\d{2}|\d)[-/.]*\s*"
     r"(?:JAN|FEB|MAR|APR|MAY|JUN|JUL|AUG|SEP|OCT|NOV|DEC)"
     r"[-/.]*\s*(?:\d{4}|\d{2}|\d)", True),
    (r"(?:\d{3}|\d{2}|\d|\d\,\d{3})\.(?:\d{2}|\d)", True),
    (r"TOTAL|AMOUNT|DUE|AMT|ROUND|RND|RM|GST", True),
    (r"JALAN|JLN|LRG|LOT |NO ?\.? ?\d", True),
    (",", False),
    (r"\d{5}", True),
    (r"SELANGOR|JOHOR|MELAKA|PULAU|PERAK|KEDAH|KUALA", True),
    (r"FLR|FLOOR|MALL|PLAZA|LEVEL", True),
    (r"SDN|BHD|ENTERPRISE|TRADING|MART", True),
    (r"^DATE", True),
    (r"^\d+$", True),
)
# + digit frac + length + first-line flag + 4 rule-conjunction flags
N_DENSE = len(_DENSE_PATTERNS) + 7


def featurize_lines(texts: pd.Series,
                    line_idx: np.ndarray | None = None) -> np.ndarray:
    """(n,) text series → (n, N_DENSE + NGRAM_DIM) float features:
    rule-shaped dense flags (the classifier's evidence set, classify.py)
    + digit fraction, length, first-line positional flag, then
    L1-normalized hashed char-trigram counts. Shared verbatim by
    offline training and the Arrow inference kernel, so a weights file
    IS the model."""
    upper = texts.fillna("").str.upper().str.strip()
    n = len(upper)
    X = np.zeros((n, N_DENSE + NGRAM_DIM), dtype=np.float64)
    for j, (pat, is_regex) in enumerate(_DENSE_PATTERNS):
        X[:, j] = upper.str.contains(pat, regex=is_regex).to_numpy()
    lengths = upper.str.len().to_numpy().astype(np.float64)
    digits = upper.str.count(r"\d").to_numpy().astype(np.float64)
    X[:, len(_DENSE_PATTERNS)] = digits / np.maximum(lengths, 1.0)
    X[:, len(_DENSE_PATTERNS) + 1] = np.minimum(lengths / 50.0, 2.0)
    first_line = np.zeros(n)
    if line_idx is not None:
        first_line = (np.asarray(line_idx) == 0).astype(np.float64)
    X[:, len(_DENSE_PATTERNS) + 2] = first_line
    # rule-conjunction features (classify.py's class evidence — the
    # linear model can't form conjunctions of flags itself; feeding it
    # the rule outputs is standard rule-informed featurization and lets
    # the trained weights subsume the deterministic scorer)
    d1, d2, amt, ctx, marker, comma, postcode, state, venue = \
        (X[:, j] for j in range(9))
    lot_jalan = upper.str.contains(
        r"(?:LOT |NO ?\.? ?\d).*(?:JALAN|JLN)", regex=True).to_numpy()
    unwanted = upper.str.contains(
        r"TAX|RECEIPT|INVOICE", regex=True).to_numpy()
    only_digits = upper.str.fullmatch(r"\d*").to_numpy()
    o = len(_DENSE_PATTERNS) + 3
    X[:, o + 0] = np.maximum(d1, d2)                       # date rule
    X[:, o + 1] = amt * ctx                                # total rule
    X[:, o + 2] = np.clip(                                 # address rule
        marker * np.maximum(comma, postcode) + comma * postcode
        + comma * venue + lot_jalan + postcode * state, 0, 1)
    X[:, o + 3] = first_line * (1 - unwanted) * (1 - only_digits)
    base = N_DENSE
    for i, s in enumerate(upper.to_numpy()):
        if len(s) < 3:
            continue
        codes = np.frombuffer(s.encode("utf-8", "replace"),
                              dtype=np.uint8).astype(np.int64)
        tri = (codes[:-2] * 961 + codes[1:-1] * 31 + codes[2:]) % NGRAM_DIM
        counts = np.bincount(tri, minlength=NGRAM_DIM).astype(np.float64)
        X[i, base:] = counts / max(len(tri), 1)
    return X


def default_weights_path() -> str:
    import os.path as osp

    return osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                    "models", "charlm_lite.npz")


def load_trained_params(path: str | None = None) -> dict:
    """Frozen checkpoint → broadcastable params dict {W, b}."""
    with np.load(path or default_weights_path()) as z:
        return {"W": z["W"].astype(np.float64),
                "b": z["b"].astype(np.float64)}


def _score_batch_trained(texts: pd.Series, params: dict,
                         line_idx: np.ndarray | None = None
                         ) -> tuple[np.ndarray, np.ndarray]:
    X = featurize_lines(texts, line_idx)
    logits = X @ params["W"] + params["b"]
    exp = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs = exp / exp.sum(axis=1, keepdims=True)
    return probs.argmax(axis=1).astype(np.int32), probs.max(axis=1)


def classify_lines_trained(lines: DataFrame,
                           params: dict | None = None) -> DataFrame:
    """Same I/O contract as :func:`classify_lines_model`, scoring with
    the committed charlm_lite weights: params broadcast once, inference
    one matmul per Arrow batch."""
    sc = lines.sparkSession.sparkContext
    bc = sc.broadcast(params or load_trained_params())

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = bc.value
        for pdf in batches:
            cls, prob = _score_batch_trained(
                pdf["text"], model, pdf["line_idx"].to_numpy())
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
