"""Per-document sequential kernels: NMS and text-line connection.

These two steps are inherently order-dependent within one document
(greedy suppression — non_max_suppression.py:6-65; successor graph +
chain following — text_proposal_graph_builder.py:19-152,
text_proposal_connector.py:8-114), so they run as vectorized NumPy
kernels inside ``applyInPandas`` groups keyed by ``doc_id`` — the same
math the reference runs per image, but embarrassingly parallel across
documents/executors. Groups are small (proposals of one document), so
memory per group is bounded.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..constants import (
    MAX_HORIZONTAL_GAP,
    MIN_SIZE_SIM,
    MIN_V_OVERLAPS,
    NMS_THRESH,
)

# ---------------------------------------------------------------------------
# NumPy kernels (pure functions; also used directly by unit tests)
# ---------------------------------------------------------------------------


def nms_keep(boxes: np.ndarray, scores: np.ndarray,
             iou_threshold: float = NMS_THRESH) -> list[int]:
    """Greedy non-max suppression; returns surviving indices in pick order.

    Tie behavior matches the reference exactly: a stable ascending sort
    reversed, so among equal scores the *larger* original index is
    picked first (non_max_suppression.py:29).
    """
    if len(boxes) == 0:
        return []
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x1 - x0 + 1.0) * (y1 - y0 + 1.0)
    order = np.argsort(scores, kind="stable")[::-1]
    keep: list[int] = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        rest = order[1:]
        iw = np.maximum(0.0, np.minimum(x1[i], x1[rest]) - np.maximum(x0[i], x0[rest]))
        ih = np.maximum(0.0, np.minimum(y1[i], y1[rest]) - np.maximum(y0[i], y0[rest]))
        inter = iw * ih
        iou = inter / (areas[i] + areas[rest] - inter)
        order = rest[iou <= iou_threshold]
    return keep


def _successor_edges(boxes: np.ndarray, scores: np.ndarray,
                     im_w: int,
                     max_gap: int = MAX_HORIZONTAL_GAP,
                     min_v_overlap: float = MIN_V_OVERLAPS,
                     min_size_sim: float = MIN_SIZE_SIM) -> np.ndarray:
    """Boolean adjacency of the proposal-succession graph
    (text_proposal_graph_builder.py:115-152)."""
    n = len(boxes)
    heights = boxes[:, 3] - boxes[:, 1] + 1.0

    at_x: dict[int, list[int]] = {}
    for idx in range(n):
        at_x.setdefault(int(boxes[idx, 0]), []).append(idx)

    def v_ok(a: int, b: int) -> bool:
        y_lo = max(boxes[a, 1], boxes[b, 1])
        y_hi = min(boxes[a, 3], boxes[b, 3])
        overlap = max(0.0, y_hi - y_lo + 1.0) / min(heights[a], heights[b])
        size_sim = min(heights[a], heights[b]) / max(heights[a], heights[b])
        return overlap >= min_v_overlap and size_sim >= min_size_sim

    def scan(idx: int, xs: Iterable[int]) -> list[int]:
        found: list[int] = []
        for x in xs:
            for cand in at_x.get(x, ()):
                if v_ok(cand, idx):
                    found.append(cand)
            if found:
                return found
        return found

    def successions(idx: int) -> list[int]:
        x0 = int(boxes[idx, 0])
        return scan(idx, range(x0 + 1, min(x0 + max_gap + 1, im_w)))

    def precursors(idx: int) -> list[int]:
        x0 = int(boxes[idx, 0])
        return scan(idx, range(x0 - 1, max(x0 - max_gap, 0) - 1, -1))

    adj = np.zeros((n, n), dtype=bool)
    for idx in range(n):
        succ = successions(idx)
        if not succ:
            continue
        best = succ[int(np.argmax(scores[succ]))]
        prev = precursors(best)
        if scores[idx] >= np.max(scores[prev]):
            adj[idx, best] = True
    return adj


def connect_groups(adj: np.ndarray) -> list[list[int]]:
    """Chains of the (≤1-successor) graph (text_connector/graph.py:17-34)."""
    groups: list[list[int]] = []
    for start in range(adj.shape[0]):
        if adj[:, start].any() or not adj[start, :].any():
            continue
        chain = [start]
        node = start
        while adj[node, :].any():
            node = int(np.flatnonzero(adj[node, :])[0])
            chain.append(node)
        groups.append(chain)
    return groups


def _fit_line_at(xs: np.ndarray, ys: np.ndarray, x_a: float, x_b: float):
    """Least-squares y at two x positions (text_proposal_connector.py:8-26)."""
    if np.all(xs == xs[0]):
        return float(ys[0]), float(ys[0])
    slope, intercept = np.polyfit(xs, ys, 1)
    return float(slope * x_a + intercept), float(slope * x_b + intercept)


def text_lines_from_proposals(boxes: np.ndarray, scores: np.ndarray,
                              im_w: int, im_h: int) -> tuple[np.ndarray, np.ndarray]:
    """Group proposals and assemble one box per text line
    (text_proposal_connector.py:62-114 semantics)."""
    adj = _successor_edges(boxes, scores, im_w)
    groups = connect_groups(adj)
    lines = np.zeros((len(groups), 4), dtype=np.float64)
    avg_scores = np.zeros(len(groups), dtype=np.float64)
    for g, members in enumerate(groups):
        member_boxes = boxes[members]
        xmin = member_boxes[:, 0].min()
        xmax = member_boxes[:, 2].max()
        offset = (member_boxes[0, 2] - member_boxes[0, 0]) / 2.0
        top_a, top_b = _fit_line_at(member_boxes[:, 0], member_boxes[:, 1],
                                    xmin + offset, xmax - offset)
        bot_a, bot_b = _fit_line_at(member_boxes[:, 0], member_boxes[:, 3],
                                    xmin + offset, xmax - offset)
        lines[g] = (xmin, min(top_a, top_b), xmax, max(bot_a, bot_b))
        avg_scores[g] = scores[members].sum() / len(members)
    # clip into the image (functional/utils/box.py:75-99)
    lines[:, 0::2] = np.clip(lines[:, 0::2], 0.0, im_w - 1.0)
    lines[:, 1::2] = np.clip(lines[:, 1::2], 0.0, im_h - 1.0)
    return lines, avg_scores


# ---------------------------------------------------------------------------
# applyInPandas wrappers (distributed per-doc execution)
# ---------------------------------------------------------------------------


def _spread_groups(df: DataFrame, key: str) -> DataFrame:
    """Pin the keyed exchange feeding a per-doc kernel at the
    configured shuffle width. The detection kernels are CPU-dense but
    byte-light (a few hundred proposal rows per doc), so AQE's
    byte-based coalescing collapses their shuffle to ONE partition
    (below ``coalescePartitions.minPartitionSize``) and the per-doc
    NMS/connector loops run serially — three ~0.5 s single-task
    stages in the r7 detection_learned profile. An EXPLICIT
    ``repartition(n, key)`` is exempt from AQE coalescing; ``n`` is
    ``spark.sql.shuffle.partitions`` — the width the exchange would
    have had without AQE, cluster-configured in production (not a
    local constant). The group→kernel mapping is unchanged, so
    results are identical."""
    try:
        n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):  # e.g. "auto" on some builds
        n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, key)

PROPOSAL_COLS = ["doc_id", "xmin", "ymin", "xmax", "ymax", "score"]

NMS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("xmin", T.DoubleType()),
        T.StructField("ymin", T.DoubleType()),
        T.StructField("xmax", T.DoubleType()),
        T.StructField("ymax", T.DoubleType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("pick_order", T.IntegerType()),
    ]
)

LINES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("line_id", T.IntegerType()),
        T.StructField("xmin", T.DoubleType()),
        T.StructField("ymin", T.DoubleType()),
        T.StructField("xmax", T.DoubleType()),
        T.StructField("ymax", T.DoubleType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def nms_per_doc(proposals: DataFrame,
                iou_threshold: float = NMS_THRESH) -> DataFrame:
    """Distributed greedy NMS: one kernel invocation per document."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("proposal_id") if "proposal_id" in pdf else pdf
        boxes = pdf[["xmin", "ymin", "xmax", "ymax"]].to_numpy(float)
        scores = pdf["score"].to_numpy(float)
        keep = nms_keep(boxes, scores, iou_threshold)
        out = pdf.iloc[keep][PROPOSAL_COLS].copy()
        out["pick_order"] = np.arange(len(keep), dtype=np.int32)
        return out

    return _spread_groups(proposals, "doc_id") \
        .groupBy("doc_id").applyInPandas(kernel, NMS_SCHEMA)


def connect_lines_per_doc(proposals: DataFrame, im_w: int,
                          im_h: int) -> DataFrame:
    """Distributed text-line assembly (J4/J5/A1) per document."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("proposal_id") if "proposal_id" in pdf else pdf
        boxes = pdf[["xmin", "ymin", "xmax", "ymax"]].to_numpy(float)
        scores = pdf["score"].to_numpy(float)
        lines, avg = text_lines_from_proposals(boxes, scores, im_w, im_h)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].iloc[0],
                "line_id": np.arange(len(avg), dtype=np.int32),
                "xmin": lines[:, 0],
                "ymin": lines[:, 1],
                "xmax": lines[:, 2],
                "ymax": lines[:, 3],
                "score": avg,
            }
        )

    return _spread_groups(proposals, "doc_id") \
        .groupBy("doc_id").applyInPandas(kernel, LINES_SCHEMA)
