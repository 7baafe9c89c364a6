"""Deterministic span classifier — the CharLM stand-in (U3).

The reference classifies each OCR line with a character-level LM
(keyword_information_extraction/model/charlm/architecture.py:118-170) and
returns per-line ``(class, prob)``. This engine keeps the exact same I/O
contract but scores lines with deterministic regex/keyword features so
results are reproducible without model weights — and the whole scorer is a
Catalyst expression tree (no Python per row), so it runs inside
whole-stage codegen.

Class ids follow LABELS_CLASSES (kie/configs/defaults.py:45):
none=0 company=1 date=2 address=3 total=4.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..constants import (
    LABELS_CLASSES,
    TOTAL_CONTEXT_PATTERN,
    UNWANTED_COMPANY_CORE,
)
from .entities import extract_date_expr, extract_total_expr, is_number_expr

#: Deterministic confidences per class (fixed, so runs are reproducible).
CLASS_PROBS = {"company": 0.85, "date": 0.95, "address": 0.75, "total": 0.90}


def classify_lines(lines_df: DataFrame,
                   text_col: str = "text",
                   line_idx_col: str = "line_idx") -> DataFrame:
    """Attach ``cls`` (int) and ``prob`` (double) to each line row.

    ``lines_df`` must carry (conv_id, turn_idx, line_idx, text). A turn is
    only eligible for entity classes when it *looks like a receipt* (has
    both a money line with context and an extractable date) — the reference
    only ever sees receipts, this gate reproduces that precondition on
    mixed transcript data.
    """
    t = F.trim(F.col(text_col))
    is_date = extract_date_expr(t) != ""
    is_total = (extract_total_expr(t) != "") & t.rlike(TOTAL_CONTEXT_PATTERN)
    is_address = (~is_date) & t.rlike(r"\d{5}") & F.contains(t, F.lit(","))
    is_company = (
        (F.col(line_idx_col) == 0)
        & ~t.rlike(UNWANTED_COMPANY_CORE)
        & ~is_number_expr(t)
    )

    turn = Window.partitionBy("conv_id", "turn_idx")
    receipt_turn = (
        (F.max(is_total.cast("int")).over(turn) == 1)
        & (F.max(is_date.cast("int")).over(turn) == 1)
    )

    cls = (
        F.when(~receipt_turn, F.lit(LABELS_CLASSES["none"]))
        .when(is_date, F.lit(LABELS_CLASSES["date"]))
        .when(is_total, F.lit(LABELS_CLASSES["total"]))
        .when(is_address, F.lit(LABELS_CLASSES["address"]))
        .when(is_company, F.lit(LABELS_CLASSES["company"]))
        .otherwise(F.lit(LABELS_CLASSES["none"]))
    )
    prob_expr: Column = (
        F.when(cls == LABELS_CLASSES["date"], F.lit(CLASS_PROBS["date"]))
        .when(cls == LABELS_CLASSES["total"], F.lit(CLASS_PROBS["total"]))
        .when(cls == LABELS_CLASSES["address"], F.lit(CLASS_PROBS["address"]))
        .when(cls == LABELS_CLASSES["company"], F.lit(CLASS_PROBS["company"]))
        .otherwise(F.lit(0.99))
    )
    return lines_df.withColumn("cls", cls).withColumn("prob", prob_expr)
