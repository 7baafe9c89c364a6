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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..constants import (
    LABELS_CLASSES,
    TOTAL_CONTEXT_PATTERN,
    UNWANTED_COMPANY_CORE,
)
from .entities import (
    extract_date_expr,
    extract_total_expr,
    is_number_expr,
    total_context_expr,
)

#: Deterministic confidences per class (fixed, so runs are reproducible).
CLASS_PROBS = {"company": 0.85, "date": 0.95, "address": 0.75, "total": 0.90}


def classify_lines(lines_df: DataFrame,
                   text_col: str = "text",
                   line_idx_col: str = "line_idx") -> DataFrame:
    """Attach ``cls`` (int) and ``prob`` (double) to each line row.

    ``lines_df`` must carry (conv_id, turn_idx, line_idx, text). Pure
    per-line features — no shuffle. The receipt-turn gate (the reference
    precondition that every processed document IS a receipt) is applied
    later in span assembly, on the already-grouped turn, so this stage
    stays embarrassingly parallel and fuses into the scan.
    """
    t = F.trim(F.col(text_col))
    with_features = lines_df.select(
        "*",
        extract_date_expr(t).alias("date_ex"),
        extract_total_expr(t).alias("total_ex"),
        total_context_expr(t).alias("ctx_ok"),
    )
    cls = class_expr(t, F.col(line_idx_col),
                     F.col("date_ex"), F.col("total_ex"))
    return with_features.withColumn("cls", cls) \
        .withColumn("prob", prob_expr(cls))


def class_expr(t: Column, line_idx: Column,
               date_ex: Column, total_ex: Column) -> Column:
    """Class id from precomputed date/total extractions (shared by the
    line-row path and the no-shuffle turn-array path)."""
    is_date = date_ex != ""
    is_total = (total_ex != "") & t.rlike(TOTAL_CONTEXT_PATTERN)
    # Address evidence calibrated on the reference's 347 committed
    # submissions (submission/submit/*.txt): a street marker plus a
    # comma or 5-digit postcode, comma+postcode, two street markers, or
    # postcode+state. Checked BEFORE date: unit numbers like 'LOT 1-0-2'
    # match the date pattern, but a street-marker line is an address,
    # never a date.
    marker = t.rlike(r"JALAN|JLN|LRG|LOT |NO ?\.? ?\d")
    comma = F.contains(t, F.lit(","))
    postcode = t.rlike(r"\d{5}")
    state = t.rlike(r"SELANGOR|JOHOR|MELAKA|PULAU|PERAK|KEDAH|KUALA")
    venue = t.rlike(r"FLR|FLOOR|MALL|PLAZA|LEVEL")
    # r7: same truth table as the original
    #   (marker & (comma|postcode)) | (comma & postcode) | (comma & venue)
    #   | rlike(LOT.*JALAN) | (postcode & state)
    # re-grouped so the two cheap tests (a contains and the \d{5} scan)
    # short-circuit the marker/state/venue regexes away on the chat
    # majority: expanding both forms gives the identical minterm set
    # {marker·comma, marker·postcode, comma·postcode, comma·venue,
    #  postcode·state, LOT.*JALAN}.
    is_address = (
        (comma & (marker | postcode | venue))
        | (postcode & (marker | state))
        | t.rlike(r"(LOT |NO ?\.? ?\d).*(JALAN|JLN)")
    )
    is_company = (
        (line_idx == 0)
        & ~t.rlike(UNWANTED_COMPANY_CORE)
        & ~is_number_expr(t)
    )
    return (
        F.when(is_address, F.lit(LABELS_CLASSES["address"]))
        .when(is_date, F.lit(LABELS_CLASSES["date"]))
        .when(is_total, F.lit(LABELS_CLASSES["total"]))
        .when(is_company, F.lit(LABELS_CLASSES["company"]))
        .otherwise(F.lit(LABELS_CLASSES["none"]))
    )


def prob_expr(cls: Column) -> Column:
    """Deterministic confidence for a class id."""
    return (
        F.when(cls == LABELS_CLASSES["date"], F.lit(CLASS_PROBS["date"]))
        .when(cls == LABELS_CLASSES["total"], F.lit(CLASS_PROBS["total"]))
        .when(cls == LABELS_CLASSES["address"], F.lit(CLASS_PROBS["address"]))
        .when(cls == LABELS_CLASSES["company"], F.lit(CLASS_PROBS["company"]))
        .otherwise(F.lit(0.99))
    )
