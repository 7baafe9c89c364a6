"""Run-length span assembly + entity selection (W3, A10, F8).

Re-expresses the reference's ``convert_predictions_to_dict``
(keyword_information_extraction/data/postprocessing/entity_matching.py:
118-256) as relational algebra:

* run-length segmentation of the per-line class sequence
  (entity_matching.py:143) → gaps-and-islands window,
* per-entity best-run selection with earliest-run tie-break
  (entity_matching.py:146-163) → row_number over (prob desc, run asc),
* date/total keep the first max-probability line of the run, company/
  address join the run's lines with spaces (entity_matching.py:153-163),
* cleaning + fallback rules (entity_matching.py:165-244) → expressions
  from ``operators.entities``,
* null-entity drop (entity_matching.py:246-254) → filter.

Two shuffles total, both hash-partitioned on (conv_id, turn_idx); Catalyst
reuses the exchange between the window and the aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..constants import LABELS_CLASSES
from .entities import (
    clean_address_expr,
    clean_company_expr,
    company_fallback_expr,
    date_fallback_expr,
    extract_date_expr,
    extract_total_expr,
    total_fallback_expr,
)

_TURN_KEYS = ("conv_id", "turn_idx")


def segment_runs(classified: DataFrame) -> DataFrame:
    """Gaps-and-islands: contiguous same-class line groups → one row/run."""
    w = Window.partitionBy(*_TURN_KEYS).orderBy("line_idx")
    change = (
        F.lag("cls").over(w).isNull() | (F.col("cls") != F.lag("cls").over(w))
    ).cast("int")
    with_run = classified.withColumn(
        "run_id",
        F.sum(change).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return with_run.groupBy(*_TURN_KEYS, "run_id").agg(
        F.max("cls").alias("cls"),
        F.max("prob").alias("run_prob"),
        F.min("line_idx").alias("run_start"),
        # first line reaching the run's max probability (reference uses
        # probabilities.index(max, start, stop) — earliest wins)
        F.expr(
            "min_by(text, struct(-prob as neg_prob, line_idx as li))"
        ).alias("argmax_text"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_idx", "text"))),
                lambda s: s["text"],
            ),
            " ",
        ).alias("joined_text"),
    )


def best_entity_runs(runs: DataFrame) -> DataFrame:
    """Per (turn, entity): the run with max probability, earliest first."""
    w = Window.partitionBy(*_TURN_KEYS, "cls").orderBy(
        F.desc("run_prob"), F.asc("run_start")
    )
    date_cls = LABELS_CLASSES["date"]
    total_cls = LABELS_CLASSES["total"]
    raw = F.when(
        F.col("cls").isin(date_cls, total_cls), F.col("argmax_text")
    ).otherwise(F.col("joined_text"))
    return (
        runs.filter(F.col("cls") != LABELS_CLASSES["none"])
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(*_TURN_KEYS, "cls", raw.alias("raw_text"),
                F.col("run_prob").alias("score"))
    )


def assemble_spans(classified: DataFrame) -> DataFrame:
    """classified line rows → spans table (conv_id, turn_idx, label, text).

    ``classified`` needs columns (conv_id, turn_idx, line_idx, text, cls,
    prob). Only turns with at least one entity run emit spans (the
    reference precondition: every processed document is a receipt).
    """
    runs = segment_runs(classified)
    best = best_entity_runs(runs)

    wide = (
        best.groupBy(*_TURN_KEYS)
        .pivot("cls", [LABELS_CLASSES[k] for k in
                       ("company", "date", "address", "total")])
        .agg(F.first("raw_text"))
        .withColumnRenamed(str(LABELS_CLASSES["company"]), "raw_company")
        .withColumnRenamed(str(LABELS_CLASSES["date"]), "raw_date")
        .withColumnRenamed(str(LABELS_CLASSES["address"]), "raw_address")
        .withColumnRenamed(str(LABELS_CLASSES["total"]), "raw_total")
    )

    turn_lines = classified.groupBy(*_TURN_KEYS).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("line_idx", "text"))),
            lambda s: s["text"],
        ).alias("lines")
    )

    joined = wide.join(turn_lines, list(_TURN_KEYS))

    company_p = clean_company_expr(F.coalesce("raw_company", F.lit("")))
    address_p = clean_address_expr(F.coalesce("raw_address", F.lit("")))
    date_p = extract_date_expr(F.coalesce("raw_date", F.lit("")))
    total_p = extract_total_expr(F.coalesce("raw_total", F.lit("")))

    lines = F.col("lines")
    company = F.when(company_p == "", company_fallback_expr(lines)).otherwise(company_p)
    date = F.when(date_p == "", date_fallback_expr(lines)).otherwise(date_p)
    total = F.when(total_p == "", total_fallback_expr(lines)).otherwise(total_p)

    resolved = joined.select(
        *_TURN_KEYS,
        company.alias("company"),
        date.alias("date"),
        address_p.alias("address"),
        total.alias("total"),
    )

    spans = resolved.select(
        *_TURN_KEYS,
        F.expr(
            "stack(4, 'company', company, 'date', date, "
            "'address', address, 'total', total) as (label, text)"
        ),
    ).filter(F.col("text") != "")
    return spans
