"""Run-length span assembly + entity selection (W3, A10, F8) — single
shuffle.

Re-expresses the reference's ``convert_predictions_to_dict``
(keyword_information_extraction/data/postprocessing/entity_matching.py:
118-256) as ONE aggregation: classified line rows are grouped per turn
into a sorted struct array, then run segmentation (entity_matching.py:
143), per-entity best-run selection with the strictly-greater/earliest
rule (:146-163), date/total first-max-line vs company/address
space-join (:153-163), cleaning, fallback rules and null drop
(:165-254) all happen as Catalyst array algebra on that one row per
turn.

Scale rationale: turns are small (10-500 lines) so the collected array
is bounded; the plan has exactly one exchange — hash(conv_id, turn_idx)
— and the classifier chain upstream is evaluated exactly once (the
previous window/pivot/join formulation recomputed it three times).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..constants import LABELS_CLASSES
from .entities import (
    clean_address_expr,
    clean_company_expr,
    company_fallback_expr,
    date_fallback_from,
    total_fallback_from,
)

_TURN_KEYS = ("conv_id", "turn_idx")

_DATE = LABELS_CLASSES["date"]
_TOTAL = LABELS_CLASSES["total"]
_COMPANY = LABELS_CLASSES["company"]
_ADDRESS = LABELS_CLASSES["address"]
_NONE = LABELS_CLASSES["none"]


def _best_run(entity_cls: int, runs: Column) -> Column:
    """Winning run struct for one entity class (null if none).

    ``runs``: array<struct<cls,s,e,run_max>> in line order. The winner
    is the run with the strictly greatest max-probability (ties keep the
    earliest run — reference iterates runs in order and only replaces on
    ``>``, entity_matching.py:150-152)."""
    null_run = F.lit(None).cast(
        "struct<cls:int,s:int,e:int,run_max:double>"
    )
    return F.aggregate(
        F.filter(runs, lambda r: r["cls"] == entity_cls),
        null_run,
        lambda acc, r: F.when(
            acc.isNull() | (r["run_max"] > acc["run_max"]), r
        ).otherwise(acc),
    )


def _best_run_value(entity_cls: int, runs: Column, values: Column,
                    probs: Column) -> Column:
    """date/total winner: the precomputed value of the first line inside
    the winning run that reaches the run's max probability
    (probabilities.index(max, start, stop) — earliest wins)."""
    best = _best_run(entity_cls, runs)
    s, e, run_max = best["s"], best["e"], best["run_max"]
    idx = F.try_element_at(
        F.filter(
            F.sequence(s, e),
            lambda i: F.element_at(probs, i + 1) == run_max,
        ),
        F.lit(1),
    )
    value = F.element_at(values, idx + 1)
    return F.when(best.isNull(), F.lit("")).otherwise(
        F.coalesce(value, F.lit(""))
    )


def _best_run_joined(entity_cls: int, runs: Column, texts: Column) -> Column:
    """company/address winner: run lines joined with spaces
    (entity_matching.py:161-163)."""
    best = _best_run(entity_cls, runs)
    s, e = best["s"], best["e"]
    raw = F.array_join(F.slice(texts, s + 1, e - s + 1), " ")
    return F.when(best.isNull(), F.lit("")).otherwise(
        F.coalesce(raw, F.lit(""))
    )


def absorb_continuations(classes, texts, dates, totals):
    """Address-continuation absorption: a none-classified, non-empty
    line with no date/total signal directly following an address line
    is part of the address (receipts print addresses over 2-3 lines;
    the continuation half often has no street marker of its own —
    measured on the reference's committed submissions). Cascades, so
    any run of continuation lines is absorbed.

    Implemented as ONE left fold over an arrays_zip so each input
    column is referenced exactly once: in the stateless strategy the
    classes array is a large inline expression, and a formulation that
    references it k times k-plicates the whole tree after projection
    collapse (measured: the streaming micro-batch went from seconds to
    unbounded before this shape).
    """
    z = F.arrays_zip(
        classes.alias("c"), texts.alias("t"),
        dates.alias("d"), totals.alias("x"),
    )
    return F.aggregate(
        z,
        F.array().cast("array<int>"),
        lambda acc, e: F.concat(
            acc,
            F.array(
                F.when(
                    (e["c"] == _NONE)
                    & (F.try_element_at(acc, F.lit(-1)) == _ADDRESS)
                    & (e["d"] == "")
                    & (e["x"] == "")
                    & (F.trim(e["t"]) != ""),
                    F.lit(_ADDRESS),
                ).otherwise(e["c"]).cast("int")
            ),
        ),
    )


def turns_with_lines(classified: DataFrame) -> DataFrame:
    """One row per turn: sorted arrays of per-line features.

    Every regex-derived feature (date/total extraction, context flag)
    was computed once on the map side; the reduce side only rearranges
    arrays — no pattern matching after the shuffle except the per-turn
    RND note scan and the winner-line cleanups."""
    from .classify import prob_expr
    from .entities import total_context_expr

    grouped = classified.groupBy(*_TURN_KEYS).agg(
        F.array_sort(
            F.collect_list(
                # prob is a pure function of cls, and ctx_ok of text —
                # both recomputed after the shuffle (on the ~1% of turns
                # surviving the receipt gate below) instead of being
                # computed for every line on the map side and shipped
                # through the exchange
                F.struct("line_idx", "text", "cls",
                         "date_ex", "total_ex")
            )
        ).alias("L")
    )
    base = grouped.select(
        *_TURN_KEYS,
        F.transform("L", lambda x: x["text"]).alias("texts"),
        F.transform("L", lambda x: x["cls"]).alias("classes0"),
        F.transform("L", lambda x: x["date_ex"]).alias("dates"),
        F.transform("L", lambda x: x["total_ex"]).alias("totals"),
    )
    # Receipt pre-gate BEFORE the absorption fold (r7): absorption only
    # ever rewrites none→address, never creates or destroys a DATE or
    # TOTAL class, so array_contains(classes, DATE/TOTAL) is invariant
    # under it — gating on classes0 here is exactly the gate
    # spans_from_turns applies on the absorbed classes, moved below the
    # expensive interpreted fold so only receipt turns (~1%) pay for
    # absorption, probs and the ctx recompute.
    base = base.filter(
        F.array_contains(F.col("classes0"), _DATE)
        & F.array_contains(F.col("classes0"), _TOTAL))
    classes = absorb_continuations(
        F.col("classes0"), F.col("texts"), F.col("dates"), F.col("totals"))
    return base.withColumn(
        "ctxs",
        F.transform(F.col("texts"), lambda t: total_context_expr(t))) \
        .withColumn("classes", classes).drop("classes0") \
        .withColumn("probs",
                    F.transform(F.col("classes"), lambda c: prob_expr(c)))


def assemble_spans(classified: DataFrame) -> DataFrame:
    """classified line rows → spans (conv_id, turn_idx, label, text).

    Line-row entry point (task-3 CSV shape): one shuffle to regroup
    lines per turn, then the array-algebra assembly.
    """
    return spans_from_turns(turns_with_lines(classified))


def spans_from_turns(turns: DataFrame,
                     passthrough: tuple[str, ...] = ()) -> DataFrame:
    """Turn-array rows → spans (conv_id, turn_idx, label, text).

    ``turns`` carries per-turn arrays (texts, classes, probs, dates,
    totals, ctxs) in line order. Pure projection — callers that already
    have one row per turn (the transcripts flagship) get a
    shuffle-free plan. Only *receipt turns* (a date line AND a
    contextual total line present — the reference precondition) emit
    spans.
    """
    C, P, texts = F.col("classes"), F.col("probs"), F.col("texts")
    n = F.size(C)

    receipt = F.array_contains(C, _DATE) & F.array_contains(C, _TOTAL)
    turns = turns.filter(receipt)

    # run starts: i == 0 or class change (W3 gaps-and-islands, in-array)
    starts = F.filter(
        F.sequence(F.lit(0), n - 1),
        lambda i: (i == 0)
        | (F.element_at(C, i + 1) != F.element_at(C, i)),
    )
    m = F.size(starts)
    runs = F.transform(
        F.sequence(F.lit(0), m - 1),
        lambda j: F.struct(
            F.element_at(C, F.element_at(starts, j + 1) + 1).alias("cls"),
            F.element_at(starts, j + 1).alias("s"),
            F.when(
                j < m - 1, F.element_at(starts, j + 2) - 1
            ).otherwise(n - 1).alias("e"),
        ),
    )
    runs = F.transform(
        runs,
        lambda r: F.struct(
            r["cls"].alias("cls"),
            r["s"].alias("s"),
            r["e"].alias("e"),
            F.array_max(
                F.slice(P, r["s"] + 1, r["e"] - r["s"] + 1)
            ).alias("run_max"),
        ),
    )

    with_runs = turns.withColumn("runs", runs)
    R = F.col("runs")

    company_p = clean_company_expr(_best_run_joined(_COMPANY, R, texts))
    address_p = clean_address_expr(_best_run_joined(_ADDRESS, R, texts))
    date_p = _best_run_value(_DATE, R, F.col("dates"), F.col("probs"))
    total_p = _best_run_value(_TOTAL, R, F.col("totals"), F.col("probs"))

    company = F.when(company_p == "", company_fallback_expr(texts)).otherwise(company_p)
    date = F.when(date_p == "", date_fallback_from(F.col("dates"))).otherwise(date_p)
    total = F.when(
        total_p == "",
        total_fallback_from(F.col("totals"), F.col("ctxs"), texts),
    ).otherwise(total_p)

    resolved = with_runs.select(
        *_TURN_KEYS,
        *passthrough,
        company.alias("company"),
        date.alias("date"),
        address_p.alias("address"),
        total.alias("total"),
    )

    return resolved.select(
        *_TURN_KEYS,
        *passthrough,
        F.expr(
            "stack(4, 'company', company, 'date', date, "
            "'address', address, 'total', total) as (label, text)"
        ),
    ).filter(F.col("text") != "")
