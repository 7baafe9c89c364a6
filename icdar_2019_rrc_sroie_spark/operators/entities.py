"""Key-field extraction as pure Catalyst expressions.

Column-expression re-implementations of the reference's task-3
post-processing (keyword_information_extraction/data/postprocessing/
entity_matching.py:11-256): clean_company (X4), clean_address (X5),
extract_date (X1), extract_total (X2), plus the fallback rules
(company-first-two-lines W5, date-scan, total-lookback W4) and the
rounding adjustment (X6).

Everything operates on *trimmed* line strings; no Python runs per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..constants import (
    DATE_PATTERN_1,
    DATE_PATTERN_2,
    TOTAL_INFER_BLOCK_PATTERN,
    TOTAL_INFER_CONTEXT_PATTERN,
    TOTAL_PATTERN,
    UNWANTED_COMPANY_CORE,
)

# --------------------------------------------------------------------------
# Scalar extraction / cleaning expressions (X1-X6)
# --------------------------------------------------------------------------


def extract_date_expr(text: Column) -> Column:
    """First DATE_PATTERN_1 match, else first DATE_PATTERN_2 match, else ''.

    Mirrors entity_matching.py:70-93 (two-pattern coalesce, group 0).
    A cheap ``\\d`` guard short-circuits lines that cannot match (both
    patterns require digits) before the backtracking-heavy alternation.
    """
    t = F.trim(text)
    m1 = F.regexp_extract(t, DATE_PATTERN_1, 0)
    m2 = F.regexp_extract(t, DATE_PATTERN_2, 0)
    matched = F.trim(F.when(m1 != "", m1).otherwise(m2))
    return F.when(t.rlike(r"\d"), matched).otherwise(F.lit(""))


def extract_total_expr(text: Column) -> Column:
    """First TOTAL_PATTERN match (entity_matching.py:96-115).

    Guarded by a linear ``\\d\\.\\d`` scan — a necessary condition for
    TOTAL_PATTERN's mandatory decimal — so the nested-quantifier prefix
    only ever backtracks on money-like lines.
    """
    t = F.trim(text)
    matched = F.trim(F.regexp_extract(t, TOTAL_PATTERN, 0))
    return F.when(t.rlike(r"\d\.\d"), matched).otherwise(F.lit(""))


def clean_company_expr(text: Column) -> Column:
    """Company-name cleanup (entity_matching.py:11-42).

    Order of attempts, each 'remove from the match position onward':
      1. whole line is ``digits…LETTERS`` → strips to '' (find yields 0),
      2. parenthesised registration code ``(A12345-X)…`` to end of line,
      3. trailing ``(LETTERS…`` group.
    Otherwise the trimmed line is returned unchanged.
    """
    t = F.trim(text)
    unwanted = t.rlike(UNWANTED_COMPANY_CORE)
    m1 = F.regexp_extract(t, r"^(\d+[^0-9]*[A-Z]+)$", 0)
    m2 = F.regexp_extract(t, r"\([A-Z]*\d+[^0-9]*[A-Z]+\).*$", 0)
    m3 = F.regexp_extract(t, r"\([A-Z\s]+[\)]*$", 0)

    def cut_before(match: Column) -> Column:
        pos = F.instr(t, F.trim(match))
        return F.trim(F.substring(t, F.lit(1), pos - 1))

    return (
        F.when(unwanted, F.lit(""))
        .when(m1 != "", cut_before(m1))
        .when(m2 != "", cut_before(m2))
        .when(m3 != "", cut_before(m3))
        .otherwise(t)
    )


def clean_address_expr(text: Column) -> Column:
    """Address cleanup (entity_matching.py:45-67): cut at 'TEL', strip a
    trailing phone-number-like token."""
    pos = F.instr(text, F.lit("TEL"))
    cut = F.when(pos > 0, F.substring(text, F.lit(1), pos - 1)).otherwise(text)
    return F.trim(F.regexp_replace(F.trim(cut), r"(\d+\-[^a-zA-Z]*)$", ""))


def is_number_expr(text: Column) -> Column:
    """All-digit check (utils/misc.py:53-64; empty string counts as number)."""
    return ~text.rlike(r"[^0-9]")


# --------------------------------------------------------------------------
# Fallback rules over the per-turn ``lines`` array (W4/W5)
# --------------------------------------------------------------------------


def company_fallback_expr(lines: Column) -> Column:
    """First-two-lines company rule (entity_matching.py:192-201).

    Take the first of lines 0-1 that has no unwanted word and is not a pure
    number; keep it verbatim if it starts with digits, else clean it.
    """

    def ok(line: Column) -> Column:
        return (~line.rlike(UNWANTED_COMPANY_CORE)) & (~is_number_expr(line))

    def value(line: Column) -> Column:
        return F.when(line.rlike(r"^\d+"), line).otherwise(
            clean_company_expr(line)
        )

    l0 = F.element_at(lines, 1)
    l1 = F.element_at(lines, 2)
    return (
        F.when((F.size(lines) >= 1) & ok(l0), value(l0))
        .when((F.size(lines) >= 2) & ok(l1), value(l1))
        .otherwise(F.lit(""))
    )


def total_context_expr(text: Column) -> Column:
    """Valid lookback-context line: has TOTAL|AMOUNT, lacks EX|SUB
    (entity_matching.py:223-225)."""
    t = F.trim(text)
    return t.rlike(TOTAL_INFER_CONTEXT_PATTERN) & ~t.rlike(
        TOTAL_INFER_BLOCK_PATTERN
    )


def date_fallback_expr(lines: Column) -> Column:
    """First line with an extractable date (entity_matching.py:205-210)."""
    return date_fallback_from(F.transform(lines, extract_date_expr))


def date_fallback_from(dates: Column) -> Column:
    """Same rule over precomputed per-line date extractions."""
    hits = F.filter(dates, lambda d: d != "")
    return F.coalesce(F.try_element_at(hits, F.lit(1)), F.lit(""))


def total_fallback_expr(lines: Column) -> Column:
    """Total lookback rule + rounding adjustment
    (entity_matching.py:215-244).

    Loop semantics flattened to array algebra: the accepted total is the
    first line i with an extractable amount such that some line j in
    [1, i] (0-based, line 0 excluded) matches TOTAL|AMOUNT and does not
    contain EX|SUB. If a ``RND/ROUNDING`` note exists anywhere in the
    concatenated text and the amount has no 'RM', the rounding value is
    added numerically.
    """
    totals = F.transform(lines, extract_total_expr)
    ctx = F.transform(lines, total_context_expr)
    return total_fallback_from(totals, ctx, lines)


def total_fallback_from(totals: Column, ctx: Column,
                        lines: Column) -> Column:
    """Same rule over precomputed per-line totals and context flags —
    the shuffle-side path recomputes no regex except the per-turn
    RND/ROUNDING scan."""
    n = F.size(lines)
    idx = F.sequence(F.lit(0), n - 1)
    # first 0-based index j >= 1 whose line carries valid context
    ctx_hits = F.filter(idx, lambda j: (j >= 1) & F.element_at(ctx, j + 1))
    p0 = F.try_element_at(ctx_hits, F.lit(1))  # null when no context line
    tot_hits = F.filter(
        idx,
        lambda i: (F.element_at(totals, i + 1) != "") & (i >= p0),
    )
    i_star = F.try_element_at(tot_hits, F.lit(1))
    raw = F.when(
        i_star.isNotNull(), F.element_at(totals, i_star + 1)
    ).otherwise(F.lit(""))

    # Rounding adjustment over the separator-less text space
    # (entity_matching.py:167-171,230-244).
    text_space = F.trim(F.array_join(lines, ""))
    rnd_note = F.when(
        text_space.rlike("RND|ROUNDING"),
        F.regexp_extract(text_space, r"(RND|ROUNDING).*(\d+.\d+)", 0),
    ).otherwise(F.lit(""))
    rnd_val = F.trim(F.regexp_extract(rnd_note, TOTAL_PATTERN, 0))
    total_num = raw.cast("double")
    rnd_num = rnd_val.cast("double")
    adjusted = F.when(
        (raw != "")
        & (rnd_note != "")
        & (rnd_val != "")
        & ~F.contains(raw, F.lit("RM"))
        & total_num.isNotNull()
        & rnd_num.isNotNull(),
        (total_num + rnd_num).cast("string"),
    ).otherwise(raw)
    return adjusted
