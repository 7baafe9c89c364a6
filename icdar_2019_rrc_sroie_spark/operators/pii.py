"""PII detection/redaction for training-data curation (pure Catalyst).

The standard pre-training scrub pass: count and mask emails and phone
numbers before a corpus ships to a trainer. Both patterns are
lookahead-free so Java regex (Spark) and RE2 (DuckDB) agree token for
token — the ``text_quality_lang`` driver row value-checks counts AND
the redacted text against the SQL oracle.

At 100 TB this is a single whole-stage-codegen projection — no UDF, no
shuffle; the patterns are the operator, Catalyst is the executor.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Lookahead-free, anchored-nowhere patterns shared verbatim with the
#: SQL oracles (keep in sync with SQL_TEXT_QUALITY_LANG).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+?\d[\d\- ]{7,}\d"


def email_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(EMAIL_PATTERN))


def phone_count(text: Column) -> Column:
    """Counted on the email-redacted text so a digit-bearing email
    local part can never double-count as a phone."""
    return F.regexp_count(
        F.regexp_replace(text, EMAIL_PATTERN, "[EMAIL]"),
        F.lit(PHONE_PATTERN))


def redact_pii(text: Column) -> Column:
    """Emails first, then phones over the email-redacted text (same
    order as the counts — deterministic regardless of overlap)."""
    return F.regexp_replace(
        F.regexp_replace(text, EMAIL_PATTERN, "[EMAIL]"),
        PHONE_PATTERN, "[PHONE]")
