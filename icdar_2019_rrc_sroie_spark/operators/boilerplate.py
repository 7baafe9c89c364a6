"""Boilerplate stripping — the HTML/layout-parse stage (north_rule).

Pure Catalyst column expressions: tag removal, margin trim, header/footer
drop, blank-line drop. Analog of the reference's crop-preprocess +
empty-region filters (functional/utils/box.py:102-134 F3,
functional/data/preprocessing/split_labels.py:71-136 X20) re-expressed for
text payloads. No Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Non-content containers whose *inner text* is also boilerplate.
CONTAINER_PATTERN = r"(?is)<(head|script|style)\b.*?</\1>"

#: HTML-ish markup to remove entirely.
TAG_PATTERN = r"<[^>]*>"

#: Header/footer chrome lines, e.g. ``== SESSION conv_000001 TURN 3 ==``.
CHROME_PATTERN = r"^==.*==$"


def strip_tags(text: Column) -> Column:
    """Remove non-content containers (with their text) then markup tags."""
    return F.regexp_replace(
        F.regexp_replace(text, CONTAINER_PATTERN, ""), TAG_PATTERN, ""
    )


def to_clean_lines(text: Column) -> Column:
    """Payload → array of trimmed, non-empty, non-chrome lines.

    This is the whole boilerplate-strip stage as one expression tree —
    Catalyst fuses it into a single whole-stage-codegen projection.
    """
    lines = F.split(strip_tags(text), "\n")
    trimmed = F.transform(lines, lambda l: F.trim(l))
    return F.filter(
        trimmed,
        lambda l: (F.length(l) > 0) & (~l.rlike(CHROME_PATTERN)),
    )


def clean_text(text: Column) -> Column:
    """Fully stripped payload re-joined with newlines (main content)."""
    return F.array_join(to_clean_lines(text), "\n")


#: Main-content container (DOM heuristic): prefer the inner text of the
#: first ``<div class="content">…</div>`` block when present.
MAIN_CONTENT_PATTERN = r'(?is)<div class="content">(.*?)</div>'


def main_content(text: Column) -> Column:
    """DOM-heuristic main-content selection: extract the content
    container if the document has one, else fall back to the whole
    payload. Pure Catalyst; runs before tag stripping."""
    inner = F.regexp_extract(text, MAIN_CONTENT_PATTERN, 1)
    return F.when(inner != "", inner).otherwise(text)


def dehyphenate(text: Column) -> Column:
    """Rejoin words split by a line-break hyphen (PDF-layout artifact):
    ``exam-\\nple`` → ``example``."""
    return F.regexp_replace(text, r"(\w)-\n\s*(\w)", r"$1$2")


def collapse_whitespace(text: Column) -> Column:
    """Collapse runs of spaces/tabs (not newlines) to one space."""
    return F.regexp_replace(text, r"[ \t]+", " ")
