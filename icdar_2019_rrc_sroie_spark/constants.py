"""Public constants of the extraction engine.

Regex patterns, vocabulary and geometry hyper-parameters mirror the
reference semantics (cited per constant); everything here is a plain
Python constant so it can be broadcast/embedded into Catalyst
expressions without any Python execution on the hot path.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Key-field extraction patterns
# (semantics of /root/reference/keyword_information_extraction/data/dataset/
#  constant_variables.py:1-17; kept Java-regex/RE2 compatible so the same
#  pattern string runs in Catalyst, DuckDB, and Python)
# ---------------------------------------------------------------------------

#: Substring pattern that disqualifies a line from being a company name.
#: The reference expresses this as a negative lookahead
#: (constant_variables.py:2); we keep the positive core so it can be used as
#: ``NOT rlike(...)`` — identical semantics, and RE2 (DuckDB) compatible.
UNWANTED_COMPANY_CORE = r"TAX|RECEIPT|INVOICE"

#: Numeric date, e.g. ``06/04/18``, ``2018-03-23`` (constant_variables.py:5).
DATE_PATTERN_1 = r"(\d{4}|\d{2}|\d)[-/.](\d{2}|\d)[-/.](\d{4}|\d{2}|\d)"

#: Month-name date, e.g. ``22 MAR 18`` (constant_variables.py:6).
DATE_PATTERN_2 = (
    r"(\d{4}|\d{2}|\d)[-/.]*\s*"
    r"(JAN|FEB|MAR|APR|MAY|JUN|JUL|AUG|SEP|OCT|NOV|DEC)"
    r"[-/.]*\s*(\d{4}|\d{2}|\d)"
)

#: Monetary amount, e.g. ``RM85.00``, ``$8.55`` (constant_variables.py:9).
TOTAL_PATTERN = r"(^[^\+\-]|([$\+\-]|[RM\s]))*((\d{3}|\d{2}|\d|\d\,\d{3})\.(\d{2}|\d))"

#: Context words that must precede a candidate total line
#: (generate_data.py:131, entity_matching.py:223).
TOTAL_CONTEXT_PATTERN = r"TOTAL|AMOUNT|DUE|AMT|ROUND|RND|RM|GST"

#: Context words that invalidate a lookback line (generate_data.py:142).
TOTAL_BLOCK_PATTERN = r"CASH|QTY|TAX|INVOICE"

#: Fallback-rule variants used at inference time (entity_matching.py:223-224).
TOTAL_INFER_CONTEXT_PATTERN = r"TOTAL|AMOUNT"
TOTAL_INFER_BLOCK_PATTERN = r"EX|SUB"

# ---------------------------------------------------------------------------
# Character vocabulary (constant_variables.py:14-17)
# ---------------------------------------------------------------------------

#: Ordered charset used for char-index encoding; index = 1-based position.
VOCAB = " !\"#$%&'()*+,-./0123456789:;<=>?@ABCDEFGHIJKLMNOPQRSTUVWXYZ[\\]^_`{|}~·"

#: Maximum encoded line length (constant_variables.py:17).
MAXIMUM_LENGTH = 68

# ---------------------------------------------------------------------------
# Entity label space (keyword_information_extraction/configs/defaults.py:45)
# ---------------------------------------------------------------------------

LABELS_CLASSES = {"none": 0, "company": 1, "date": 2, "address": 3, "total": 4}
CLASSES_LABELS = {v: k for k, v in LABELS_CLASSES.items()}
ENTITY_LABELS = ("company", "date", "address", "total")

# ---------------------------------------------------------------------------
# Detection geometry (text_localization/ctpn/configs/defaults.py:29-67)
# ---------------------------------------------------------------------------

ANCHOR_SHIFT = 16
FEAT_STRIDE = 16
ANCHOR_HEIGHTS = (11, 15, 22, 32, 45, 65, 93, 133, 190, 273)
IGNORE_LABEL = -1
POSITIVE_LABEL = 1
NEGATIVE_LABEL = 0
POSITIVE_JACCARD_OVERLAP = 0.5
NEGATIVE_JACCARD_OVERLAP = 0.3
MIN_SCORE = 0.9
NMS_THRESH = 0.3
MAX_HORIZONTAL_GAP = 20
MIN_V_OVERLAPS = 0.7
MIN_SIZE_SIM = 0.7

#: Reading-order vertical tolerance in pixels (utils/misc.py:115-132).
READING_ORDER_TOLERANCE = 14
