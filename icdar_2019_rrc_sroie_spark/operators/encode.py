"""Char-index encoding (F10) as a pure column expression.

The reference upper-cases each line, truncates to MAXIMUM_LENGTH=68 and
maps every character to its index in VOCAB
(keyword_information_extraction/data/dataset/sroie2019.py:136-166,
constant_variables.py:14-17). Here: ``locate`` gives the 1-based vocab
position (0 = unknown/padding), producing a fixed-length int array —
Catalyst only, feeding the classifier's Arrow batches without any
Python preprocessing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..constants import MAXIMUM_LENGTH, VOCAB


def encode_chars(text: Column, max_length: int = MAXIMUM_LENGTH) -> Column:
    """Text → int array of length ``max_length`` (vocab indices, 0-pad)."""
    truncated = F.substring(F.upper(text), 1, max_length)
    chars = F.split(truncated, "")
    indices = F.transform(chars, lambda c: F.instr(F.lit(VOCAB), c))
    padding = F.array_repeat(
        F.lit(0), (F.lit(max_length) - F.size(indices)).cast("int")
    )
    return F.concat(indices, padding)
