"""Skew-defusing aggregation (north rule: long-conversation skew).

The fixture corpus embeds conversations 10-100× longer than the median
(fixtures.py:n_turns_for). Per-conversation aggregations (span counts,
conversation stats) would put an entire hot conversation into one
reduce task; ``salted_agg`` runs the classic two-phase plan instead:

  phase 1: groupBy(key, salt)  — hot keys split across `n_salts` tasks
  phase 2: groupBy(key)        — combine tiny partials

Only algebraic aggregates (sum/count/min/max) are offered — exactly the
set that composes across salt shards. On top of this, AQE skew-join
splitting stays enabled engine-wide (session.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16,
              salt_col: str = "_salt") -> DataFrame:
    """Deterministic row salt (hash of all columns, not a RNG — keeps
    reruns identical for the resume/lineage path)."""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).cast("int"),
    )


def salted_count(df: DataFrame, key: str | Column,
                 n_salts: int = 16) -> DataFrame:
    """count() per key via two-phase salted aggregation."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(key, "_salt").agg(
        F.count(F.lit(1)).alias("_partial")
    )
    return partial.groupBy(key).agg(
        F.sum("_partial").cast("long").alias("n")
    )


def salted_sum(df: DataFrame, key: str | Column, value: str,
               n_salts: int = 16) -> DataFrame:
    """sum(value) per key via two-phase salted aggregation."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(key, "_salt").agg(
        F.sum(value).alias("_partial"), F.count(F.lit(1)).alias("_n")
    )
    return partial.groupBy(key).agg(
        F.sum("_partial").alias("total"),
        F.sum("_n").cast("long").alias("n"),
    )
