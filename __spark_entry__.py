"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction pipeline (SURVEY.md §3.2 recast)
on a deterministic synthetic transcripts table of the exact
``input_hint`` shape. ``queries``/``oracle_sql`` expose the operator
battery from SURVEY.md §2 for the DuckDB cross-check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from icdar_2019_rrc_sroie_spark import queries as q
from icdar_2019_rrc_sroie_spark.fixtures import transcripts_df
from icdar_2019_rrc_sroie_spark.plans.extraction import extract_spans, ordered_spans


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthetic transcripts → boilerplate strip → span
    classification → entity rules → spans table."""
    transcripts = transcripts_df(spark, n_convs=60, seed=42)
    return ordered_spans(extract_spans(transcripts))


def _transcript_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship pipeline as a queries() entry (rows-only check: the
    transcripts input is synthesized, not one of the DuckDB views)."""
    transcripts = transcripts_df(spark, n_convs=60, seed=42)
    return ordered_spans(extract_spans(transcripts))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = dict(q.queries())
    out["transcript_spans"] = _transcript_spans
    return out


def oracle_sql() -> dict[str, str]:
    return dict(q.oracle_sql())
