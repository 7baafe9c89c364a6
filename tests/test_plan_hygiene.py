"""Physical-plan checks: the properties that make the engine scale
(SURVEY.md §4) are asserted, not assumed."""

from pyspark.sql import functions as F

from icdar_2019_rrc_sroie_spark.fixtures import transcripts_df
from icdar_2019_rrc_sroie_spark.plans.extraction import extract_spans


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_flagship_single_skew_free_exchange(spark):
    """The batch flagship costs exactly one hash exchange, keyed by
    (conv_id, turn_idx) — fine-grained, so long conversations cannot
    concentrate on one task."""
    t = transcripts_df(spark, n_convs=64)
    plan = _formatted_plan(extract_spans(t))
    assert plan.count("ENSURE_REQUIREMENTS") == 1, plan
    assert "hashpartitioning(conv_id" in plan


def test_streaming_strategy_shuffle_free(spark):
    """The stateless strategy used under readStream has zero
    data-dependency shuffles."""
    from icdar_2019_rrc_sroie_spark.plans.extraction import (
        extract_spans_stateless,
    )

    t = transcripts_df(spark, n_convs=64)
    plan = _formatted_plan(extract_spans_stateless(t))
    assert plan.count("ENSURE_REQUIREMENTS") == 0, plan


def test_flagship_no_python_after_generation(spark):
    """Only the synthetic-corpus generator runs Python; the extraction
    itself is JVM-only (no BatchEvalPython / ArrowEvalPython nodes
    beyond the single mapInPandas source)."""
    t = transcripts_df(spark, n_convs=4)
    plan = _formatted_plan(extract_spans(t))
    # formatted explain prints each node twice (tree + detail block);
    # exactly one MapInPandas node == the generator only
    assert plan.count("MapInPandas") == 2
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_parquet_filter_pushdown(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    q = df.filter(F.col("l_orderkey") == 42).select("l_orderkey", "l_quantity")
    plan = _formatted_plan(q)
    assert "PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,42)]" in plan
    # column pruning: scan schema restricted to the two projected columns
    assert "l_extendedprice" not in plan


def test_broadcast_join_for_small_dim(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    supplier = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
    j = li.join(supplier, li.l_suppkey == supplier.s_suppkey) \
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
    plan = _formatted_plan(j)
    assert "BroadcastHashJoin" in plan
