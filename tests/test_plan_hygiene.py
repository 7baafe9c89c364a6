"""Physical-plan checks: the properties that make the engine scale
(SURVEY.md §4) are asserted, not assumed."""

from pyspark.sql import functions as F

from icdar_2019_rrc_sroie_spark.fixtures import transcripts_df
from icdar_2019_rrc_sroie_spark.plans.extraction import extract_spans


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_flagship_shuffle_free(spark):
    """The flagship pipeline is a pure projection: zero data-dependency
    shuffles (the generator's own repartition is a REPARTITION_BY_NUM
    round-robin, not an ENSURE_REQUIREMENTS exchange)."""
    t = transcripts_df(spark, n_convs=64)
    plan = _formatted_plan(extract_spans(t))
    assert plan.count("ENSURE_REQUIREMENTS") == 0, plan


def test_line_row_path_single_exchange(spark):
    """The already-exploded (CSV-shape) entry point costs exactly one
    hash exchange on (conv_id, turn_idx)."""
    from icdar_2019_rrc_sroie_spark.operators.classify import classify_lines
    from icdar_2019_rrc_sroie_spark.operators.spans import assemble_spans
    from icdar_2019_rrc_sroie_spark.plans.extraction import turn_lines

    t = transcripts_df(spark, n_convs=64)
    spans = assemble_spans(classify_lines(turn_lines(t)))
    plan = _formatted_plan(spans)
    assert plan.count("ENSURE_REQUIREMENTS") == 1, plan
    assert "hashpartitioning(conv_id" in plan


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
