"""Determinism + kill/resume tests for the lineage-checkpointed write
path (SURVEY.md §5.4, north rule: exact resume from checkpoint)."""

from icdar_2019_rrc_sroie_spark.fixtures import transcripts_df
from icdar_2019_rrc_sroie_spark.plans.lineage import (
    committed_buckets,
    lineage_table,
    read_spans,
    run_with_resume,
)

N_CONVS = 24
SNAP = "seed42-n24"


def _sorted_rows(df):
    return sorted(map(tuple, df.select(
        "conv_id", "turn_idx", "label", "text").collect()))


def test_full_run_then_reread(spark, tmp_path):
    out = str(tmp_path / "out")
    t = transcripts_df(spark, n_convs=N_CONVS)
    result = run_with_resume(spark, t, out, SNAP, n_buckets=8)
    rows = _sorted_rows(result)
    assert len(rows) > 0
    assert rows == _sorted_rows(read_spans(spark, out, SNAP))
    lin = lineage_table(spark, out).toPandas()
    assert set(lin.bucket) == set(range(8))
    assert lin.span_count.sum() == len(rows)


def test_kill_and_resume_identical(spark, tmp_path):
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    t = transcripts_df(spark, n_convs=N_CONVS)

    # uninterrupted reference run
    full = _sorted_rows(run_with_resume(spark, t, out_a, SNAP, n_buckets=8))

    # killed run: one bucket per commit, die after 3 commits
    run_with_resume(spark, t, out_b, SNAP, n_buckets=8,
                    buckets_per_commit=1, max_commits=3)
    done = committed_buckets(spark, out_b, SNAP)
    assert len(done) == 3

    # resume finishes the remaining buckets; result identical
    resumed = _sorted_rows(
        run_with_resume(spark, t, out_b, SNAP, n_buckets=8))
    assert committed_buckets(spark, out_b, SNAP) == set(range(8))
    assert resumed == full

    # a second resume is a no-op with identical content
    again = _sorted_rows(run_with_resume(spark, t, out_b, SNAP, n_buckets=8))
    assert again == full


def test_lineage_isolates_snapshots(spark, tmp_path):
    out = str(tmp_path / "snap")
    t = transcripts_df(spark, n_convs=N_CONVS)
    run_with_resume(spark, t, out, "snapA", n_buckets=4)
    assert committed_buckets(spark, out, "snapB") == set()


def test_lineage_f1_column(spark, tmp_path):
    from icdar_2019_rrc_sroie_spark.fixtures import gt_entities_df

    out = str(tmp_path / "f1")
    t = transcripts_df(spark, n_convs=N_CONVS)
    gt = gt_entities_df(spark, n_convs=N_CONVS)
    run_with_resume(spark, t, out, SNAP, n_buckets=4, gt_entities=gt)
    lin = lineage_table(spark, out).toPandas()
    populated = lin[lin.span_count > 0]
    assert (populated.f1 == 1.0).all()  # golden fixture extracts exactly


def test_snapshot_time_travel(spark, tmp_path):
    """Two INPUT snapshots written to the same out_dir must stay
    readable independently: snapshot B's commit must not overwrite
    snapshot A's span files (round-2 layout partitioned only by bucket,
    so a second snapshot's dynamic overwrite clobbered the first), and
    a resume of A after B commits is a no-op that returns A's exact
    content."""
    out = str(tmp_path / "tt")
    corpus_a = transcripts_df(spark, n_convs=N_CONVS, seed=42)
    corpus_b = transcripts_df(spark, n_convs=N_CONVS + 8, seed=77)

    rows_a = _sorted_rows(run_with_resume(spark, corpus_a, out, "snapA",
                                          n_buckets=4))
    rows_b = _sorted_rows(run_with_resume(spark, corpus_b, out, "snapB",
                                          n_buckets=4))
    assert rows_a and rows_b and rows_a != rows_b

    # time travel: each snapshot reads back exactly its own content
    assert _sorted_rows(read_spans(spark, out, "snapA")) == rows_a
    assert _sorted_rows(read_spans(spark, out, "snapB")) == rows_b

    # resume of A after B committed: fully committed -> no recompute,
    # and still A's content (not B's)
    again = run_with_resume(spark, corpus_a, out, "snapA", n_buckets=4)
    assert _sorted_rows(again) == rows_a

    # lineage rows are snapshot-scoped
    lin = lineage_table(spark, out).toPandas()
    assert set(lin.snapshot_id) == {"snapA", "snapB"}
    per_snap = lin.groupby("snapshot_id").span_count.sum()
    assert per_snap["snapA"] == len(rows_a)
    assert per_snap["snapB"] == len(rows_b)
