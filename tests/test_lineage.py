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


def test_upsert_spans_bucket_scoped_merge(spark, tmp_path):
    """Iceberg-style MERGE emulation: corrections rewrite only the
    buckets containing corrected keys — untouched buckets' parquet
    files keep their exact bytes — and every touched bucket gains a
    fresh lineage row."""
    import glob
    import os

    from icdar_2019_rrc_sroie_spark.plans.lineage import upsert_spans

    out = str(tmp_path / "merge")
    t = transcripts_df(spark, n_convs=N_CONVS)
    before = _sorted_rows(run_with_resume(spark, t, out, SNAP, n_buckets=8))

    # pick two span keys from different rows to correct
    k1, k2 = before[0][:3], before[-1][:3]
    corrections = spark.createDataFrame(
        [(k1[0], k1[1], k1[2], "FIXED ONE"),
         (k2[0], k2[1], k2[2], "FIXED TWO")],
        "conv_id string, turn_idx int, label string, corrected string")

    def file_state():
        return {f: os.path.getmtime(f) for f in
                glob.glob(f"{out}/spans/snapshot_id={SNAP}/bucket=*/*.parquet")}

    pre_files = file_state()
    after = _sorted_rows(upsert_spans(spark, out, SNAP, corrections,
                                      n_buckets=8))

    # corrected rows changed, everything else byte-identical content
    want = sorted(
        (c, ti, lbl, "FIXED ONE" if (c, ti, lbl) == k1
         else "FIXED TWO" if (c, ti, lbl) == k2 else txt)
        for c, ti, lbl, txt in before)
    assert after == want

    # untouched buckets: same files, same mtimes (never rewritten)
    from icdar_2019_rrc_sroie_spark.plans.lineage import lineage_table
    lin = lineage_table(spark, out).toPandas()
    touched = set(lin[lin.duplicated("bucket", keep=False)].bucket)
    assert 1 <= len(touched) <= 2  # 2 corrections -> at most 2 buckets
    post_files = file_state()
    untouched_pre = {f: m for f, m in pre_files.items()
                     if not any(f"/bucket={b}/" in f for b in touched)}
    assert untouched_pre
    for f, m in untouched_pre.items():
        assert post_files.get(f) == m, f"untouched bucket rewritten: {f}"
    # lineage: one extra row per touched bucket, none for the rest
    counts = lin.groupby("bucket").size()
    for b in range(8):
        assert counts.get(b, 0) == (2 if b in touched else 1)


def test_compact_spans_rewrites_layout_not_content(spark, tmp_path):
    """rewrite_data_files analog: multi-file bucket partitions collapse
    to one file each, read-back content is identical, the appended
    lineage rows carry the SAME content_hash as the pre-compaction
    commit, and a second snapshot's files keep their exact bytes."""
    import glob
    import os

    from icdar_2019_rrc_sroie_spark.plans.lineage import compact_spans

    out = str(tmp_path / "cp")
    corpus_a = transcripts_df(spark, n_convs=N_CONVS, seed=42)
    corpus_b = transcripts_df(spark, n_convs=N_CONVS, seed=77)
    rows_a = _sorted_rows(run_with_resume(spark, corpus_a, out, "snapA",
                                          n_buckets=4))
    rows_b = _sorted_rows(run_with_resume(spark, corpus_b, out, "snapB",
                                          n_buckets=4))

    def bucket_files(snap):
        return {
            d: sorted(glob.glob(os.path.join(d, "*.parquet")))
            for d in glob.glob(os.path.join(
                out, "spans", f"snapshot_id={snap}", "bucket=*"))
        }

    before = bucket_files("snapA")
    assert any(len(fs) >= 2 for fs in before.values()), \
        "fixture too small: no multi-file bucket to compact"
    b_stat = {f: os.stat(f).st_mtime_ns
              for fs in bucket_files("snapB").values() for f in fs}
    pre_hash = {
        (r["bucket"]): r["content_hash"]
        for r in lineage_table(spark, out)
        .filter("snapshot_id = 'snapA'").collect()
    }

    n = compact_spans(spark, out, "snapA", min_files=2)
    assert n == sum(len(fs) >= 2 for fs in before.values())

    after = bucket_files("snapA")
    for d, fs in after.items():
        if len(before[d]) >= 2:
            assert len(fs) == 1, (d, fs)
    # content identical, other snapshot untouched bytes
    assert _sorted_rows(read_spans(spark, out, "snapA")) == rows_a
    assert _sorted_rows(read_spans(spark, out, "snapB")) == rows_b
    assert {f: os.stat(f).st_mtime_ns
            for fs in bucket_files("snapB").values() for f in fs} == b_stat
    # the compaction lineage rows prove no content change
    lin = lineage_table(spark, out).filter("snapshot_id = 'snapA'") \
        .toPandas().groupby("bucket").content_hash.nunique()
    assert (lin == 1).all(), lin
    # idempotent: nothing left to compact
    assert compact_spans(spark, out, "snapA", min_files=2) == 0


def test_upsert_spans_bucket_modulus_guard(spark, tmp_path):
    """Round-4 ADVICE: the store pins its bucket modulus in a meta
    table at first write; a MERGE with a mismatched n_buckets raises
    (a wrong modulus would hash corrections into the wrong buckets and
    silently skip them), an omitted one is derived from the meta."""
    import pytest

    from icdar_2019_rrc_sroie_spark.plans.lineage import (
        stored_n_buckets,
        upsert_spans,
    )

    out = str(tmp_path / "guard")
    t = transcripts_df(spark, n_convs=N_CONVS)
    before = _sorted_rows(run_with_resume(spark, t, out, SNAP, n_buckets=8))
    assert stored_n_buckets(spark, out) == 8

    k = before[0][:3]
    corrections = spark.createDataFrame(
        [(k[0], k[1], k[2], "FIXED")],
        "conv_id string, turn_idx int, label string, corrected string")
    with pytest.raises(ValueError, match="n_buckets=8"):
        upsert_spans(spark, out, SNAP, corrections, n_buckets=16)
    # n_buckets omitted -> derived from the meta table
    after = _sorted_rows(upsert_spans(spark, out, SNAP, corrections))
    assert ((k[0], k[1], k[2], "FIXED") in after
            and len(after) == len(before))
    # the staged copy (crash-safety for the bucket rewrite) is dropped
    # once the commit completes
    import os

    staging = os.path.join(out, "_staging")
    assert not os.path.exists(staging) or not os.listdir(staging)
    # resuming under a different modulus is refused too
    with pytest.raises(ValueError, match="refusing"):
        run_with_resume(spark, t, out, "snap2", n_buckets=4)


def test_staging_sweep_removes_stale_crash_leftovers(spark, tmp_path):
    """A successful MERGE sweeps the whole _staging parent — staging
    dirs orphaned by earlier crashes don't accumulate."""
    import os

    from icdar_2019_rrc_sroie_spark.plans.lineage import upsert_spans

    out = str(tmp_path / "sweep")
    t = transcripts_df(spark, n_convs=N_CONVS)
    before = _sorted_rows(run_with_resume(spark, t, out, SNAP, n_buckets=4))
    # plant a fake stale staging dir (as a crashed MERGE would leave)
    stale = os.path.join(out, "_staging", "deadbeef")
    os.makedirs(stale)
    open(os.path.join(stale, "part-0.parquet"), "w").write("x")

    k = before[0][:3]
    corrections = spark.createDataFrame(
        [(k[0], k[1], k[2], "SWEPT")],
        "conv_id string, turn_idx int, label string, corrected string")
    upsert_spans(spark, out, SNAP, corrections)
    assert not os.path.exists(os.path.join(out, "_staging"))
