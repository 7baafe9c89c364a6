"""Checkpoint-resumable spans writes with per-partition lineage.

North-rule semantics (the reference's checkpoint/resume analog —
functional/saving/checkpoint.py:22-63, README.md:39-40 "resume exactly
from the checkpoint"): the corpus is bucketed by ``conv_id``; each
committed bucket writes one lineage row ``(snapshot_id, bucket,
span_count, content_hash)``. A restart recomputes only buckets missing
from the lineage table for the same input snapshot. Bucket data is
written with dynamic partition overwrite, so a crash between data write
and lineage commit is repaired by simply rerunning — no duplicates.

On Iceberg the same structure maps to snapshot ids + partition-level
commits; here it is expressed over plain parquet so the sandbox can
execute it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extraction import extract_spans

LINEAGE_COLS = ("snapshot_id", "bucket", "span_count", "content_hash", "f1")


def with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
    )


def _lineage_path(out_dir: str) -> str:
    return os.path.join(out_dir, "lineage")


def _spans_path(out_dir: str) -> str:
    return os.path.join(out_dir, "spans")


def _meta_path(out_dir: str) -> str:
    return os.path.join(out_dir, "meta")


def stored_n_buckets(spark: SparkSession, out_dir: str) -> int | None:
    """The bucket modulus this store was written with (recorded by
    ``run_with_resume``), or None for a store that predates the meta
    table."""
    try:
        return int(spark.read.parquet(_meta_path(out_dir))
                   .collect()[0]["n_buckets"])
    except Exception:  # noqa: BLE001 — no meta yet
        return None


def _record_n_buckets(spark: SparkSession, out_dir: str,
                      n_buckets: int) -> None:
    """Pin the store's bucket modulus on first write; later writers
    (resume, MERGE, compaction) must agree — a mismatched modulus
    computes touched-bucket sets under the wrong hash and silently
    skips corrections (round-3 ADVICE finding)."""
    stored = stored_n_buckets(spark, out_dir)
    if stored is None:
        spark.createDataFrame([(int(n_buckets),)], "n_buckets int") \
            .write.mode("overwrite").parquet(_meta_path(out_dir))
    elif stored != n_buckets:
        raise ValueError(
            f"store {out_dir} was written with n_buckets={stored}, "
            f"got {n_buckets}: refusing a mismatched bucket modulus")


def _resolve_n_buckets(spark: SparkSession, out_dir: str,
                       n_buckets: int | None) -> int:
    stored = stored_n_buckets(spark, out_dir)
    if stored is None:
        if n_buckets is None:
            raise ValueError(
                f"store {out_dir} has no bucket-modulus meta and no "
                "n_buckets was passed")
        return n_buckets
    if n_buckets is not None and n_buckets != stored:
        raise ValueError(
            f"store {out_dir} was written with n_buckets={stored}, "
            f"got {n_buckets}: refusing a mismatched bucket modulus")
    return stored


def _delete_dir(spark: SparkSession, path: str) -> None:
    from ..operators.indexes import _delete_path

    _delete_path(spark, path)


def committed_buckets(spark: SparkSession, out_dir: str,
                      snapshot_id: str) -> set[int]:
    path = _lineage_path(out_dir)
    try:
        lineage = spark.read.parquet(path)
    except Exception:  # noqa: BLE001 — first run, no lineage yet
        return set()
    return {
        r["bucket"]
        for r in lineage.filter(F.col("snapshot_id") == snapshot_id)
        .select("bucket").distinct().collect()
    }


def _content_hash(spans: DataFrame):
    """Order-independent content hash of a span set (exactness proof)."""
    row_hash = F.xxhash64(
        F.concat_ws("\x1f", "conv_id", "turn_idx", "label", "text")
    )
    return F.bit_xor(row_hash)


def _bucket_f1(spans_b: DataFrame, gt_entities: DataFrame,
               n_buckets: int) -> DataFrame:
    """Per-bucket extraction F1 vs ground truth (north-star lineage
    metric): exact-match TP joins, all keyed by the same bucketing."""
    from ..eval.extraction_f1 import gt_spans

    gt_b = with_bucket(gt_spans(gt_entities), n_buckets)
    expected = gt_b.groupBy("bucket").agg(F.count(F.lit(1)).alias("expected"))
    extracted = spans_b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("extracted"))
    tp = (
        spans_b.join(gt_b, ["bucket", "conv_id", "turn_idx", "label", "text"])
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("tp"))
    )
    joined = (
        expected.join(extracted, "bucket", "full").join(tp, "bucket", "full")
        .fillna(0, ["expected", "extracted", "tp"])
    )
    p = F.when(F.col("extracted") > 0, F.col("tp") / F.col("extracted")).otherwise(0.0)
    r = F.when(F.col("expected") > 0, F.col("tp") / F.col("expected")).otherwise(0.0)
    f1 = F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(0.0)
    return joined.select("bucket", f1.alias("f1"))


def run_with_resume(spark: SparkSession, transcripts: DataFrame,
                    out_dir: str, snapshot_id: str,
                    n_buckets: int = 16,
                    buckets_per_commit: int | None = None,
                    max_commits: int | None = None,
                    gt_entities: DataFrame | None = None) -> DataFrame:
    """Extract spans for all uncommitted buckets, committing lineage per
    chunk. ``buckets_per_commit=None`` commits everything in one job
    (fast path). ``max_commits`` bounds the number of chunk commits per
    invocation (bounded-work runs; also simulates a kill mid-job).
    When ``gt_entities`` is given, each lineage row carries the
    bucket's extraction F1 vs that reference (north-star metric)."""
    _record_n_buckets(spark, out_dir, n_buckets)
    done = committed_buckets(spark, out_dir, snapshot_id)
    todo = sorted(set(range(n_buckets)) - done)
    if todo:
        chunk = len(todo) if buckets_per_commit is None else buckets_per_commit
        bucketed = with_bucket(transcripts, n_buckets)
        commits = 0
        for i in range(0, len(todo), chunk):
            if max_commits is not None and commits >= max_commits:
                break
            commits += 1
            batch = todo[i:i + chunk]
            part = bucketed.filter(F.col("bucket").isin([int(b) for b in batch]))
            spans = with_bucket(extract_spans(part.drop("bucket")), n_buckets)
            spans.persist()
            # partition by (snapshot_id, bucket): dynamic overwrite then
            # only ever replaces THIS snapshot's partitions — another
            # snapshot's committed spans stay byte-identical (snapshot
            # time-travel, pinned by test_snapshot_time_travel)
            # per-write dynamic overwrite (NOT a session conf — a
            # session-global setting would silently change later
            # unrelated static overwrites, round-3 ADVICE finding)
            spans.withColumn("snapshot_id", F.lit(snapshot_id)) \
                .write.mode("overwrite") \
                .option("partitionOverwriteMode", "dynamic") \
                .partitionBy("snapshot_id", "bucket") \
                .parquet(_spans_path(out_dir))
            lineage = spans.groupBy("bucket").agg(
                F.count(F.lit(1)).cast("long").alias("span_count"),
                _content_hash(spans).alias("content_hash"),
            )
            if gt_entities is not None:
                f1s = _bucket_f1(spans, gt_entities, n_buckets)
                lineage = lineage.join(f1s, "bucket", "left")
            else:
                lineage = lineage.withColumn("f1", F.lit(None).cast("double"))
            lineage = lineage.withColumn(
                "snapshot_id", F.lit(snapshot_id)
            ).select(*LINEAGE_COLS)
            # buckets with zero spans still need a lineage row
            present = {r["bucket"] for r in lineage.select("bucket").collect()}
            missing = [b for b in batch if b not in present]
            if missing:
                empty = spark.createDataFrame(
                    [(snapshot_id, int(b), 0, 0, None) for b in missing],
                    "snapshot_id string, bucket int, span_count long,"
                    " content_hash long, f1 double",
                )
                lineage = lineage.unionByName(empty)
            lineage.write.mode("append").parquet(_lineage_path(out_dir))
            spans.unpersist()
    return read_spans(spark, out_dir, snapshot_id)


def read_spans(spark: SparkSession, out_dir: str,
               snapshot_id: str) -> DataFrame:
    """Committed spans of ONE snapshot (snapshot partition filter —
    pruned at scan time — joined against its lineage table)."""
    spans = spark.read.parquet(_spans_path(out_dir)) \
        .filter(F.col("snapshot_id") == snapshot_id)
    lineage = (
        spark.read.parquet(_lineage_path(out_dir))
        .filter(F.col("snapshot_id") == snapshot_id)
        .select("bucket").distinct()
    )
    return spans.join(F.broadcast(lineage), "bucket") \
        .drop("bucket", "snapshot_id")


def lineage_table(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(_lineage_path(out_dir))


def _staged_bucket_rewrite(spark: SparkSession, out_dir: str,
                           snapshot_id: str, rewritten: DataFrame,
                           repartition_buckets: int | None = None
                           ) -> tuple[DataFrame, str]:
    """Two-phase commit for a bucket rewrite (MERGE / compaction):
    materialize the rewritten partitions to a staging dir FIRST, then
    dynamic-overwrite the store from the staged files, then append the
    lineage rows, then drop the staging dir.

    Why: the naive read→overwrite-same-directory plan is lazy — tasks
    read the very files the job commit is about to delete, so a
    failure or executor retry during commit can permanently lose the
    only copy of the rewritten buckets (round-3 ADVICE, medium). With
    staging, the store's files are never the only copy while they are
    being replaced: a crash before the final overwrite leaves the
    store untouched; a crash DURING it leaves the staged copy on disk
    (under ``<out_dir>/_staging/``) from which rerunning the overwrite
    is safe. Staging is dropped only after the lineage append — the
    commit's last step, same ordering as the resume path — by
    deleting the WHOLE ``_staging`` parent, so stale copies orphaned
    by earlier crashes are swept by the next successful commit (the
    store is single-writer, like the resume path; concurrent writers
    need a real catalog — see CATALOG.md).

    Returns ``(staged_df, staging_path)`` — the staged DataFrame is
    file-backed, safe to aggregate for lineage after the overwrite;
    the caller deletes the ``_staging`` parent of ``staging_path`` as
    its final step (sweeping any stale crash leftovers with it).
    """
    import uuid

    staging = os.path.join(out_dir, "_staging",
                           f"{snapshot_id}-{uuid.uuid4().hex}")
    rewritten.write.mode("overwrite").parquet(staging)
    staged = spark.read.parquet(staging)
    if repartition_buckets is not None:
        staged = staged.repartition(repartition_buckets, "bucket")
    staged.write.mode("overwrite") \
        .option("partitionOverwriteMode", "dynamic") \
        .partitionBy("snapshot_id", "bucket") \
        .parquet(_spans_path(out_dir))
    return spark.read.parquet(staging), staging


def upsert_spans(spark: SparkSession, out_dir: str, snapshot_id: str,
                 corrections: DataFrame,
                 n_buckets: int | None = None) -> DataFrame:
    """Iceberg-style MERGE INTO at bucket granularity: apply keyed
    span corrections ``(conv_id, turn_idx, label, corrected)`` to a
    committed snapshot, rewriting ONLY the buckets that contain a
    corrected key (partition-pruned read + dynamic overwrite of those
    partitions — the other buckets' files are untouched bytes). Each
    touched bucket appends a fresh lineage row, so the audit trail
    records the merge like any other commit.

    The bucket modulus comes from the store's meta table (recorded at
    first write) — a caller-supplied ``n_buckets`` is validated
    against it and a mismatch raises instead of silently hashing
    corrections into the wrong buckets. The rewrite goes through a
    staging materialization (see :func:`_staged_bucket_rewrite`) so a
    crash mid-commit can never lose the only copy of a bucket.

    On real Iceberg this is ``MERGE INTO spans USING corrections`` —
    copy-on-write at partition scope; here it is expressed over the
    same (snapshot_id, bucket)-partitioned parquet the resume path
    uses. Corrections are curated-small by nature → broadcast joins
    throughout, no shuffle of the spans side.
    """
    n_buckets = _resolve_n_buckets(spark, out_dir, n_buckets)
    keys = ("conv_id", "turn_idx", "label")
    corr = with_bucket(
        corrections.select(*keys,
                           F.col("corrected").alias("_corrected")),
        n_buckets)
    touched = [int(r["bucket"])
               for r in corr.select("bucket").distinct().collect()]
    if not touched:
        return read_spans(spark, out_dir, snapshot_id)
    spans = (
        spark.read.parquet(_spans_path(out_dir))
        .filter((F.col("snapshot_id") == snapshot_id)
                & F.col("bucket").isin(touched))
    )
    merged = (
        spans.join(F.broadcast(corr.drop("bucket").dropDuplicates(list(keys))),
                   list(keys), "left")
        .withColumn("text", F.coalesce(F.col("_corrected"), F.col("text")))
        .drop("_corrected")
    )
    staged, staging = _staged_bucket_rewrite(spark, out_dir, snapshot_id,
                                             merged)
    lineage = staged.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("span_count"),
        _content_hash(staged).alias("content_hash"),
    ).withColumn("f1", F.lit(None).cast("double")) \
        .withColumn("snapshot_id", F.lit(snapshot_id)) \
        .select(*LINEAGE_COLS)
    lineage.write.mode("append").parquet(_lineage_path(out_dir))
    _delete_dir(spark, os.path.dirname(staging))
    return read_spans(spark, out_dir, snapshot_id)


def compact_spans(spark: SparkSession, out_dir: str, snapshot_id: str,
                  min_files: int = 2) -> int:
    """Small-files maintenance — Iceberg's ``rewrite_data_files`` analog
    for the spans store. Every committed bucket of ``snapshot_id`` that
    holds ``min_files`` or more parquet files is rewritten as ONE file
    (bucket-hash repartition: each bucket's rows land in exactly one
    task, so dynamic overwrite emits exactly one file per partition
    dir). Data is bit-identical by construction — the rewrite appends a
    lineage row whose ``content_hash`` must equal the bucket's previous
    hash, so the audit trail itself proves the compaction changed
    layout, not content. Other snapshots' partitions are untouched
    bytes (same dynamic-overwrite scoping as the resume/merge paths).

    At 100 TB this is the nightly job that keeps streaming/incremental
    commits from degrading scan parallelism bookkeeping (many tiny
    files → driver-side listing pressure + tiny tasks).

    Bucket discovery goes through the scan itself (``input_file_name``
    per row, distinct per bucket) — store-agnostic, so the job works
    identically on local disk, HDFS, or S3 and never silently no-ops
    on a remote store the driver's filesystem can't see.

    Returns the number of buckets compacted.
    """
    snap = spark.read.parquet(_spans_path(out_dir)) \
        .filter(F.col("snapshot_id") == snapshot_id)
    buckets = [
        int(r["bucket"])
        for r in snap.select("bucket", F.input_file_name().alias("f"))
        .distinct().groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_files"))
        .filter(F.col("n_files") >= min_files)
        .collect()
    ]
    if not buckets:
        return 0
    spans = (
        spark.read.parquet(_spans_path(out_dir))
        .filter((F.col("snapshot_id") == snapshot_id)
                & F.col("bucket").isin(buckets))
    )
    # staging materialization (crash-safe rewrite, see
    # _staged_bucket_rewrite) + bucket-hash repartition of the staged
    # read so each bucket's rows land in one task → one file per
    # partition dir after the dynamic overwrite
    staged, staging = _staged_bucket_rewrite(
        spark, out_dir, snapshot_id, spans,
        repartition_buckets=len(buckets))
    lineage = staged.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("span_count"),
        _content_hash(staged).alias("content_hash"),
    ).withColumn("f1", F.lit(None).cast("double")) \
        .withColumn("snapshot_id", F.lit(snapshot_id)) \
        .select(*LINEAGE_COLS)
    lineage.write.mode("append").parquet(_lineage_path(out_dir))
    _delete_dir(spark, os.path.dirname(staging))
    return len(buckets)
