"""Incremental (cross-snapshot) dedup: planted cross-snapshot
duplicates are found by joining the stored band index only — snapshot
1's document text is never rescanned (plan-asserted)."""

import pytest
from pyspark.sql import functions as F

from icdar_2019_rrc_sroie_spark.operators.incremental import (
    incremental_candidates,
    index_lineage,
    read_band_index,
    write_band_index,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _text(i):
    # ≥ 3 words so 3-word shingles exist; distinct per i
    return (f"alpha{i} bravo{i} charlie{i} delta{i} echo{i} "
            f"foxtrot{i} golf{i} hotel{i}")


@pytest.fixture()
def stores(spark, tmp_path):
    snap1_docs = str(tmp_path / "snap1_docs")
    index = str(tmp_path / "band_index")
    _docs(spark, [(i, _text(i)) for i in range(50)]) \
        .write.parquet(snap1_docs)
    write_band_index(spark.read.parquet(snap1_docs), index, "snap1",
                     num_hashes=4)
    return snap1_docs, index


def test_cross_snapshot_dups_found_without_rescan(spark, tmp_path, stores):
    snap1_docs, index = stores
    # snapshot 2: 105/107 duplicate snapshot-1 docs 5/7; 140/141 are a
    # within-snapshot duplicate pair; the rest are unique
    snap2_rows = (
        [(100 + i, _text(1000 + i)) for i in range(5)]
        + [(105, _text(5)), (107, _text(7))]
        + [(140, _text(4040)), (141, _text(4040))]
    )
    snap2_docs = str(tmp_path / "snap2_docs")
    _docs(spark, snap2_rows).write.parquet(snap2_docs)
    new_docs = spark.read.parquet(snap2_docs)

    cands = incremental_candidates(new_docs, index, "snap2", num_hashes=4)
    rows = {(r["id_a"], r["id_b"], r["src"]) for r in cands.collect()}
    assert (105, 5, "cross") in rows
    assert (107, 7, "cross") in rows
    assert (140, 141, "new") in rows
    # unique docs propose nothing
    ids_in_pairs = {a for a, _, _ in rows} | {b for _, b, _ in rows}
    assert not ids_in_pairs & {100, 101, 102, 103, 104}

    # zero snapshot-1 rescan: the plan reads the band index parquet,
    # never the snapshot-1 documents parquet
    # (snap2_docs itself is invisible here — its bands are persisted by
    # cap_buckets, and inputFiles() doesn't look beneath the cache)
    files = cands.inputFiles()
    assert any("band_index" in f for f in files)
    assert not any("snap1_docs" in f for f in files)


def test_index_write_idempotent_and_lineage(spark, stores):
    snap1_docs, index = stores
    n1 = read_band_index(spark, index).count()
    # re-running the same snapshot replaces its partition, no dup rows
    write_band_index(spark.read.parquet(snap1_docs), index, "snap1",
                     num_hashes=4)
    assert read_band_index(spark, index).count() == n1
    lin = index_lineage(spark, index)
    assert lin.filter(F.col("snapshot_id") == "snap1").count() == 2
    row = lin.collect()[0]
    assert row["n_docs"] == 50 and row["n_bands"] == 100  # 2 bands/doc


def test_exclude_snapshot_partition_filter(spark, stores):
    _, index = stores
    assert read_band_index(spark, index, exclude_snapshot="snap1") \
        .count() == 0
    assert read_band_index(spark, index).count() == 100
