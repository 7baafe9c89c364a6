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
    # — in the bands AND in the lineage (a retried ingest must not
    # double-count in audits)
    write_band_index(spark.read.parquet(snap1_docs), index, "snap1",
                     num_hashes=4)
    assert read_band_index(spark, index).count() == n1
    lin = index_lineage(spark, index)
    assert lin.filter(F.col("snapshot_id") == "snap1").count() == 1
    row = lin.collect()[0]
    assert row["n_docs"] == 50 and row["n_bands"] == 100  # 2 bands/doc


def test_exclude_snapshot_partition_filter(spark, stores):
    _, index = stores
    assert read_band_index(spark, index, exclude_snapshot="snap1") \
        .count() == 0
    assert read_band_index(spark, index).count() == 100


def test_row_bands_matches_batch_banding(spark):
    """Per-row (stream-capable) banding produces byte-identical
    (id, band_idx, band_hash) rows to the batch explode+groupBy path —
    the property that lets a stream join a stored batch index."""
    from icdar_2019_rrc_sroie_spark.operators.dedup import (
        lsh_bands,
        minhash_signatures,
    )
    from icdar_2019_rrc_sroie_spark.operators.incremental import row_bands

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    short = spark.createDataFrame([(900_000, "two words")],
                                  "doc_id long, text string")
    docs = docs.unionByName(short)
    batch = {(r["doc_id"], r["band_idx"], r["band_hash"])
             for r in lsh_bands(minhash_signatures(docs, num_hashes=4),
                                num_hashes=4).collect()}
    perrow = {(r["doc_id"], r["band_idx"], r["band_hash"])
              for r in row_bands(docs, num_hashes=4).collect()}
    assert perrow == batch
    assert not any(d == 900_000 for d, _, _ in perrow)  # <k words -> none


def test_streaming_candidates_against_stored_index(spark, tmp_path, stores):
    """A micro-batched stream of new docs is banded per row and
    stream-static joined against the snapshot-1 band index: the
    planted duplicate is flagged with its stored partner, unique
    streamed docs emit nothing."""
    import glob
    import os

    from icdar_2019_rrc_sroie_spark.operators.incremental import (
        read_band_index,
        streaming_band_candidates,
    )

    _, index = stores
    src = str(tmp_path / "stream_src")
    b1 = _docs(spark, [(200, _text(8800)), (205, _text(5))])  # 205 dups doc 5
    b2 = _docs(spark, [(210, _text(8801)), (217, _text(17))])  # 217 dups 17
    b1.coalesce(1).write.parquet(src + "/p1")
    stream = spark.readStream.schema(b1.schema) \
        .option("maxFilesPerTrigger", "1").parquet(src + "/*")
    b2.coalesce(1).write.parquet(src + "/p2")
    for d, ts in ((src + "/p1", 1_000_000_000), (src + "/p2", 2_000_000_000)):
        for f in glob.glob(d + "/*"):
            os.utime(f, (ts, ts))

    out = streaming_band_candidates(
        stream, read_band_index(spark, index), num_hashes=4)
    q = (out.writeStream.format("memory").queryName("inc_cands")
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(600)
    rows = spark.sql("select * from inc_cands").collect()
    pairs = {(r["id_a"], r["id_b"]) for r in rows}
    assert (205, 5) in pairs and (217, 17) in pairs
    assert not {a for a, _ in pairs} - {205, 217}


def test_stored_cap_scoped_to_touched_buckets(spark, tmp_path):
    """max_bucket_size on the stored side counts bucket sizes only
    within buckets the new snapshot touches (round-5: a full-history
    count window per ingest eroded the flat-cost property). Semantics
    are unchanged: a planted over-cap stored bucket still drops, small
    matched buckets still pair."""
    index = str(tmp_path / "cap_index")
    # snapshot 1: docs 0..29 share ONE text (over-cap bucket of 30);
    # docs 100..104 unique; doc 7 from _text keeps a small bucket
    snap1 = _docs(spark, [(i, _text(7777)) for i in range(30)]
                  + [(100 + i, _text(i)) for i in range(5)])
    write_band_index(snap1, index, "snap1", num_hashes=4)

    # snapshot 2: one doc duplicating the over-cap text, one
    # duplicating unique doc 102's text, one unique
    snap2 = _docs(spark, [(200, _text(7777)), (201, _text(2)),
                          (202, _text(9999))])
    cands = incremental_candidates(snap2, index, "snap2", num_hashes=4,
                                   max_bucket_size=10)
    rows = {(r["id_a"], r["id_b"], r["src"]) for r in cands.collect()}
    assert (201, 102, "cross") in rows           # small bucket pairs
    assert not any(a == 200 for a, _, _ in rows)  # over-cap bucket dropped
    # without the cap the degenerate bucket floods: 30 partners
    uncapped = incremental_candidates(snap2, index, "snap2",
                                      num_hashes=4)
    assert sum(1 for r in uncapped.collect() if r["id_a"] == 200) == 30

    from icdar_2019_rrc_sroie_spark.operators.indexes import release_indexes
    release_indexes()


# ---------------------------------------------------------------------------
# Incremental cluster maintenance (round 5)
# ---------------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_merge_into_clusters_matches_full_recompute(spark):
    """Folding a snapshot's edges into stored labels must equal a full
    connected_components recompute over ALL edges — including a
    planted cross-snapshot merge of two existing clusters — while
    untouched components pass through byte-identical."""
    from icdar_2019_rrc_sroie_spark.operators.dedup import (
        connected_components,
    )
    from icdar_2019_rrc_sroie_spark.operators.incremental import (
        merge_into_clusters,
    )

    hist = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (30, 31)]
    new = [(3, 10),            # merges cluster {1,2,3} with {10,11}
           (40, 41), (41, 42),  # brand-new cluster
           (50, 22)]            # new node joins cluster {20,21,22}
    stored = connected_components(_edges(spark, hist))
    got = {(r["node"], r["component"])
           for r in merge_into_clusters(
               stored, _edges(spark, new)).collect()}
    want = {(r["node"], r["component"])
            for r in connected_components(
                _edges(spark, hist + new)).collect()}
    assert got == want
    # untouched component {30,31} survives byte-identical
    assert (30, 30) in got and (31, 30) in got
    # the cross-snapshot merge landed: global min 1 owns {10,11}
    assert (10, 1) in got and (11, 1) in got
    # re-merging the same edges is a no-op (idempotent ingest)
    again = {(r["node"], r["component"])
             for r in merge_into_clusters(
                 merge_into_clusters(stored, _edges(spark, new)),
                 _edges(spark, new)).collect()}
    assert again == want


def test_merge_labels_store_rewrites_only_affected_buckets(spark, tmp_path):
    """The persisted label store rewrites ONLY comp_bucket partitions
    holding affected components: unaffected partitions' files keep
    their mtimes, reads of a component prune via PartitionFilters, and
    the merged store equals the pure-DataFrame merge."""
    import glob
    import os

    from icdar_2019_rrc_sroie_spark.operators.dedup import (
        connected_components,
    )
    from icdar_2019_rrc_sroie_spark.operators.incremental import (
        merge_into_clusters,
        merge_labels_store,
        read_cluster_labels,
        write_cluster_labels,
    )

    hist = [(i * 10, i * 10 + 1) for i in range(40)]  # 40 two-node clusters
    stored = connected_components(_edges(spark, hist))
    path = str(tmp_path / "labels_store")
    write_cluster_labels(stored, path, n_buckets=16)

    before = {f: os.path.getmtime(f)
              for f in glob.glob(f"{path}/labels/comp_bucket=*/*.parquet")}
    new = [(0, 10), (395, 390)]  # merge clusters 0+10; new node 395 joins 390
    row = merge_labels_store(spark, path, _edges(spark, new), "snap2")
    assert row["n_renames"] >= 1 and row["n_new_nodes"] == 1
    assert 0 < row["n_buckets_rewritten"] < 16

    got = {(r["node"], r["component"])
           for r in read_cluster_labels(spark, path).collect()}
    want = {(r["node"], r["component"])
            for r in merge_into_clusters(stored, _edges(spark, new)).collect()}
    assert got == want

    after = {f: os.path.getmtime(f)
             for f in glob.glob(f"{path}/labels/comp_bucket=*/*.parquet")}
    untouched = [f for f in before if f in after and before[f] == after[f]]
    # most bucket partitions were never rewritten
    assert len(untouched) >= len(before) - row["n_buckets_rewritten"] > 0

    # component reads prune at scan time
    plan = (spark.read.parquet(f"{path}/labels")
            .filter(F.col("comp_bucket") == 3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters" in plan and "comp_bucket" in plan


def test_merge_labels_store_sweeps_emptied_bucket(spark, tmp_path):
    """Dynamic partition overwrite only replaces partitions present in
    the written data: a bucket whose EVERY component is renamed away
    must have its stale files swept, or reads resurrect pre-merge
    labels (round-5 self-review bug — with few components per bucket
    the happy path never empties one)."""
    import glob

    from icdar_2019_rrc_sroie_spark.operators.dedup import (
        connected_components,
    )
    from icdar_2019_rrc_sroie_spark.operators.incremental import (
        merge_into_clusters,
        merge_labels_store,
        read_cluster_labels,
        write_cluster_labels,
    )

    # 3 clusters over MANY buckets -> each component alone in its
    # bucket; merging {100,101} into {1,2} must EMPTY bucket(100)
    hist = [(1, 2), (100, 101), (200, 201)]
    stored = connected_components(_edges(spark, hist))
    path = str(tmp_path / "labels_store")
    write_cluster_labels(stored, path, n_buckets=256)
    new = [(2, 100)]
    merge_labels_store(spark, path, _edges(spark, new), "snap2")

    got = {(r["node"], r["component"])
           for r in read_cluster_labels(spark, path).collect()}
    want = {(r["node"], r["component"])
            for r in merge_into_clusters(stored, _edges(spark, new)).collect()}
    assert got == want  # no resurrected (100, 100)/(101, 100) rows
    assert {n for n, _ in got} == {1, 2, 100, 101, 200, 201}
    # the emptied partition dir is actually gone
    from icdar_2019_rrc_sroie_spark.operators.incremental import (
        LABELS_N_BUCKETS_DEFAULT,  # noqa: F401 - keep import surface
        _labels_bucket,
    )

    b100 = spark.range(1).select(
        _labels_bucket(F.lit(100).cast("long"), 256)).collect()[0][0]
    assert glob.glob(f"{path}/labels/comp_bucket={b100}/*.parquet") == []


@pytest.mark.parametrize("crash_point",
                         ["labels_overwrite", "labels_sweep", "mirror"])
def test_merge_labels_store_heals_injected_crashes(spark, tmp_path,
                                                   crash_point):
    """Round 6: the merge persists its (relabel, new_rows) artifact to
    ``_pending`` before touching either store; a REAL crash injected at
    each stage boundary (after the labels overwrite but before the
    emptied-bucket sweep; after the sweep but before the mirror
    rewrite; after the mirror but before the marker delete) must be
    healed by re-running the same snapshot's merge — labels AND mirror
    converge to the clean result with no duplicate nodes."""
    from icdar_2019_rrc_sroie_spark.operators.dedup import (
        connected_components,
    )
    from icdar_2019_rrc_sroie_spark.operators.incremental import (
        merge_into_clusters,
        merge_labels_store,
        read_cluster_labels,
        write_cluster_labels,
    )

    hist = [(1, 2), (100, 101), (200, 201)]
    stored = connected_components(_edges(spark, hist))
    path = str(tmp_path / f"labels_store_{crash_point}")
    write_cluster_labels(stored, path, n_buckets=256)
    new = [(2, 100), (395, 390)]  # a rename AND two brand-new nodes
    with pytest.raises(RuntimeError, match="injected crash"):
        merge_labels_store(spark, path, _edges(spark, new), "snap2",
                           fail_after=crash_point)
    if crash_point == "labels_overwrite":
        # the un-swept bucket leaves nodes 100/101 in two buckets
        dup_nodes = [r["node"] for r in
                     read_cluster_labels(spark, path).groupBy("node")
                     .count().filter("count > 1").collect()]
        assert sorted(dup_nodes) == [100, 101]

    # recovery: re-run the SAME snapshot's merge (the pending marker
    # makes healing unconditional on entry)
    merge_labels_store(spark, path, _edges(spark, new), "snap2")
    got = {(r["node"], r["component"])
           for r in read_cluster_labels(spark, path).collect()}
    want = {(r["node"], r["component"])
            for r in merge_into_clusters(stored, _edges(spark, new)).collect()}
    assert got == want
    assert len(got) == 8  # no duplicates survive
    # the mirror agrees with the labels row-for-row
    mirror = {(r["node"], r["component"]) for r in
              spark.read.parquet(f"{path}/nodes")
              .select("node", "component").collect()}
    assert mirror == got
    # and the pending marker is gone
    import glob

    assert glob.glob(f"{path}/_pending/*") == []


# ---------------------------------------------------------------------------
# Composed longitudinal ingest (round 5): band -> candidates -> label
# merge as one idempotent step, batch and streaming
# ---------------------------------------------------------------------------


def test_ingest_snapshot_end_to_end_matches_batch(spark, tmp_path):
    """Three snapshots ingested sequentially must leave the label store
    equal to a one-shot batch dedup over the union (edges-bearing nodes
    only — the batch CC sees only nodes with candidate pairs)."""
    from icdar_2019_rrc_sroie_spark.operators.dedup import (
        connected_components,
        minhash_candidates,
    )
    from icdar_2019_rrc_sroie_spark.operators.incremental import (
        ingest_snapshot,
        read_cluster_labels,
    )
    from icdar_2019_rrc_sroie_spark.operators.indexes import (
        release_indexes,
    )

    snaps = [
        [(1, _text(101)), (2, _text(102)), (3, _text(101))],   # 1~3
        [(10, _text(102)), (11, _text(201))],                  # 10~2
        [(20, _text(101)), (21, _text(201)), (22, _text(999))],  # 20~{1,3}, 21~11
    ]
    index = str(tmp_path / "band_index")
    labels = str(tmp_path / "labels")
    for i, rows in enumerate(snaps):
        out = ingest_snapshot(_docs(spark, rows), index, labels,
                              f"snap{i}", num_hashes=4)
        assert out["n_bands"] > 0
        release_indexes()

    got = {(r["node"], r["component"])
           for r in read_cluster_labels(spark, labels).collect()}
    all_docs = _docs(spark, [r for rows in snaps for r in rows])
    batch = connected_components(
        minhash_candidates(all_docs, num_hashes=4))
    want = {(r["node"], r["component"]) for r in batch.collect()}
    release_indexes()
    assert got == want
    # the cross-snapshot merges actually happened
    comp = dict(got)
    assert comp[20] == comp[1] == comp[3]
    assert comp[10] == comp[2]
    assert comp[21] == comp[11]

    # idempotent re-ingest of an already-committed snapshot: no change
    out = ingest_snapshot(_docs(spark, snaps[2]), index, labels,
                          "snap2", num_hashes=4)
    release_indexes()
    assert out["n_renames"] == 0 and out["n_new_nodes"] == 0
    again = {(r["node"], r["component"])
             for r in read_cluster_labels(spark, labels).collect()}
    assert again == want


def test_streaming_ingest_longitudinal_loop(spark, tmp_path):
    """The foreachBatch face: a 3-micro-batch stream grows the band
    index one snapshot per batch and converges the label store to the
    batch recompute — the full longitudinal loop under Structured
    Streaming."""
    import glob
    import os

    from icdar_2019_rrc_sroie_spark.operators.dedup import (
        connected_components,
        minhash_candidates,
    )
    from icdar_2019_rrc_sroie_spark.operators.incremental import (
        index_lineage,
        read_cluster_labels,
        streaming_ingest,
    )
    from icdar_2019_rrc_sroie_spark.operators.indexes import (
        release_indexes,
    )

    batches = [
        [(1, _text(101)), (2, _text(102)), (3, _text(101))],
        [(10, _text(102)), (11, _text(201))],
        [(20, _text(101)), (21, _text(201))],
    ]
    src = str(tmp_path / "stream_src")
    for i, rows in enumerate(batches):
        _docs(spark, rows).coalesce(1).write.parquet(f"{src}/p{i}")
        for f in glob.glob(f"{src}/p{i}/*"):
            ts = 1_000_000_000 + i * 1_000_000
            os.utime(f, (ts, ts))

    index = str(tmp_path / "band_index")
    labels = str(tmp_path / "labels")
    stream = spark.readStream.schema(
        _docs(spark, batches[0]).schema
    ).option("maxFilesPerTrigger", "1").parquet(src + "/*")
    q = streaming_ingest(stream, index, labels,
                         str(tmp_path / "ckpt"), num_hashes=4) \
        .trigger(availableNow=True).start()
    assert q.awaitTermination(600)

    snaps = {r["snapshot_id"]
             for r in index_lineage(spark, index).collect()}
    assert snaps == {"batch-00000000", "batch-00000001", "batch-00000002"}
    got = {(r["node"], r["component"])
           for r in read_cluster_labels(spark, labels).collect()}
    all_docs = _docs(spark, [r for rows in batches for r in rows])
    want = {(r["node"], r["component"]) for r in connected_components(
        minhash_candidates(all_docs, num_hashes=4)).collect()}
    release_indexes()
    assert got == want


def test_index_scope_releases_only_inner_entries(spark):
    """index_scope (round 5) must release persists tracked inside the
    block and leave earlier entries for the global release — the
    mechanism that stops ingest_snapshot leaking one persisted band
    table per foreachBatch micro-batch."""
    from icdar_2019_rrc_sroie_spark.operators.indexes import (
        index_scope,
        release_indexes,
        track_persist,
    )

    release_indexes()
    outer = track_persist(spark.range(10))
    with index_scope():
        inner = track_persist(spark.range(5))
        inner.count()
        assert inner.storageLevel.useMemory
    assert not inner.storageLevel.useMemory
    assert outer.storageLevel.useMemory
    assert release_indexes() == 1
    assert not outer.storageLevel.useMemory


def test_ingest_snapshot_leaves_no_tracked_persists(spark, tmp_path):
    """The composed ingest step scope-releases every index it persists
    (round-5 review: a long-running streaming_ingest otherwise pins one
    band table per batch forever)."""
    from icdar_2019_rrc_sroie_spark.operators import indexes
    from icdar_2019_rrc_sroie_spark.operators.incremental import (
        ingest_snapshot,
    )

    indexes.release_indexes()
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta eta theta doc {i}")
         for i in range(30)], "doc_id long, text string")
    ingest_snapshot(docs, str(tmp_path / "idx"), str(tmp_path / "lab"),
                    "s1", max_bucket_size=64)
    alive = [r for r in indexes._TRACKED if r() is not None]
    assert not alive
    assert not indexes._TRACKED_PATHS


def test_mirror_lookup_prunes_node_buckets(spark, tmp_path):
    """Round 6: the merge's label lookup reads the node-keyed mirror
    pruned to the probe nodes' partitions — PartitionFilters on
    node_bucket, not a full store scan (the last history-proportional
    cost VERDICT r5 #4 flagged)."""
    from icdar_2019_rrc_sroie_spark.operators.dedup import (
        connected_components,
    )
    from icdar_2019_rrc_sroie_spark.operators.incremental import (
        _mirror_lookup,
        write_cluster_labels,
    )

    hist = [(i * 10, i * 10 + 1) for i in range(200)]
    stored = connected_components(_edges(spark, hist))
    path = str(tmp_path / "labels_store")
    write_cluster_labels(stored, path, n_buckets=256)
    probe = spark.createDataFrame([(0,), (10,)], "node long")
    looked = _mirror_lookup(spark, path, probe, 256)
    plan = looked._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "node_bucket" in plan
    # the probe nodes' rows are in the slice; everything else pruned —
    # the slice is a small fraction of the 400-row store
    got = {(r["node"], r["component"]) for r in looked.collect()}
    assert {(0, 0), (10, 10)} <= got
    assert len(got) < 100


def test_mirror_migrates_legacy_store_and_stays_consistent(spark,
                                                           tmp_path):
    """A store written before the mirror existed (nodes/ deleted) must
    be migrated in place on the first merge, and after a chain of
    merges the mirror equals the labels row-for-row."""
    import shutil

    from icdar_2019_rrc_sroie_spark.operators.dedup import (
        connected_components,
    )
    from icdar_2019_rrc_sroie_spark.operators.incremental import (
        merge_labels_store,
        read_cluster_labels,
        write_cluster_labels,
    )

    hist = [(1, 2), (100, 101), (200, 201)]
    stored = connected_components(_edges(spark, hist))
    path = str(tmp_path / "labels_store")
    write_cluster_labels(stored, path, n_buckets=64)
    shutil.rmtree(f"{path}/nodes")  # legacy store: labels only

    merge_labels_store(spark, path, _edges(spark, [(2, 100)]), "s1")
    merge_labels_store(spark, path, _edges(spark, [(201, 300)]), "s2")
    got = {(r["node"], r["component"])
           for r in read_cluster_labels(spark, path).collect()}
    mirror = {(r["node"], r["component"]) for r in
              spark.read.parquet(f"{path}/nodes")
              .select("node", "component").collect()}
    assert mirror == got
    assert (100, 1) in got and (300, 200) in got
