"""Incremental (cross-snapshot) dedup.

A 100-TB pipeline ingests snapshots continuously; deduping snapshot N
against snapshots 1..N-1 must NOT rescan the accumulated corpus text
(rescanning makes ingestion quadratic in corpus size). The persisted
artifact is the MinHash-LSH **band index** — (id, band_idx, band_hash)
rows, a small fraction of the text it summarizes — written per
snapshot; new documents are banded once and equi-joined against the
stored index. Only the index parquet is read for history
(plan-asserted in tests/test_incremental.py), and each snapshot's
index write is idempotent (dynamic partition overwrite of that
snapshot's partition only).

This is the incremental face of ``minhash_candidates``
(operators/dedup.py): identical signatures/banding, so an index
written by one is joinable by the other. The same structure maps to an
Iceberg table partitioned by snapshot — see CATALOG.md.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import (
    MINHASH_SECOND_DIGEST_PREFIX,
    band_hash_expr,
    cap_buckets,
    lsh_bands,
    minhash_signatures,
    minhash_slice_expr,
    word_shingles,
)

INDEX_SCHEMA = "doc_id long, band_idx int, band_hash string, snapshot_id string"


def row_bands(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", num_hashes: int = 8,
              rows_per_band: int = 2, k: int = 3) -> DataFrame:
    """(id, band_idx, band_hash) computed PER ROW with column algebra —
    no shingle explode, no groupBy — so it runs unchanged on a
    STREAMING DataFrame (stateless narrow ops only). Values are
    identical to the batch ``minhash_signatures`` → ``lsh_bands`` path
    (same md5 digests, same lexicographic minima; parity pinned by
    tests), so a stream banded here joins a stored batch index
    directly. Docs with fewer than ``k`` words produce no bands (the
    batch path drops them by construction; here an explicit filter —
    otherwise their NULL signatures would all collide in one bucket).

    The shingles array is materialized as a column first — and so are
    the one-or-two md5 digest ARRAYS: slicing materialized digests
    inside the per-hash transforms costs 1-2 md5 calls per shingle
    exactly like the batch path, where digesting inside each of the
    ``num_hashes`` lambdas re-ran md5 up to 8× per shingle (the HOF
    re-evaluation class, see winnow_fingerprints; flagged by round-4
    advice). The digest-slice rule comes from
    dedup.minhash_slice_expr — the single source of truth both paths
    share (bands must stay joinable)."""
    assert num_hashes <= 8 and num_hashes % rows_per_band == 0
    base = df.select(
        F.col(id_col), word_shingles(F.col(text_col), k).alias("_sh")
    ).filter(F.size("_sh") > 0)
    digests = [F.transform(F.col("_sh"), F.md5).alias("_d1")]
    if num_hashes > 4:
        digests.append(F.transform(
            F.col("_sh"),
            lambda s: F.md5(F.concat(
                F.lit(MINHASH_SECOND_DIGEST_PREFIX), s))).alias("_d2"))
    digested = base.select(F.col(id_col), *digests)

    def _sig(i: int) -> Column:
        # factory: the transform lambda must stay SINGLE-argument
        # (PySpark derives the HOF arity from the signature), so the
        # per-i binding is via closure; the digest array sits in
        # ARGUMENT position (evaluated once per row)
        src = F.col("_d1") if i < 4 else F.col("_d2")
        return F.array_min(F.transform(
            src, lambda d: minhash_slice_expr(d, i)))

    sigs = [_sig(i).alias(f"sig{i}") for i in range(num_hashes)]
    sigd = digested.select(F.col(id_col), *sigs)
    bands = []
    for b in range(num_hashes // rows_per_band):
        cols = [F.col(f"sig{b * rows_per_band + r}")
                for r in range(rows_per_band)]
        bands.append(F.struct(
            F.lit(b).alias("band_idx"),
            band_hash_expr(cols).alias("band_hash")))
    return sigd.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("band")
    ).select(id_col, "band.band_idx", "band.band_hash")


def streaming_band_candidates(stream_docs: DataFrame,
                              stored_index: DataFrame,
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              num_hashes: int = 8,
                              rows_per_band: int = 2,
                              k: int = 3) -> DataFrame:
    """Streaming face of incremental dedup: band each arriving doc per
    row (:func:`row_bands` — stateless) and stream-static inner-join
    against the stored band index. Output: (id_a, id_b, band_idx) where
    id_a is the streamed doc and id_b the stored (canonical-by-age)
    match — one row per matching band, emitted within the micro-batch.
    Pairs matching on several bands repeat; downstream either tolerates
    duplicates (alerting) or applies dropDuplicatesWithinWatermark on
    (id_a, id_b) — kept out of here so the operator stays stateless.

    ``stored_index`` is a STATIC DataFrame (e.g. ``read_band_index``)
    whose file listing is PINNED when the DataFrame is created — new
    snapshots written to the index while the stream runs are NOT seen
    by this query, and overwriting a snapshot the running stream
    references (write_band_index's idempotent re-ingest) deletes files
    it may still read. Operational contract: treat the index as
    immutable for the life of the stream; to pick up newly-ingested
    snapshots, restart the query with a fresh ``read_band_index`` (or
    run the join inside ``foreachBatch``, re-reading the index per
    batch). On Iceberg the same join reads a pinned snapshot and the
    restart swaps to the newest one — see CATALOG.md."""
    new_bands = row_bands(stream_docs, id_col, text_col,
                          num_hashes, rows_per_band, k)
    stored = stored_index.select(F.col(id_col).alias("id_b"),
                                 "band_idx", "band_hash")
    return (
        new_bands.select(F.col(id_col).alias("id_a"),
                         "band_idx", "band_hash")
        .join(stored, ["band_idx", "band_hash"])
        .select("id_a", "id_b", "band_idx")
    )


def _bands(df: DataFrame, id_col: str, text_col: str, num_hashes: int,
           rows_per_band: int, k: int) -> DataFrame:
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, k)
    return lsh_bands(sigs, id_col, num_hashes, rows_per_band)


def write_band_index(df: DataFrame, index_path: str, snapshot_id: str,
                     id_col: str = "doc_id", text_col: str = "text",
                     num_hashes: int = 8, rows_per_band: int = 2,
                     k: int = 3) -> int:
    """Band the snapshot's documents and commit them to the index store
    under ``snapshot_id``. Re-running the same snapshot replaces its
    partition (dynamic overwrite) — idempotent ingestion. Appends one
    lineage row (snapshot_id, n_docs, n_bands) to ``<index>/_lineage``.
    Returns the number of band rows written."""
    spark = df.sparkSession
    bands = _bands(df, id_col, text_col, num_hashes, rows_per_band, k) \
        .withColumn("snapshot_id", F.lit(snapshot_id))
    bands.write.mode("overwrite") \
        .option("partitionOverwriteMode", "dynamic") \
        .partitionBy("snapshot_id") \
        .parquet(f"{index_path}/bands")
    stats = (
        spark.read.parquet(f"{index_path}/bands")
        .filter(F.col("snapshot_id") == snapshot_id)
        .agg(F.count(F.lit(1)).cast("long").alias("n_bands"),
             F.countDistinct(id_col).cast("long").alias("n_docs"))
        .collect()[0]
    )
    # lineage is idempotent like the bands write: the snapshot's
    # partition is replaced, so a re-ingest never double-counts
    spark.createDataFrame(
        [(int(stats["n_docs"]), int(stats["n_bands"]), snapshot_id)],
        "n_docs long, n_bands long, snapshot_id string",
    ).write.mode("overwrite") \
        .option("partitionOverwriteMode", "dynamic") \
        .partitionBy("snapshot_id") \
        .parquet(f"{index_path}/_lineage")
    return int(stats["n_bands"])


def read_band_index(spark: SparkSession, index_path: str,
                    exclude_snapshot: str | None = None) -> DataFrame:
    """The stored band index (all snapshots, optionally excluding one —
    the snapshot currently being deduped). The snapshot filter is a
    partition filter, pruned at scan time."""
    idx = spark.read.parquet(f"{index_path}/bands")
    if exclude_snapshot is not None:
        idx = idx.filter(F.col("snapshot_id") != exclude_snapshot)
    return idx


def index_lineage(spark: SparkSession, index_path: str) -> DataFrame:
    return spark.read.parquet(f"{index_path}/_lineage")


def incremental_candidates(new_docs: DataFrame, index_path: str,
                           snapshot_id: str, id_col: str = "doc_id",
                           text_col: str = "text", num_hashes: int = 8,
                           rows_per_band: int = 2, k: int = 3,
                           max_bucket_size: int | None = None,
                           include_new_pairs: bool = True) -> DataFrame:
    """Candidate near-duplicate pairs for a NEW snapshot without
    rescanning history: band the new docs once (persisted via
    cap_buckets), then

    * cross-snapshot: equi-join new bands against the STORED index of
      prior snapshots on (band_idx, band_hash) — the corpus text of
      those snapshots is never read;
    * within-snapshot (``include_new_pairs``): the usual self-join of
      the new bands.

    Output: (id_a, id_b, src) with src ∈ {'cross', 'new'}; for cross
    rows id_a is the new doc and id_b the stored doc (the stored side
    is canonical by age — the keep-decision drops/links id_a); for new
    rows id_a < id_b. ``max_bucket_size`` caps both the new-band
    buckets and the stored-index buckets (cap_buckets logs any drops).

    The stored-side cap is SCOPED to buckets the new snapshot actually
    touches (broadcast semi-join on the new snapshot's distinct band
    keys BEFORE the count window): counting every historical bucket
    would cost a full window shuffle + persist of the whole index per
    ingest — quietly eroding the flat-in-history property this module
    exists for (round-4 advice). A bucket's row count is unchanged by
    filtering to that bucket, and untouched buckets produce no pairs
    either way, so the output is identical; the cap's cost is now
    proportional to the matched slice, not the accumulated history.
    """
    spark = new_docs.sparkSession
    new_bands = cap_buckets(
        _bands(new_docs, id_col, text_col, num_hashes, rows_per_band, k),
        ["band_idx", "band_hash"], max_bucket_size,
        label="incremental_candidates(new)")
    stored = read_band_index(spark, index_path,
                             exclude_snapshot=snapshot_id)
    if max_bucket_size is not None:
        touched = new_bands.select("band_idx", "band_hash").distinct()
        stored = cap_buckets(
            stored.join(F.broadcast(touched),
                        ["band_idx", "band_hash"], "left_semi"),
            ["band_idx", "band_hash"], max_bucket_size,
            label="incremental_candidates(stored)")
    left = new_bands.select(F.col(id_col).alias("id_a"),
                            "band_idx", "band_hash")
    right = stored.select(F.col(id_col).alias("id_b"),
                          "band_idx", "band_hash")
    cross = (
        left.join(right, ["band_idx", "band_hash"])
        .select("id_a", "id_b").distinct()
        .withColumn("src", F.lit("cross"))
    )
    if not include_new_pairs:
        return cross
    right_new = new_bands.select(F.col(id_col).alias("id_b"),
                                 "band_idx", "band_hash")
    within = (
        left.join(right_new, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b").distinct()
        .withColumn("src", F.lit("new"))
    )
    return cross.unionByName(within)


# ---------------------------------------------------------------------------
# Incremental cluster maintenance (round 5): merge a new snapshot's
# candidate edges into STORED component labels without recomputing
# connected components over all historical edges — the last
# quadratic-in-time cost in the otherwise flat ingest path. The
# propagation fixpoint runs over CONTRACTED edges only (one label pair
# per new edge, never the historical edge set), so its cost is
# O(new edges), independent of history.
# ---------------------------------------------------------------------------


def _cluster_merge_mapping(stored_labels: DataFrame, new_edges: DataFrame,
                           max_iterations: int = 25
                           ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The small artifacts of a label merge:

    * ``relabel`` — (_old, _new) component renames (_old != _new),
      bounded by 2x the new edge count;
    * ``new_rows`` — (node, component) for nodes the store has never
      seen;
    * ``cur`` — the per-node lookup table (node, lbl, n_lbls) the above
      derive from, PERSISTED (released via ``release_indexes``) and
      bounded by the new-edge node set.

    Every new-edge node is looked up in ``stored_labels`` (missing →
    labeled by its own id — labels are component-min node ids, so a
    fresh node's initial label is itself); each new edge contracts to
    its endpoints' label pair; hash-min CC over those contracted pairs
    (``connected_components`` — same fixpoint, tiny input) yields the
    merged component per touched label. Because stored labels are
    minima and fresh labels are node ids, the min over merged labels
    IS the global component minimum — the store's canonical-label
    invariant survives merging by construction.

    ``stored_labels`` is scanned EXACTLY ONCE: the lookup join
    materializes into the persisted ``cur``, and everything downstream
    (contracted edges — whose lineage the CC fixpoint re-evaluates per
    iteration — the new-node anti-filter) reads the persisted rows.
    Before round-5 profiling, each of those consumers re-scanned the
    full store per action: ~3-5 scans per merge, which made a 10-edge
    maintenance merge GROW with history (8.7 s → 26 s at 64× — the
    exact property this module exists to avoid). Historical EDGES are
    never an input — by signature, not just by plan. Round 6 closed
    the last O(store) term too: :func:`merge_labels_store` passes a
    node-bucket-PRUNED slice of its node-keyed mirror as
    ``stored_labels`` (``_mirror_lookup``), so even the single lookup
    scan reads only the probe nodes' partitions.
    """
    from .dedup import connected_components
    from .indexes import track_persist

    nodes = (
        new_edges.select(F.col("id_a").alias("node"))
        .unionAll(new_edges.select(F.col("id_b").alias("node")))
        .distinct()
    )
    stored = stored_labels.select("node", F.col("component").alias("_stored"))
    # ONE store scan; n_lbls > 1 marks crash-window duplicate labels
    # (a node left in two buckets by an interrupted overwrite) — the
    # lookup keeps the smaller = newer label, and _lbls retains every
    # copy so the store rewrite can pull the stale buckets in
    cur = track_persist(
        nodes.join(stored, "node", "left")
        .groupBy("node")
        .agg(F.collect_set("_stored").alias("_lbls"))
        .select(
            "node", "_lbls",
            F.coalesce(F.array_min("_lbls"), F.col("node")).alias("lbl"),
            F.size("_lbls").alias("n_lbls"))
    )
    la = cur.select(F.col("node").alias("id_a"), F.col("lbl").alias("lbl_a"))
    lb = cur.select(F.col("node").alias("id_b"), F.col("lbl").alias("lbl_b"))
    cedges = (
        new_edges.select("id_a", "id_b")
        .join(la, "id_a").join(lb, "id_b")
        .filter(F.col("lbl_a") != F.col("lbl_b"))
        .select("lbl_a", "lbl_b").distinct()
    )
    cc = connected_components(cedges, "lbl_a", "lbl_b", max_iterations)
    relabel = (
        cc.select(F.col("node").alias("_old"), F.col("component").alias("_new"))
        .filter(F.col("_old") != F.col("_new"))
    )
    # no forced broadcast: both sides are bounded by the new-edge
    # volume, but a huge snapshot can push the rename table past the
    # executor broadcast budget (merge_labels_store gates its own join
    # on the measured count for exactly that reason) — let AQE promote
    # the small side at runtime instead of pinning the decision here
    new_rows = (
        cur.filter(F.col("n_lbls") == 0)
        .join(relabel, F.col("lbl") == F.col("_old"), "left")
        .select("node", F.coalesce("_new", F.col("lbl")).alias("component"))
    )
    return relabel, new_rows, cur


def merge_into_clusters(stored_labels: DataFrame, new_edges: DataFrame,
                        max_iterations: int = 25) -> DataFrame:
    """Updated (node, component) labels after folding ``new_edges``
    (e.g. :func:`incremental_candidates` output) into ``stored_labels``
    — equivalent to a full ``connected_components`` recompute over all
    edges ever seen (pinned by test), at the cost of a fixpoint over
    the CONTRACTED new edges plus one linear map over the stored
    labels (untouched components pass through byte-identical).

    Idempotent: re-merging edges the store already reflects contracts
    every edge to a self-loop — empty relabel, labels unchanged. For a
    store that rewrites only affected partitions instead of mapping
    the whole table, see :func:`merge_labels_store`.

    The rename map is broadcast (bounded by 2x the new-edge count —
    snapshot-sized by contract); for snapshots whose candidate-edge
    volume approaches executor broadcast budgets use
    :func:`merge_labels_store`, which gates the hint on the measured
    rename count.
    """
    relabel, new_rows, _ = _cluster_merge_mapping(
        stored_labels, new_edges, max_iterations)
    updated = (
        stored_labels.join(F.broadcast(relabel),
                           F.col("component") == F.col("_old"), "left")
        .select("node", F.coalesce("_new", F.col("component"))
                .alias("component"))
    )
    return updated.unionByName(new_rows)


LABELS_N_BUCKETS_DEFAULT = 64


def _labels_bucket(component: Column, n_buckets: int) -> Column:
    return F.pmod(F.xxhash64(component), F.lit(n_buckets)).cast("int")


def write_cluster_labels(labels: DataFrame, labels_path: str,
                         n_buckets: int = LABELS_N_BUCKETS_DEFAULT) -> None:
    """Initialize the label store: (node, component) partitioned by
    ``comp_bucket = xxhash64(component) % n_buckets`` so incremental
    merges rewrite only the partitions holding affected components —
    PLUS (round 6) a node-keyed MIRROR of the same rows under
    ``<path>/nodes``, partitioned by ``node_bucket = xxhash64(node) %
    n_buckets``: the merge's per-node label lookup prunes to the probe
    nodes' buckets instead of scanning the whole store (the last
    history-proportional cost in the ingest loop, VERDICT r5 #4).
    The modulus is pinned in ``<path>/_meta`` (same discipline as the
    lineage span store — a silently changed modulus would scatter
    components across partitions)."""
    spark = labels.sparkSession
    # repartition by the partition column before every partitionBy
    # write (here and in _apply_merge): without it each of the writer's
    # tasks emits a file into every bucket dir it holds rows for —
    # ~tasks×buckets small files (measured: ~4.8k files in a
    # 16×-history store), and every later slice read pays the
    # listing/open cost in proportion to HISTORY — round 6 measured
    # the 16×-history maintenance merge at 15.9 s vs 8.4 s at 1×; this
    # one change flattened it to 8.95 vs 8.46. One file per bucket is
    # also the 100 TB-safe shape (no small-file explosion under
    # continuous ingest).
    labels.select(
        "node", "component",
        _labels_bucket(F.col("component"), n_buckets).alias("comp_bucket"),
    ).repartition("comp_bucket") \
        .write.mode("overwrite").partitionBy("comp_bucket") \
        .parquet(f"{labels_path}/labels")
    labels.select(
        "node", "component",
        _labels_bucket(F.col("node"), n_buckets).alias("node_bucket"),
    ).repartition("node_bucket") \
        .write.mode("overwrite").partitionBy("node_bucket") \
        .parquet(f"{labels_path}/nodes")
    spark.createDataFrame([(n_buckets,)], "n_buckets int") \
        .write.mode("overwrite").parquet(f"{labels_path}/_meta")


def _labels_df(spark: SparkSession, labels_path: str) -> DataFrame:
    """The raw partitioned label table — or an empty, schema-correct
    stand-in for a store that holds no rows yet (a zero-row partitioned
    parquet write leaves no readable files, only the pinned _meta)."""
    try:
        return spark.read.parquet(f"{labels_path}/labels")
    except Exception:  # noqa: BLE001 — bootstrapped empty store
        return spark.createDataFrame(
            [], "node long, component long, comp_bucket int")


def read_cluster_labels(spark: SparkSession, labels_path: str) -> DataFrame:
    return _labels_df(spark, labels_path).select("node", "component")


def _nodes_df(spark: SparkSession, labels_path: str) -> DataFrame | None:
    """The node-keyed mirror, or None when unreadable (zero-row
    bootstrap leaves no files; a pre-round-6 store has no mirror at
    all — callers distinguish via the labels side)."""
    try:
        return spark.read.parquet(f"{labels_path}/nodes")
    except Exception:  # noqa: BLE001
        return None


def _mirror_lookup(spark: SparkSession, labels_path: str,
                   nodes: DataFrame, n_buckets: int) -> DataFrame:
    """(node, component) rows for the probe ``nodes``' buckets only —
    the merge's label lookup, pruned to the node-bucket partitions the
    probe set actually hashes into (PartitionFilters-asserted in
    tests). The collect is the probe set's DISTINCT bucket ids —
    bounded by ``n_buckets``, a control-plane round-trip. A store
    written before the mirror existed is migrated in place (one
    full labels scan, once)."""
    mirror = _nodes_df(spark, labels_path)
    if mirror is None:
        # legacy store (labels exist, mirror never written): build it
        labels = _labels_df(spark, labels_path)
        if labels.limit(1).count() > 0:
            labels.select(
                "node", "component",
                _labels_bucket(F.col("node"), n_buckets)
                .alias("node_bucket"),
            ).repartition("node_bucket") \
                .write.mode("overwrite").partitionBy("node_bucket") \
                .parquet(f"{labels_path}/nodes")
            mirror = _nodes_df(spark, labels_path)
    if mirror is None:
        return spark.createDataFrame([], "node long, component long")
    buckets = sorted({
        int(r["b"]) for r in nodes.select(
            _labels_bucket(F.col("node"), n_buckets).alias("b"))
        .distinct().collect()})
    return (mirror.filter(F.col("node_bucket").isin(buckets))
            .select("node", "component"))


def _read_pending(spark: SparkSession, labels_path: str
                  ) -> tuple[DataFrame, DataFrame] | None:
    """The crash-recovery intent marker: the (relabel, new_rows) merge
    artifact persisted BEFORE any store write and deleted only after
    both stores are consistent. Present ⇒ a previous merge crashed
    mid-apply; replaying it (idempotent) heals both stores."""
    try:
        return (spark.read.parquet(f"{labels_path}/_pending/relabel"),
                spark.read.parquet(f"{labels_path}/_pending/new_rows"))
    except Exception:  # noqa: BLE001 — no pending merge
        return None


def _apply_merge(spark: SparkSession, labels_path: str,
                 relabel: DataFrame, new_rows: DataFrame,
                 n_buckets: int, fail_after: str | None = None,
                 counts: tuple[int, int] | None = None) -> int:
    """Apply a persisted (relabel, new_rows) merge artifact to BOTH
    stores — the comp-bucketed labels and the node-bucketed mirror —
    rewriting only affected partitions. IDEMPOTENT: replaying after a
    crash at any point converges (renames no-op once applied; the
    node-min dedup collapses a replayed new_rows union and any
    crash-window duplicate copies). Returns the number of labels
    partitions rewritten.

    ``fail_after`` is a test hook naming a crash point
    ('labels_overwrite' | 'labels_sweep' | 'mirror') — the heal tests
    inject real crashes instead of simulating them with file surgery.
    """
    import uuid

    from .indexes import _delete_path

    n_renames, n_new = counts if counts is not None else (
        relabel.count(), new_rows.count())
    if n_renames == 0 and n_new == 0:
        return 0
    bucket_rows = (
        relabel.select(_labels_bucket(F.col("_old"), n_buckets).alias("b"))
        .unionAll(relabel.select(
            _labels_bucket(F.col("_new"), n_buckets).alias("b")))
        .unionAll(new_rows.select(
            _labels_bucket(F.col("component"), n_buckets).alias("b")))
        .distinct().collect()
    )
    affected = sorted({int(r["b"]) for r in bucket_rows})
    # the rename table is bounded by 2x the new-edge count, but a huge
    # snapshot can push it past executor broadcast budgets — gate the
    # hint on the measured count (round-5 self-review); past the gate
    # AQE still broadcasts at runtime if the side turns out small
    _rl = F.broadcast(relabel) if n_renames <= 5_000_000 else relabel
    aff = (
        _labels_df(spark, labels_path)
        .filter(F.col("comp_bucket").isin(affected))
        .select("node", "component")
    )
    updated = (
        aff.join(_rl, F.col("component") == F.col("_old"), "left")
        .select("node", F.coalesce("_new", F.col("component"))
                .alias("component"))
        .unionByName(new_rows)
        # node-min dedup: heals crash-window duplicates (a node left in
        # two buckets by an interrupted overwrite — renames only ever
        # decrease) AND collapses a replayed new_rows union against
        # rows the crashed attempt already wrote; bounded by the slice
        .groupBy("node").agg(F.min("component").alias("component"))
        .select("node", "component",
                _labels_bucket(F.col("component"), n_buckets)
                .alias("comp_bucket"))
    )
    # two-phase write: materialize to _staging FIRST — overwriting
    # partitions while lazily reading them would race the scan against
    # the delete (on Iceberg this is one atomic MERGE, docs/CATALOG.md)
    staging = f"{labels_path}/_staging/{uuid.uuid4().hex}"
    # pre-partitioned staging → the overwrite lands ONE file per bucket
    # dir (see write_cluster_labels on why that matters)
    updated.repartition("comp_bucket") \
        .write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging).write.mode("overwrite") \
        .option("partitionOverwriteMode", "dynamic") \
        .partitionBy("comp_bucket").parquet(f"{labels_path}/labels")
    if fail_after == "labels_overwrite":
        raise RuntimeError("injected crash: labels_overwrite")
    # sweep EMPTIED buckets: dynamic overwrite replaces only partitions
    # present in the written data, so an affected bucket whose every
    # component was renamed away keeps its stale files unless deleted
    present = {int(r["comp_bucket"]) for r in spark.read
               .parquet(staging).select("comp_bucket")
               .distinct().collect()}
    for b in affected:
        if b not in present:
            _delete_path(spark, f"{labels_path}/labels/comp_bucket={b}")
    _delete_path(spark, f"{labels_path}/_staging")
    if fail_after == "labels_sweep":
        raise RuntimeError("injected crash: labels_sweep")

    # mirror apply: the nodes whose label changed are exactly the
    # members of the merge's target components (renames' _new sides +
    # new nodes' components) — read them partition-pruned from the
    # just-written labels, then rewrite only their node buckets. The
    # mirror never empties a bucket (nodes are never deleted), so no
    # sweep is needed on this side.
    new_comps = (
        relabel.select(F.col("_new").alias("_c"))
        .unionByName(new_rows.select(F.col("component").alias("_c")))
        .distinct()
    )
    _nc = (F.broadcast(new_comps)
           if n_renames + n_new <= 5_000_000 else new_comps)
    comp_buckets = sorted({
        int(r["b"]) for r in new_comps.select(
            _labels_bucket(F.col("_c"), n_buckets).alias("b"))
        .distinct().collect()})
    members = (
        _labels_df(spark, labels_path)
        .filter(F.col("comp_bucket").isin(comp_buckets))
        .join(_nc, F.col("component") == F.col("_c"), "left_semi")
        .select("node", "component")
        .persist()
    )
    node_buckets = sorted({
        int(r["b"]) for r in members.select(
            _labels_bucket(F.col("node"), n_buckets).alias("b"))
        .distinct().collect()})
    if node_buckets:
        mirror = _nodes_df(spark, labels_path)
        slice_df = (
            mirror.filter(F.col("node_bucket").isin(node_buckets))
            .select("node", "component")
            if mirror is not None
            else spark.createDataFrame([], "node long, component long"))
        updated_mirror = (
            slice_df.join(members, "node", "left_anti")
            .unionByName(members)
            .select("node", "component",
                    _labels_bucket(F.col("node"), n_buckets)
                    .alias("node_bucket"))
        )
        staging = f"{labels_path}/_staging/{uuid.uuid4().hex}"
        updated_mirror.repartition("node_bucket") \
            .write.mode("overwrite").parquet(staging)
        spark.read.parquet(staging).write.mode("overwrite") \
            .option("partitionOverwriteMode", "dynamic") \
            .partitionBy("node_bucket").parquet(f"{labels_path}/nodes")
        _delete_path(spark, f"{labels_path}/_staging")
    members.unpersist()
    if fail_after == "mirror":
        raise RuntimeError("injected crash: mirror")
    return len(affected)


def merge_labels_store(spark: SparkSession, labels_path: str,
                       new_edges: DataFrame, snapshot_id: str,
                       max_iterations: int = 25,
                       fail_after: str | None = None) -> dict:
    """Fold a snapshot's candidate edges into the persisted label store,
    rewriting ONLY the partitions that hold an affected component (in
    the comp-bucketed labels) or an affected node (in the node-keyed
    mirror) — per-ingest cost proportional to the touched clusters, not
    the accumulated corpus. Appends one lineage row (snapshot_id,
    n_renames, n_new_nodes, n_buckets_rewritten) under
    ``<path>/_lineage`` (idempotent per snapshot — dynamic overwrite).

    Round 6 closes the last history-proportional cost: the per-node
    label LOOKUP now reads the node-bucketed mirror pruned to the probe
    nodes' partitions (``_mirror_lookup``; PartitionFilters-asserted)
    instead of scanning every comp_bucket partition. Mirror and labels
    are kept consistent by an intent-marker protocol: the merge
    artifact (relabel + new_rows) is persisted to ``<path>/_pending``
    BEFORE any store write and deleted only after both stores are
    rewritten — a crash between store writes (mid labels overwrite,
    before the emptied-bucket sweep, mid mirror overwrite) leaves
    ``_pending`` in place, and the next merge replays it first
    (``_apply_merge`` is idempotent: applied renames no-op, the
    node-min dedup collapses duplicates). Known torn-commit window
    (ADVICE r6): a crash INSIDE a dynamic-partition-overwrite job
    commit — partition dir deleted, staged files not yet renamed —
    can lose that bucket's unaffected rows, and ``_pending`` (which
    carries only relabel + new_rows, not bucket slices) cannot restore
    them; a real table format's atomic MERGE closes this
    (docs/CATALOG.md). Recovery contract for every other failure
    point: re-run the same snapshot's merge — or any later merge;
    healing is unconditional on entry. Pinned by
    tests/test_incremental.py::test_merge_labels_store_heals_injected_crashes.
    """
    from .indexes import _delete_path

    meta = spark.read.parquet(f"{labels_path}/_meta").collect()[0]
    n_buckets = int(meta["n_buckets"])
    pending = _read_pending(spark, labels_path)
    if pending is not None:
        _apply_merge(spark, labels_path, *pending, n_buckets)
        _delete_path(spark, f"{labels_path}/_pending")
    stored = _mirror_lookup(spark, labels_path, (
        new_edges.select(F.col("id_a").alias("node"))
        .unionAll(new_edges.select(F.col("id_b").alias("node")))
        .distinct()), n_buckets)
    relabel, new_rows, cur = _cluster_merge_mapping(stored, new_edges,
                                                    max_iterations)
    relabel.write.mode("overwrite") \
        .parquet(f"{labels_path}/_pending/relabel")
    new_rows.write.mode("overwrite") \
        .parquet(f"{labels_path}/_pending/new_rows")
    cur.unpersist()
    pend_rl = spark.read.parquet(f"{labels_path}/_pending/relabel")
    pend_nr = spark.read.parquet(f"{labels_path}/_pending/new_rows")
    n_renames = pend_rl.count()
    n_new = pend_nr.count()
    n_rewritten = _apply_merge(spark, labels_path, pend_rl, pend_nr,
                               n_buckets, fail_after=fail_after,
                               counts=(n_renames, n_new))
    _delete_path(spark, f"{labels_path}/_pending")
    row = {"snapshot_id": snapshot_id, "n_renames": int(n_renames),
           "n_new_nodes": int(n_new), "n_buckets_rewritten": n_rewritten}
    spark.createDataFrame(
        [(row["n_renames"], row["n_new_nodes"],
          row["n_buckets_rewritten"], snapshot_id)],
        "n_renames long, n_new_nodes long, n_buckets_rewritten long, "
        "snapshot_id string",
    ).write.mode("overwrite") \
        .option("partitionOverwriteMode", "dynamic") \
        .partitionBy("snapshot_id").parquet(f"{labels_path}/_lineage")
    return row


# ---------------------------------------------------------------------------
# Composed longitudinal ingest (round 5): the full loop — band the
# snapshot, candidate-join it against stored history, fold the edges
# into the persisted cluster labels — as one idempotent step, callable
# from a batch scheduler or a Structured Streaming foreachBatch sink.
# ---------------------------------------------------------------------------


def init_labels_store(spark: SparkSession, labels_path: str,
                      n_buckets: int = LABELS_N_BUCKETS_DEFAULT) -> None:
    """Bootstrap an EMPTY label store (idempotent: an existing store is
    left untouched — its pinned bucket modulus must not be clobbered)."""
    try:
        spark.read.parquet(f"{labels_path}/_meta").collect()
        return
    except Exception:  # noqa: BLE001 — no store yet
        pass
    write_cluster_labels(
        spark.createDataFrame([], "node long, component long"),
        labels_path, n_buckets)


def ingest_snapshot(docs: DataFrame, index_path: str, labels_path: str,
                    snapshot_id: str, id_col: str = "doc_id",
                    text_col: str = "text", num_hashes: int = 8,
                    rows_per_band: int = 2, k: int = 3,
                    max_bucket_size: int | None = None) -> dict:
    """One longitudinal-dedup ingest step: band ``docs`` into the index
    under ``snapshot_id``, candidate-join against all PRIOR snapshots
    (history text never rescanned), fold the resulting edges into the
    persisted cluster labels. Returns
    ``{snapshot_id, n_bands, n_pairs, n_renames, n_new_nodes}``.

    Idempotent end-to-end, so a foreachBatch re-delivery (or a crashed
    batch re-run) converges instead of corrupting: the band-index write
    replaces the snapshot's partition (dynamic overwrite), the
    candidate join excludes the snapshot's own stored bands, and
    re-merging edges the labels already reflect is a no-op (pinned by
    tests). Every piece is proportional to the SNAPSHOT, not the
    accumulated corpus — the property a continuous ingest needs.
    """
    from .indexes import index_scope

    spark = docs.sparkSession
    init_labels_store(spark, labels_path)
    # every action completes inside this function, so the band tables
    # cap_buckets persists are scope-released here — without the scope a
    # foreachBatch sink leaks one persisted table per micro-batch
    with index_scope():
        n_bands = write_band_index(docs, index_path, snapshot_id, id_col,
                                   text_col, num_hashes, rows_per_band, k)
        pairs = incremental_candidates(
            docs, index_path, snapshot_id, id_col, text_col, num_hashes,
            rows_per_band, k, max_bucket_size).persist()
        n_pairs = pairs.count()
        row = merge_labels_store(spark, labels_path,
                                 pairs.select("id_a", "id_b"), snapshot_id)
        pairs.unpersist()
    return {"snapshot_id": snapshot_id, "n_bands": int(n_bands),
            "n_pairs": int(n_pairs), "n_renames": row["n_renames"],
            "n_new_nodes": row["n_new_nodes"]}


def streaming_ingest(doc_stream: DataFrame, index_path: str,
                     labels_path: str, checkpoint: str,
                     prefix: str = "batch", **ingest_kwargs):
    """Streaming face of the longitudinal loop: every micro-batch runs
    :func:`ingest_snapshot` inside ``foreachBatch`` with a
    deterministic per-batch snapshot id, so the stored index / label
    store / lineage grow one snapshot per batch and a re-delivered
    batch id lands idempotently (Spark's foreachBatch is
    at-least-once; the snapshot-partition overwrite + no-op re-merge
    make the step effectively exactly-once). Reading the stored index
    INSIDE the batch function also sidesteps the pinned-file-listing
    caveat of the stream-static join (`streaming_band_candidates`):
    each batch lists the index fresh and sees every prior snapshot.

    Returns the unstarted ``DataStreamWriter`` (caller picks trigger /
    start, same convention as the other streaming builders)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        ingest_snapshot(batch_df, index_path, labels_path,
                        f"{prefix}-{batch_id:08d}", **ingest_kwargs)

    return (
        doc_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
    )
