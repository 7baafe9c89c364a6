"""Incremental-dedup cost evidence: deduping a NEW snapshot against a
stored band index must cost ~independent of history size, while full
re-candidate-generation grows with it — the property that keeps a
100 TB pipeline's ingestion cost linear in the ingest, not the corpus.

Method: history corpora of 1× and 4× the sf0.1 documents table
(shift-union replication with DISTINCT texts via a doc_id suffix so
replicas don't near-dup each other); a fixed 500-doc new snapshot with
50 planted dups of history docs. Timed, warm, per history size:

* full:        minhash_candidates(history ∪ new)    — rescans history
* incremental: incremental_candidates(new, index)   — index join only

The index write is timed separately (it is the once-per-snapshot
amortized artifact, not the per-ingest cost). One JSON line out.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from icdar_2019_rrc_sroie_spark.operators.dedup import (  # noqa: E402
    minhash_candidates,
)
from icdar_2019_rrc_sroie_spark.operators.incremental import (  # noqa: E402
    incremental_candidates,
    write_band_index,
)
from icdar_2019_rrc_sroie_spark.operators.indexes import (  # noqa: E402
    release_indexes,
)
from icdar_2019_rrc_sroie_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("incremental-bench")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")

    def history(mult: int):
        parts = [docs.select(
            (F.col("doc_id") + 1_000_000 * i).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" v{i}")).alias("text"))
            for i in range(mult)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    new_docs = docs.filter(F.col("doc_id") < 450).select(
        (F.col("doc_id") + 50_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" brandnew")).alias("text"),
    ).unionByName(docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 60_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" v0")).alias("text")))  # dups of v0

    mults = tuple(int(x) for x in
                  (sys.argv[1] if len(sys.argv) > 1 else "1,4").split(","))
    out: dict = {}
    for mult in mults:
        hist = history(mult)
        n_hist = hist.count()
        idx = f"/dev/shm/inc_bench_idx_{mult}"

        t0 = time.perf_counter()
        n_bands = write_band_index(hist, idx, "hist", num_hashes=4)
        t_index = time.perf_counter() - t0

        for timed in (False, True):  # warm then measure
            t0 = time.perf_counter()
            materialize(incremental_candidates(new_docs, idx, "new",
                                               num_hashes=4))
            t_inc = time.perf_counter() - t0
            release_indexes()

        for timed in (False, True):
            t0 = time.perf_counter()
            materialize(minhash_candidates(hist.unionByName(new_docs),
                                           num_hashes=4))
            t_full = time.perf_counter() - t0
            release_indexes()

        # round 5: cluster-label maintenance — fold the new snapshot's
        # candidate edges into a persisted label store (contracted-edge
        # fixpoint + affected-partition rewrite) vs recomputing
        # connected components over ALL accumulated edges
        from icdar_2019_rrc_sroie_spark.operators.dedup import (
            connected_components,
        )
        from icdar_2019_rrc_sroie_spark.operators.incremental import (
            merge_labels_store,
            write_cluster_labels,
        )

        hist_edges = minhash_candidates(hist, num_hashes=4).persist()
        hist_edges.count()
        labels = connected_components(hist_edges).persist()
        store = f"/dev/shm/inc_bench_labels_{mult}"
        write_cluster_labels(labels, store, n_buckets=64)
        new_edges = incremental_candidates(new_docs, idx, "new",
                                           num_hashes=4) \
            .select("id_a", "id_b").persist()
        new_edges.count()
        release_indexes()
        # warm the merge path on a throwaway store clone (a re-merge on
        # the real store would be an idempotent no-op, not comparable)
        warm_store = f"/dev/shm/inc_bench_labels_warm_{mult}"
        write_cluster_labels(labels, warm_store, n_buckets=64)
        merge_labels_store(spark, warm_store, new_edges, "warm")
        release_indexes()
        # BULK regime: a full-size snapshot brings hundreds of new
        # nodes whose fresh components hash across every bucket, so
        # the partition-scoped rewrite degenerates to ~the whole store
        # — recorded honestly (buckets_rewritten shows it); the win
        # over recompute here is not having to keep/rescan the global
        # edge set
        t0 = time.perf_counter()
        merge_row = merge_labels_store(spark, store, new_edges, "new")
        t_merge = time.perf_counter() - t0
        # MAINTENANCE regime (the flat-in-history property): a trickle
        # of cross-cluster candidate edges between EXISTING nodes —
        # the rewrite touches only the affected components' buckets,
        # independent of store size, while a recompute still pays for
        # every accumulated edge
        maint_nodes = [r["node"] for r in
                       labels.orderBy("node").limit(20).collect()]
        maint_edges = spark.createDataFrame(
            list(zip(maint_nodes[0::2], maint_nodes[1::2])),
            "id_a long, id_b long")
        # 256 buckets: a store sized so a trickle merge touches a small
        # FRACTION of partitions (with 64 buckets, 20 components
        # already hit half of them — the rewrite then scales with the
        # store and hides the flat-cost property being measured)
        maint_store = f"/dev/shm/inc_bench_labels_maint_{mult}"
        write_cluster_labels(labels, maint_store, n_buckets=256)
        t0 = time.perf_counter()
        maint_row = merge_labels_store(spark, maint_store, maint_edges,
                                       "maint")
        t_maint = time.perf_counter() - t0
        labels.unpersist()
        all_edges = hist_edges.unionByName(new_edges)
        t0 = time.perf_counter()
        materialize(connected_components(all_edges))
        t_full_cc = time.perf_counter() - t0
        hist_edges.unpersist()
        new_edges.unpersist()
        release_indexes()

        out[f"hist_{mult}x"] = {
            "n_history_docs": n_hist, "n_bands": n_bands,
            "index_write_sec": round(t_index, 2),
            "incremental_sec": round(t_inc, 2),
            "full_rededup_sec": round(t_full, 2),
            "label_merge_bulk_sec": round(t_merge, 2),
            "bulk_buckets_rewritten": merge_row["n_buckets_rewritten"],
            "label_merge_maint_sec": round(t_maint, 2),
            "maint_buckets_rewritten": maint_row["n_buckets_rewritten"],
            "full_cc_recompute_sec": round(t_full_cc, 2),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
