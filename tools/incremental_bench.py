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

        out[f"hist_{mult}x"] = {
            "n_history_docs": n_hist, "n_bands": n_bands,
            "index_write_sec": round(t_index, 2),
            "incremental_sec": round(t_inc, 2),
            "full_rededup_sec": round(t_full, 2),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
