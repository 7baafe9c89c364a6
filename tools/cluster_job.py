"""Multi-process execution evidence job (submitted via spark-submit
--py-files under ``local-cluster[N,4,4096]`` — real worker JVMs, real
serialization/broadcast across process boundaries, unlike local[K]
threads). Runs the three seams the round-3 verdict called out:

1. flagship transcript extraction (Arrow kernels + window exchange),
   timed best-of-2 after a warm-up — the throughput number used for
   the N→4N executor scaling-efficiency evidence;
2. connected components in reliable-checkpoint mode (parquet label
   round-trips on a shared FS, the path real clusters take);
3. decontaminate (driver-collected broadcast semi-join of eval k-gram
   hashes against executor-side corpus scans).

Prints one JSON line. Usage:
    spark-submit --master local-cluster[N,4,4096] \
        --py-files dist/icdar_2019_rrc_sroie_spark.zip \
        tools/cluster_job.py <corpus_parquet> <scratch_dir>
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(corpus_path: str, scratch: str) -> None:
    spark = SparkSession.builder.appName("cluster-evidence").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from icdar_2019_rrc_sroie_spark.operators.dedup import (
        connected_components,
        decontaminate,
    )
    from icdar_2019_rrc_sroie_spark.operators.indexes import release_indexes
    from icdar_2019_rrc_sroie_spark.plans.extraction import extract_spans

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    n_execs = spark.sparkContext.getConf().get("spark.master")
    out: dict = {"master": n_execs}

    # 1. flagship
    transcripts = spark.read.parquet(corpus_path)
    out["n_turns"] = transcripts.count()
    materialize(extract_spans(transcripts))  # warm (codegen + python workers)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        materialize(extract_spans(transcripts))
        best = min(best, time.perf_counter() - t0)
    out["flagship_sec"] = round(best, 3)
    out["flagship_tps"] = round(out["n_turns"] / best, 1)

    # 2. CC, reliable checkpoints on the shared scratch FS: 10-node
    # star clusters + a diameter-12 chain (forces multi-round fixpoint)
    spark.sparkContext.setCheckpointDir(f"{scratch}/cc_ckpt")
    stars = (
        spark.range(100_000)
        .select(F.col("id").alias("id_a"),
                ((F.col("id") / 10).cast("long") * 10).alias("id_b"))
        .filter(F.col("id_a") != F.col("id_b"))
    )
    chain = spark.range(12).select(
        (F.col("id") + 1_000_000).alias("id_a"),
        (F.col("id") + 1_000_001).alias("id_b"))
    t0 = time.perf_counter()
    cc = connected_components(stars.unionByName(chain))
    n_comp = cc.select("component").distinct().count()
    out["cc_sec"] = round(time.perf_counter() - t0, 3)
    out["cc_components"] = n_comp
    assert n_comp == 10_000 + 1, n_comp
    release_indexes()

    # 3. broadcast-heavy decontaminate over a synthetic 100k-doc corpus
    tok = [F.substring(F.md5(((F.col("id") + 13) * (j + 7))
                             .cast("string")), 1, 6) for j in range(20)]
    docs = spark.range(100_000).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *tok).alias("text"))
    eval_set = docs.filter(F.col("doc_id") % 97 == 3) \
        .select(F.col("doc_id").alias("qid"), "text")
    t0 = time.perf_counter()
    hits = decontaminate(docs, eval_set, k=8)
    out["decontaminate_hits"] = hits.count()
    out["decontaminate_sec"] = round(time.perf_counter() - t0, 3)
    # every eval doc shares its own 8-grams -> ≥ the eval-set size
    assert out["decontaminate_hits"] >= 1030, out["decontaminate_hits"]

    # 4. distributed quality training under REAL executor JVMs
    # (round 6): per-example int64-nano gradient quantization must
    # make the job bit-identical across partitionings when the Arrow
    # kernel runs in separate executor python workers — the
    # serialization seam the local[n] tests can't see
    from icdar_2019_rrc_sroie_spark.operators.quality_train import (
        train_quality_distributed,
    )

    tdocs = docs.filter(F.col("doc_id") < 2_000)
    t0 = time.perf_counter()
    pay_a = train_quality_distributed(tdocs.repartition(3), epochs=3)
    pay_b = train_quality_distributed(tdocs.repartition(11), epochs=3)
    release_indexes()
    out["trainer_sec"] = round(time.perf_counter() - t0, 3)
    assert pay_a == pay_b, "trainer not partitioning-invariant on cluster"
    curve = pay_a["loss_curve_micro"]
    assert curve == sorted(curve, reverse=True), curve
    out["trainer_loss_curve_micro"] = curve
    out["trainer_invariant"] = True

    print("CLUSTER_EVIDENCE " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
