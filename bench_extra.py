"""Round-7 profiling harness (guide §1.4): per-entry noop-sink timing,
job counts and ``explain("formatted")`` capture — SEPARATE from the
frozen ``bench.py`` (the driver's artifact). Usage:

    python bench_extra.py q1 q2 ...      # time the named entries
    python bench_extra.py --all          # every entry
    python bench_extra.py --explain q1   # also dump plans/r07/<q>_<tag>.txt

Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as bench.py; PLAN_TAG
controls the plans/r07 suffix (default "before").

Each entry is timed ``--repeat`` times (default 3) with a CPU
calibration sample before/after so host-contention windows are visible
next to every number (BASELINE.md "Measurement-window sensitivity").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import cpu_calibration, materialize  # noqa: E402
from icdar_2019_rrc_sroie_spark import queries as q  # noqa: E402
from icdar_2019_rrc_sroie_spark.fixtures import transcripts_df  # noqa: E402
from icdar_2019_rrc_sroie_spark.operators.indexes import (  # noqa: E402
    release_indexes,
)
from icdar_2019_rrc_sroie_spark.plans.extraction import (  # noqa: E402
    extract_spans,
)
from icdar_2019_rrc_sroie_spark.session import get_spark  # noqa: E402


def _registry(spark, sf_dir):
    """name -> thunk returning the DataFrame to materialize (inputs
    prepared OUTSIDE the timed region exactly as bench.py does)."""
    from pyspark.sql import functions as F

    from icdar_2019_rrc_sroie_spark.queries import q_mean_std
    from icdar_2019_rrc_sroie_spark.queries_dedup import (
        q_ann_bucketed,
        q_cosine_topk,
    )
    from icdar_2019_rrc_sroie_spark.queries_geo import q_iou_pairs

    reg = dict(q.queries())
    reg.update({"mean_std": q_mean_std, "iou_pairs": q_iou_pairs,
                "cosine_topk": q_cosine_topk, "ann_bucketed": q_ann_bucketed})
    out = {name: (lambda fn=fn: fn(spark, sf_dir)) for name, fn in reg.items()}

    # flagship (cached corpus, as bench.py's warm entry)
    state: dict = {}

    def _flagship():
        if "tr" not in state:
            state["tr"] = transcripts_df(
                spark, n_convs=max(200, int(60_000 * 0.1))).cache()
            state["tr"].count()
        return extract_spans(state["tr"])

    out["transcript_spans"] = _flagship

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    from icdar_2019_rrc_sroie_spark.operators.bpe import (
        bpe_profile,
        train_merges_distributed,
    )
    from icdar_2019_rrc_sroie_spark.operators.dedup import (
        connected_components,
        decontaminate,
        dedup_spans,
        minhash_candidates,
    )
    from icdar_2019_rrc_sroie_spark.operators.dsir import dsir_select
    from icdar_2019_rrc_sroie_spark.operators.quality_clf import (
        quality_classify,
    )
    from icdar_2019_rrc_sroie_spark.operators.quality_train import (
        train_quality_distributed,
    )
    from icdar_2019_rrc_sroie_spark.queries import (
        _reading_points,
        q_doc_text_profile_core,
    )
    from icdar_2019_rrc_sroie_spark.operators.ordering import reading_order

    out["doc_text_profile"] = lambda: q_doc_text_profile_core(spark, sf_dir)
    out["decontaminate"] = lambda: decontaminate(
        docs, docs.filter(F.col("doc_id") % 97 == 3)
        .select(F.col("doc_id").alias("qid"), "text"), k=8)
    out["reading_order"] = lambda: reading_order(
        _reading_points(spark, sf_dir).filter(F.col("doc_id") % 5 == 0))
    out["dedup_spans"] = lambda: dedup_spans(docs, k=30, window=8)
    out["bpe_tokenize"] = lambda: bpe_profile(docs)
    out["quality_classify"] = lambda: quality_classify(docs)
    out["dsir_threshold"] = lambda: dsir_select(
        docs, docs.filter(F.col("lang") == "en"),
        n_keep=int(0.6 * docs.count()), alpha=0.05, mode="threshold")

    def with_dups(d):
        return d.select("doc_id", "text").unionByName(
            d.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text"))

    corpus = with_dups(docs.filter("doc_id < 6000"))
    out["minhash_candidates"] = lambda: minhash_candidates(
        corpus, num_hashes=4, rows_per_band=2, max_bucket_size=200)

    def _clusters():
        cands = minhash_candidates(corpus, num_hashes=4, rows_per_band=2,
                                   max_bucket_size=200)
        return connected_components(cands)

    out["dedup_clusters"] = _clusters

    # trainer entries are timed as side-effecting calls
    out["bpe_train_m6"] = ("call", lambda: train_merges_distributed(docs, 6))
    out["quality_train_e4"] = (
        "call", lambda: train_quality_distributed(docs, epochs=4))
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_explain = "--explain" in sys.argv
    do_all = "--all" in sys.argv
    repeat = 3
    for a in sys.argv[1:]:
        if a.startswith("--repeat="):
            repeat = int(a.split("=")[1])
    tag = os.environ.get("PLAN_TAG", "before")
    spark = get_spark("bench_extra")
    spark.sparkContext.setLogLevel("ERROR")
    reg = _registry(spark, sf_dir)
    names = list(reg) if do_all else args
    results = {}
    for name in names:
        ent = reg[name]
        is_call = isinstance(ent, tuple)
        thunk = ent[1] if is_call else ent
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if do_explain and not is_call:
            os.makedirs("plans/r07", exist_ok=True)
            df = thunk()
            txt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(f"plans/r07/{name}_{tag}.txt", "w") as f:
                f.write(txt)
            release_indexes()
        times = []
        c0 = cpu_calibration()
        tracker = spark.sparkContext.statusTracker()
        jobs_before = len(tracker.getJobIdsForGroup(None) or [])
        for _ in range(repeat):
            t0 = time.perf_counter()
            if is_call:
                thunk()
            else:
                materialize(thunk())
            times.append(round(time.perf_counter() - t0, 3))
            release_indexes()
        jobs_after = len(tracker.getJobIdsForGroup(None) or [])
        c1 = cpu_calibration()
        results[name] = {
            "times": times, "min": min(times), "calib": [c0, c1],
            "jobs_total": jobs_after - jobs_before,
        }
        print(json.dumps({name: results[name]}), flush=True)
    print("SUMMARY " + json.dumps(results))


if __name__ == "__main__":
    main()
