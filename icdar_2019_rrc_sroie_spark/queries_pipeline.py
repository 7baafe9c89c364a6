"""Query battery, batch 4: pipeline-level operators whose kernels are
sequential per-document (applyInPandas) — recorded as rows-only checks
by the driver; their exact semantics are pytest-verified against NumPy
oracles (tests/test_detection.py, tests/test_deteval.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.detection_kernels import nms_per_doc
from .operators.geometry import anchor_grid
from .operators.sinks import detection_submission, entity_submission
from .eval.deteval import deteval_corpus, deteval_per_doc
from .plans.detection import detect_text_lines


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _proposals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic per-doc proposals from lineitem keys (deterministic)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        F.concat(F.lit("doc"), (F.col("l_orderkey") % 200)).alias("doc_id"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("proposal_id"),
        ((F.col("l_partkey") % 30) * 16.0).alias("xmin"),
        ((F.col("l_suppkey") % 25) * 16.0).alias("ymin"),
        ((F.col("l_partkey") % 30) * 16.0 + 15.0).alias("xmax"),
        ((F.col("l_suppkey") % 25) * 16.0 + 12.0
         + (F.col("l_orderkey") % 7).cast("double")).alias("ymax"),
        ((F.col("l_extendedprice") % 1000) / 1000.0).alias("score"),
    )


def q_nms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return nms_per_doc(_proposals(spark, sf_dir), 0.3) \
        .orderBy("doc_id", "pick_order")


def q_detection_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    anchors = anchor_grid(spark, feat_h=8, feat_w=16, heights=(11, 15, 22))
    preds = li.crossJoin(F.broadcast(anchors.select("anchor_id"))).select(
        F.concat(F.lit("doc"), (F.col("l_orderkey") % 40)).alias("doc_id"),
        "anchor_id",
        F.lit(0.0).alias("vc"),
        F.lit(0.0).alias("vh"),
        F.when(
            F.pmod(F.xxhash64("l_orderkey", "anchor_id"), 100) < 4,
            F.lit(0.95),
        ).otherwise(F.lit(0.1)).alias("score"),
    ).groupBy("doc_id", "anchor_id").agg(
        F.max("vc").alias("vc"), F.max("vh").alias("vh"),
        F.max("score").alias("score"),
    )
    return detect_text_lines(preds, anchors, img_w=256.0, img_h=128.0) \
        .orderBy("doc_id", "line_id")


def q_deteval(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    gt = li.filter(F.col("l_linenumber") <= 3).select(
        F.concat(F.lit("doc"), (F.col("l_orderkey") % 300)).alias("doc_id"),
        F.col("l_linenumber").alias("gt_id"),
        ((F.col("l_partkey") % 20) * 20.0).alias("xmin"),
        ((F.col("l_linenumber") % 6) * 25.0).alias("ymin"),
        ((F.col("l_partkey") % 20) * 20.0 + 90.0).alias("xmax"),
        ((F.col("l_linenumber") % 6) * 25.0 + 18.0).alias("ymax"),
        (F.col("l_partkey") % 17 == 0).alias("dontcare"),
    ).dropDuplicates(["doc_id", "gt_id"])
    det = gt.filter(~F.col("dontcare") | (F.col("gt_id") % 2 == 0)).select(
        "doc_id", F.col("gt_id").alias("det_id"),
        (F.col("xmin") + 2.0).alias("xmin"), (F.col("ymin") + 1.0).alias("ymin"),
        (F.col("xmax") + 2.0).alias("xmax"), (F.col("ymax") + 1.0).alias("ymax"),
    )
    per_doc = deteval_per_doc(gt, det)
    return deteval_corpus(per_doc).select(
        F.floor(F.col("recall") * 1e6 + 0.5).cast("long").alias("recall_micro"),
        F.floor(F.col("precision") * 1e6 + 0.5).cast("long").alias("precision_micro"),
        F.floor(F.col("hmean") * 1e6 + 0.5).cast("long").alias("hmean_micro"),
    )


def q_detection_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    survivors = nms_per_doc(_proposals(spark, sf_dir), 0.3)
    lines = survivors.select(
        "doc_id", F.col("pick_order").alias("line_id"),
        "xmin", "ymin", "xmax", "ymax", "score")
    return detection_submission(lines).orderBy("doc_id")


def q_entity_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .fixtures import transcripts_df
    from .plans.extraction import extract_spans

    spans = extract_spans(transcripts_df(spark, n_convs=40, seed=42))
    return entity_submission(spans).orderBy("conv_id", "turn_idx")


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import decode_and_featurize

    docs = _t(spark, sf_dir, "documents").limit(200)
    media = docs.select(
        F.concat(F.lit("m"), F.col("doc_id")).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.substring("text", 1, 64), "UTF-8").alias("payload"),
        F.struct(
            F.lit(16).alias("width"), F.lit(8).alias("height"),
            F.lit(3).alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )
    feats = decode_and_featurize(media)
    # Serialize the array<float> feature column (lists are unhashable in
    # the driver's pandas canonicalizer); round to 6dp for stable hashing.
    return feats.select(
        "media_id", "kind", "decoded_bytes",
        F.round("mean_intensity", 6).alias("mean_intensity"),
        F.to_json(
            F.transform("feature", lambda x: F.round(x.cast("double"), 6))
        ).alias("feature"),
    ).orderBy("media_id")


def q_anchor_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2/F4/F5: anchor↔gt matching over synthetic layouts (exact
    semantics pytest-verified against a NumPy oracle)."""
    from .operators.geometry import anchor_grid
    from .operators.matching import match_anchors

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 200 == 0)
    anchors = anchor_grid(spark, feat_h=6, feat_w=8, heights=(11, 15, 22, 32))
    gt = li.select(
        F.concat(F.lit("doc"), (F.col("l_orderkey") % 60)).alias("doc_id"),
        F.col("l_linenumber").alias("gt_id"),
        ((F.col("l_partkey") % 6) * 16.0).alias("xmin"),
        ((F.col("l_suppkey") % 5) * 16.0).alias("ymin"),
        ((F.col("l_partkey") % 6) * 16.0 + 47.0).alias("xmax"),
        ((F.col("l_suppkey") % 5) * 16.0 + 14.0).alias("ymax"),
    ).dropDuplicates(["doc_id", "gt_id"])
    out = match_anchors(anchors, gt, img_w=128.0, img_h=96.0)
    return out.filter(F.col("label") >= 0).orderBy("doc_id", "anchor_id")


def q_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over the embeddings table: sampled k-means index +
    nprobe=2 probe (exactness vs brute force pytest-verified)."""
    from .operators.similarity import ivf_topk, train_centroids

    emb = _t(spark, sf_dir, "embeddings")
    cents = train_centroids(emb, k=8, iters=5, sample_size=2000)
    query = emb.filter(F.col("vec_id") == 0).select("embedding") \
        .collect()[0][0]
    return ivf_topk(emb, cents, list(query), k=20, nprobe=2)


def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit signatures, 4×16-bit pigeonhole words (65k buckets per
    word — candidate count stays ~linear in corpus size), bucket guard
    against degenerate buckets."""
    from .operators.dedup import simhash_near_dups

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text").unionByName(
        docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text"))
    return simhash_near_dups(
        corpus, max_hamming=3, num_bits=64, n_words=4, max_bucket_size=200
    ).orderBy("id_a", "id_b")


ROWS_ONLY_QUERIES = {
    "anchor_matching": (q_anchor_matching, None),
    "ivf_ann": (q_ivf_ann, None),
    "simhash_near_dups": (q_simhash_near_dups, None),
    "nms": (q_nms, None),
    "detection_pipeline": (q_detection_pipeline, None),
    "deteval_corpus": (q_deteval, None),
    "detection_sink": (q_detection_sink, None),
    "entity_sink": (q_entity_sink, None),
    "multimodal_features": (q_multimodal_features, None),
}
