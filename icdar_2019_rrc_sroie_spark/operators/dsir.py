"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) re-expressed Spark-first.

The published recipe for "pick raw-corpus documents that look like the
target domain": fit two bag-of-hashed-ngrams unigram models (target
distribution p, raw distribution q), weight every document by its
importance ``log p(x) - log q(x)`` under those models, and resample
without replacement via Gumbel top-k — which is exactly sampling
proportional to the importance weights.

Spark shape: the hashed-ngram feature space is a FIXED, small bucket
vocabulary (``n_buckets``, default 8192), so both distributions reduce
to one hash-aggregate each and the per-bucket log-ratio table is a
broadcast dim — scoring a 100 TB raw corpus is one explode + one
broadcast join + one hash agg, no shuffle wider than (doc, bucket).
Everything is engine-portable determinism: md5 bucket hashing, log
ratios quantized to integer micros per bucket BEFORE the per-doc sum
(order-free integer arithmetic — the lm_logprob discipline), and the
Gumbel noise derived from an md5 of the doc id rather than RNG state,
so the selected set is reproducible at any parallelism and replayable
by the DuckDB oracle.

No counterpart in the reference (its dataset is curated by hand);
this is a training-data-pipeline mandate operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_text, word_shingles

DSIR_N_BUCKETS_DEFAULT = 8192


def _bucket(gram: Column, n_buckets: int) -> Column:
    """Engine-portable hash bucket of an n-gram (md5 hex prefix)."""
    return (F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
            % n_buckets)


def hashed_ngram_counts(df: DataFrame, n_buckets: int = DSIR_N_BUCKETS_DEFAULT,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 2) -> DataFrame:
    """(id, bucket, cnt): per-document hashed word-``n``-gram counts —
    the DSIR feature map. Unigrams fall back to the plain token split
    (word_shingles needs ≥ n tokens); occurrences are counted, not
    deduped (the models are unigram-over-features)."""
    from .dedup import ensure_parallelism

    # spread the narrow scan before the CPU-heavy shingle+md5 explode
    # (r7: same 2-task-scan bottleneck as the quality featurizer; the
    # downstream aggregates are order-free)
    df = ensure_parallelism(df)
    if n == 1:
        grams = df.select(
            F.col(id_col),
            F.explode(F.split(normalized_text(F.col(text_col)), " "))
            .alias("_g"))
        grams = grams.filter(F.length("_g") > 0)
    else:
        grams = df.select(
            F.col(id_col),
            F.explode(word_shingles(F.col(text_col), n)).alias("_g"))
    return (grams
            .select(F.col(id_col), _bucket(F.col("_g"), n_buckets)
                    .alias("bucket"))
            .groupBy(id_col, "bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt")))


def dsir_log_weights(target_counts: DataFrame, raw_counts: DataFrame,
                     n_buckets: int = DSIR_N_BUCKETS_DEFAULT,
                     alpha: float = 1.0) -> DataFrame:
    """Per-bucket importance log-ratio table: ``w_b = log p_t(b) -
    log p_r(b)`` with add-``alpha`` smoothing over the fixed bucket
    space, quantized to integer micros (``w_micro``). Both inputs are
    :func:`hashed_ngram_counts` outputs; the result has AT MOST
    ``n_buckets`` rows — broadcast it. Buckets unseen in both corpora
    get weight ``log(T_r+aB) - log(T_t+aB)`` like any other unseen
    bucket mass, but are irrelevant: scoring joins on observed grams
    only."""
    t = target_counts.groupBy("bucket").agg(F.sum("cnt").alias("tc"))
    r = raw_counts.groupBy("bucket").agg(F.sum("cnt").alias("rc"))
    tot = (t.agg(F.sum("tc").cast("double").alias("tt"))
           .crossJoin(r.agg(F.sum("rc").cast("double").alias("rt"))))
    ab = float(alpha) * n_buckets
    joined = (t.join(r, "bucket", "full")
              .select("bucket",
                      F.coalesce("tc", F.lit(0)).alias("tc"),
                      F.coalesce("rc", F.lit(0)).alias("rc"))
              .crossJoin(F.broadcast(tot)))
    w = (F.log((F.col("tc") + F.lit(float(alpha)))
               / (F.col("tt") + F.lit(ab)))
         - F.log((F.col("rc") + F.lit(float(alpha)))
                 / (F.col("rt") + F.lit(ab))))
    return joined.select(
        "bucket", F.floor(w * 1e6 + F.lit(0.5)).cast("long")
        .alias("w_micro"))


def dsir_scores(raw_counts: DataFrame, weights: DataFrame,
                id_col: str = "doc_id") -> DataFrame:
    """(id, n_grams, score_micro): summed per-gram importance
    log-ratio per document — exact integer arithmetic (counts ×
    micro-quantized weights), so the score is identical at any
    partitioning and in the oracle. ``weights`` is the (≤ n_buckets)
    :func:`dsir_log_weights` table, broadcast."""
    return (raw_counts.join(F.broadcast(weights), "bucket")
            .groupBy(id_col)
            .agg(F.sum("cnt").cast("long").alias("n_grams"),
                 F.sum(F.col("cnt") * F.col("w_micro")).cast("long")
                 .alias("score_micro")))


def gumbel_micro(id_col: Column, seed: str = "dsir") -> Column:
    """Deterministic Gumbel(0,1) noise in integer micros from an md5 of
    the id — ``-log(-log(u))`` with ``u = (h + 0.5) / 2^32`` uniform on
    (0,1). RNG-free: reproducible across runs, partitionings, engines."""
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(seed), id_col.cast("string"))), 1, 8),
        16, 10).cast("double")
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    return F.floor(-F.log(-F.log(u)) * 1e6 + F.lit(0.5)).cast("long")


DSIR_EXACT_CUTOFF_DEFAULT = 100_000


def dsir_resample(scores: DataFrame, n_keep: int,
                  id_col: str = "doc_id", temperature: float = 1.0,
                  seed: str = "dsir", mode: str = "auto",
                  exact_cutoff: int = DSIR_EXACT_CUTOFF_DEFAULT,
                  rel_err: float = 1e-4) -> DataFrame:
    """Gumbel top-k selection: keep the ``n_keep`` documents with the
    largest ``score/temperature + gumbel`` — equivalent to sampling
    without replacement proportionally to ``exp(score/temperature)``
    (the DSIR paper's resampling step). Deterministic ties broken by
    id. Output: (id, n_grams, score_micro, gumbel_micro, sel_micro)
    for the selected rows — the SAME set in every mode.

    Two physical strategies (``mode``: 'exact' | 'threshold' |
    'auto' = threshold above ``exact_cutoff``):

    * **exact** — global ``orderBy().limit(n_keep)``: TakeOrdered runs
      per-partition top-k plus a driver-side reduce of k-row heads.
      Right for bounded k; at corpus-scale n_keep (DSIR's real use
      selects a large FRACTION of the corpus) the k-row heads through
      the driver are the scale-killer round-5's verdict flagged.
    * **threshold** — the distributed shape: bracket the n_keep-th
      ``sel_micro`` with ``approxQuantile`` (rank error ≤
      ``rel_err``·N), keep everything strictly above the bracket's
      high edge with a plain filter (no sort, no limit — the bulk of
      the selection never leaves the executors), and resolve only the
      BRACKET BAND — O(rel_err·N) rows by the quantile guarantee, vs
      O(n_keep) before — with an exact TakeOrdered for the boundary
      tie-break. Integer micro-scores make the boundary deterministic,
      so the selected set is bit-identical to exact mode (pinned by
      test). Falls back to exact if the bracket misses (cannot happen
      within approxQuantile's guarantee; belt-and-braces).
    """
    from .indexes import track_persist

    g = gumbel_micro(F.col(id_col), seed)
    # floor, not cast: Spark's cast(long) truncates toward zero while
    # DuckDB's CAST rounds — floor is the one both agree on
    sel = F.floor(F.col("score_micro") / F.lit(float(temperature))
                  + F.col("gumbel_micro")).cast("long")
    annotated = (scores
                 .withColumn("gumbel_micro", g)
                 .withColumn("sel_micro", sel))

    def _exact(df: DataFrame) -> DataFrame:
        return (df.orderBy(F.desc("sel_micro"), F.asc(id_col))
                .limit(n_keep))

    if mode == "exact" or (mode == "auto" and n_keep <= exact_cutoff):
        return _exact(annotated)
    if mode not in ("threshold", "auto"):
        raise ValueError(f"unknown mode {mode!r}")

    # scanned by the quantile probe, the bracket counts and both
    # output branches — persist once (released via release_indexes)
    annotated = track_persist(annotated)
    total = annotated.count()
    if total <= n_keep:
        return annotated
    q = 1.0 - n_keep / total
    pad = 4.0 * rel_err
    t_lo, t_hi = annotated.approxQuantile(
        "sel_micro",
        [max(0.0, q - pad), min(1.0, q + pad)], rel_err)
    counts = annotated.agg(
        F.sum((F.col("sel_micro") > t_hi).cast("long")).alias("c_hi"),
        F.sum((F.col("sel_micro") >= t_lo).cast("long")).alias("c_ge"),
    ).collect()[0]
    c_hi, c_ge = int(counts["c_hi"]), int(counts["c_ge"])
    if c_hi > n_keep or c_ge < n_keep:
        return _exact(annotated)  # bracket miss — guaranteed fallback
    # every definite row outsorts every band row (strictly larger
    # sel_micro), so definite ∪ band-top-(n_keep - c_hi) IS the global
    # top-n_keep under (sel desc, id asc) — the band TakeOrdered is
    # the only sort and it is O(rel_err·N), not O(n_keep)
    definite = annotated.filter(F.col("sel_micro") > t_hi)
    band = (annotated
            .filter((F.col("sel_micro") >= t_lo)
                    & (F.col("sel_micro") <= t_hi))
            .orderBy(F.desc("sel_micro"), F.asc(id_col))
            .limit(n_keep - c_hi))
    return definite.unionByName(band)


def dsir_select(raw: DataFrame, target: DataFrame, n_keep: int,
                n_buckets: int = DSIR_N_BUCKETS_DEFAULT,
                alpha: float = 1.0, n: int = 2,
                id_col: str = "doc_id", text_col: str = "text",
                temperature: float = 1.0, seed: str = "dsir",
                mode: str = "auto") -> DataFrame:
    """End-to-end DSIR: featurize both corpora, fit the log-ratio
    table, score the raw corpus, Gumbel-resample ``n_keep`` documents.
    The raw corpus is featurized ONCE (the counts feed both the raw
    distribution and the scoring join)."""
    from .indexes import track_persist

    raw_counts = track_persist(
        hashed_ngram_counts(raw, n_buckets, id_col, text_col, n))
    tgt_counts = hashed_ngram_counts(target, n_buckets, id_col,
                                     text_col, n)
    weights = dsir_log_weights(tgt_counts, raw_counts, n_buckets, alpha)
    scores = dsir_scores(raw_counts, weights, id_col)
    return dsir_resample(scores, n_keep, id_col, temperature, seed,
                         mode=mode)
