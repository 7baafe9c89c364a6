"""Distributed training for the fastText-style quality classifier
(round 6) — the corpus-scale face of ``tools/train_quality.py``.

Round 5 trained the CCNet-style gate (Wenzek et al. 2020 §4.3) on the
driver: collect every text, featurize in NumPy, full-batch gradient
descent. That is the right harness for a committed 1024-dim model but
the wrong shape for a 100 TB corpus, where the training set itself is
distributed. This module trains the SAME model as a Spark job:

* **featurize once, JVM-side** (:func:`featurize_examples`): the only
  corpus-proportional step. Tokens/grams/buckets use the exact
  Catalyst expressions the classifier serves
  (``quality_clf.norm_tokens_expr/grams_expr/gram_bucket_expr``), so
  trained and served features can never drift. Output is a cached
  SPARSE feature table — (bucket idx[], normalized count val[]) per
  example — because a dense 1024-float column per document is 8 KB of
  mostly zeros at corpus scale.
* **per-epoch cost = one pass over the cached features**: the weight
  vector (8 KB) rides into an Arrow-batched ``mapInPandas`` kernel via
  closure; each batch emits ONE partial-sum row. The driver receives
  O(n_partitions) rows of 1024 int64s — control-plane, like Lloyd's
  k centroids — applies the update, and launches the next epoch.
  Lineage never grows: only ``w`` changes, driver-side.
* **bit-exact and partitioning-invariant by construction**: every
  per-example float op (dense dot, stable sigmoid, gradient) is a
  shared helper both trainers call, and each example's gradient is
  quantized to integer NANOS (:data:`GRAD_SCALE`) before summation —
  int64 addition is associative/commutative, so the epoch gradient is
  identical under ANY partitioning, any Arrow batch size, and equals
  the in-memory trainer's loop exactly. ``tools/train_quality.py
  --distributed`` asserts byte-identity against the committed model;
  tests pin repartition-invariance and the in-memory equivalence.

The per-example pairing follows the trainer's design: each document's
negative is its token-SORTED corruption (identical unigram multiset —
only word-ORDER statistics separate the classes). EVEN doc_ids train,
ODD doc_ids are the held-out gate.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .quality_clf import gram_bucket_expr, grams_expr, norm_tokens_expr

#: Per-example gradients are rounded to multiples of 1/GRAD_SCALE and
#: summed in int64 — exact, order-free. 1e-9 granularity is far below
#: the gradient signal (examples contribute O(1e-3..1) per dim) and
#: int64 holds ~9.2e18: overflow needs ~1e10 examples per epoch ×
#: unit-scale gradients (per-example g·x ∈ [-1, 1], so each example
#: adds at most GRAD_SCALE to a bucket's partial sum — the margin is
#: guarded numerically by stable_sigmoid, not by a kernel assert).
GRAD_SCALE = 1_000_000_000


# ---------------------------------------------------------------- #
# shared per-example math — the SINGLE definition both the in-memory
# reference trainer and the distributed kernel call, so their float
# behavior is identical by construction
# ---------------------------------------------------------------- #

def stable_sigmoid(m: float) -> float:
    """Overflow-safe logistic, same branch structure everywhere."""
    if m >= 0.0:
        return 1.0 / (1.0 + math.exp(-m))
    e = math.exp(m)
    return e / (1.0 + e)


def example_margin(x_dense: np.ndarray, w: np.ndarray, b: float) -> float:
    """One explicit 1024-dim ddot per example (NOT a batched dgemv —
    BLAS may block/reorder a matrix product differently from a single
    dot, and bit-identity across trainers matters more than the
    microseconds)."""
    return float(np.dot(x_dense, w)) + b


def example_grad_q(x_dense: np.ndarray, y: float, w: np.ndarray,
                   b: float) -> tuple[np.ndarray, int, int]:
    """Quantized gradient contribution of one example:
    ``(floor(g·x·SCALE + 0.5) as int64[d], floor(g·SCALE + 0.5),
    floor(logloss·SCALE + 0.5))`` with ``g = sigmoid(margin) - y``.
    The log-loss term rides the same pass for free and sums exactly,
    so the per-epoch training-loss curve is as deterministic as the
    weights (it reports convergence; it never feeds the update)."""
    m = example_margin(x_dense, w, b)
    p = stable_sigmoid(m)
    g = p - y
    # -ln P(y | x) via the numerically stable softplus identities:
    # y=1 → softplus(-m), y=0 → softplus(m); clamp avoids log(0)
    loss = math.log1p(math.exp(-abs(m))) + (abs(m) if (
        (y >= 0.5) != (m >= 0.0)) else 0.0)
    q = np.floor(g * x_dense * GRAD_SCALE + 0.5).astype(np.int64)
    qb = int(math.floor(g * GRAD_SCALE + 0.5))
    ql = int(math.floor(loss * GRAD_SCALE + 0.5))
    return q, qb, ql


def example_grad_sparse_q(idx: np.ndarray, xv: np.ndarray, y: float,
                          margin: float) -> tuple[np.ndarray, int, int]:
    """Sparse form of :func:`example_grad_q` — bit-identical by
    construction: a zero feature quantizes to ``floor(0.5) = 0``, so
    only the nonzero buckets (``idx``, values ``xv``) contribute; each
    nonzero's ``floor(g*x*SCALE + 0.5)`` is the same scalar op the
    dense path applies at that position. ``margin`` must come from the
    DENSE ``np.dot`` (``example_margin``) — a sparse sum would change
    the float addition order and with it the bits (r7: the dense
    1024-wide multiply+floor per example was ~60% of the epoch kernel;
    nnz is ~2% of d here). Returns (q_at_idx int64[nnz], qb, ql)."""
    p = stable_sigmoid(margin)
    g = p - y
    loss = math.log1p(math.exp(-abs(margin))) + (abs(margin) if (
        (y >= 0.5) != (margin >= 0.0)) else 0.0)
    q = np.floor(g * xv * GRAD_SCALE + 0.5).astype(np.int64)
    qb = int(math.floor(g * GRAD_SCALE + 0.5))
    ql = int(math.floor(loss * GRAD_SCALE + 0.5))
    return q, qb, ql


def mean_loss_micro(sl: int, n: int) -> int:
    """Per-example mean log-loss in integer MICROS from the exact
    nano-sum — pure integer floor division, so the recorded loss
    curve is as order-free and engine-identical as the weights."""
    return sl // (n * 1000)


def apply_update(w: np.ndarray, b: float, s: np.ndarray, sb: int,
                 n: int, lr: float) -> tuple[np.ndarray, float]:
    """Full-batch step from the EXACT integer gradient sums — float
    ops in one fixed order so every trainer lands on the same w."""
    w = w - lr * ((s.astype(np.float64) / GRAD_SCALE) / n)
    b = b - lr * ((float(sb) / GRAD_SCALE) / n)
    return w, b


def densify(idx, cnt, n_grams: float, d: int) -> np.ndarray:
    """Dense normalized feature vector from sparse integer counts —
    ``float(c)/float(n)`` per bucket, the in-memory featurizer's
    ``x /= len(grams)`` division bit-for-bit."""
    x = np.zeros(d, dtype=np.float64)
    if len(idx):
        x[np.asarray(idx, dtype=np.int64)] = (
            np.asarray(cnt, dtype=np.float64) / float(n_grams))
    return x


# ---------------------------------------------------------------- #
# Spark-side featurization (once per corpus)
# ---------------------------------------------------------------- #

def featurize_examples(docs: DataFrame, d: int = 1024,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(ex_id, y, is_train, idx[], val[]) sparse hashed-gram features
    for every (document, sorted-corruption) pair — one explode + two
    hash aggregates, all JVM-side (the md5 bucketing is the served
    ``gram_bucket_expr``). ``val`` is ``count/n_grams`` in float64,
    exactly the in-memory featurizer's ``x /= len(grams)``."""
    from .dedup import ensure_parallelism
    from .indexes import track_persist

    toks = norm_tokens_expr(F.col(text_col))
    # spread the narrow parquet scan before the CPU-heavy gram/md5
    # projection (r7: the explode+partial-agg map side ran on the
    # 2-task scan — 4.0 s wall / 7.5 s cpu at sf0.1; row placement is
    # irrelevant to the order-free aggregates downstream).
    #
    # The gram arrays are PERSISTED (r7, second pass): without the
    # cache boundary, the explode's inferred ``size(grams) > 0`` filter
    # is pushed below the round-robin exchange into the parquet scan,
    # re-evaluating the whole normalize+split+gram chain per row inside
    # the 1-task scan stage — once per union branch (two 2.3 s
    # single-task stages at sf0.1, the §4.4 filter-duplication pattern
    # with Catalyst expressions instead of a UDF). With the cache, the
    # chain runs exactly once per document at ensure_parallelism width
    # and the inferred filter lands on a materialized column.
    base = track_persist(ensure_parallelism(docs).select(
        F.col(id_col).cast("long").alias("doc_id"), toks.alias("toks"))
        .select(
            "doc_id",
            grams_expr(F.col("toks")).alias("_gpos"),
            grams_expr(F.array_sort(F.col("toks"))).alias("_gneg")))
    pos = base.select(
        (F.col("doc_id") * 2).alias("ex_id"),
        F.lit(1.0).alias("y"),
        (F.col("doc_id") % 2 == 0).alias("is_train"),
        F.col("_gpos").alias("grams"))
    neg = base.select(
        (F.col("doc_id") * 2 + 1).alias("ex_id"),
        F.lit(0.0).alias("y"),
        (F.col("doc_id") % 2 == 0).alias("is_train"),
        F.col("_gneg").alias("grams"))
    exploded = pos.unionAll(neg).select(
        "ex_id", "y", "is_train",
        F.explode("grams").alias("g"))
    counts = exploded.groupBy(
        "ex_id", "y", "is_train",
        gram_bucket_expr(F.col("g"), d).cast("int").alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    feats = counts.groupBy("ex_id", "y", "is_train").agg(
        F.sort_array(F.collect_list(
            F.struct("bucket", "cnt"))).alias("sparse"),
        F.sum("cnt").cast("long").alias("n_grams"))
    return feats.select(
        "ex_id", "y", "is_train",
        F.transform(F.col("sparse"), lambda s: s["bucket"]).alias("idx"),
        F.transform(
            F.col("sparse"), lambda s: s["cnt"].cast("long")).alias("cnt"),
        "n_grams")


# ---------------------------------------------------------------- #
# distributed full-batch GD
# ---------------------------------------------------------------- #

def _epoch_partials(feats: DataFrame, w: np.ndarray, b: float,
                    d: int) -> tuple[np.ndarray, int, int, int]:
    """One pass: per-Arrow-batch quantized gradient (+ log-loss)
    partial sums, exact int64 reduce of the O(n_batches) partials on
    the driver."""
    import pandas as pd

    wc, bc = w.copy(), float(b)

    def kernel(batches):
        for pdf in batches:
            s = np.zeros(d, dtype=np.int64)
            sb = 0
            sl = 0
            n = 0
            for idx, cnt, ng, y in zip(
                    pdf["idx"], pdf["cnt"], pdf["n_grams"], pdf["y"]):
                x = densify(idx, cnt, ng, d)
                ia = np.asarray(idx, dtype=np.int64)
                q, qb, ql = example_grad_sparse_q(
                    ia, x[ia], y, example_margin(x, wc, bc))
                np.add.at(s, ia, q)
                sb += qb
                sl += ql
                n += 1
            yield pd.DataFrame(
                {"qsum": [s.tolist()], "qb": [sb], "qloss": [sl],
                 "n": [n]})

    parts = feats.mapInPandas(
        kernel, "qsum array<long>, qb long, qloss long, n long").collect()
    s = np.zeros(d, dtype=np.int64)
    sb = 0
    sl = 0
    n = 0
    for r in parts:
        s += np.asarray(r["qsum"], dtype=np.int64)
        sb += r["qb"]
        sl += r["qloss"]
        n += r["n"]
    return s, sb, sl, n


def holdout_accuracy(feats: DataFrame, w_micro: list[int],
                     b_micro: int, d: int) -> tuple[float, int]:
    """Held-out accuracy under the SERVED integer-micro scoring rule —
    the sign of ``b_micro·n_grams + Σ w_micro[bucket]·cnt``, all int64
    (exact, order-free, identical to the in-memory gate and to what
    ``quality_classify`` ships) — one Catalyst aggregate, no Python."""
    from .litarrays import lit_long_array

    wl = lit_long_array(w_micro)
    pairs = F.zip_with(
        F.col("idx"), F.col("cnt"),
        lambda i, c: F.struct(i.alias("i"), c.alias("c")))
    numer = (
        F.lit(int(b_micro)) * F.col("n_grams")
        + F.aggregate(
            pairs, F.lit(0).cast("long"),
            lambda acc, s: acc + F.element_at(
                wl, (s["i"] + 1).cast("int")) * s["c"])
    )
    scored = feats.filter(~F.col("is_train")).select(
        ((numer > 0).cast("int") == F.col("y").cast("int"))
        .cast("int").alias("ok"))
    row = scored.agg(
        F.sum("ok").alias("ok"), F.count(F.lit(1)).alias("n")).collect()[0]
    if not row["n"]:
        # Degenerate holdout (no odd doc_ids survived the caller's
        # filters): report 0.0/0 instead of raising at the end of an
        # otherwise-successful run (ADVICE r6) — the trained weights
        # are returned either way; n_holdout=0 flags the gate as void.
        return 0.0, 0
    return float(row["ok"]) / float(row["n"]), int(row["n"])


def _save_epoch_state(resume_dir: str, epoch: int, w: np.ndarray,
                      b: float, n: int, losses: list[int]) -> None:
    """Atomic (write-tmp → rename) per-epoch checkpoint. Weights are
    serialized as float64 HEX strings so a resumed run restarts from
    the exact bits — JSON decimal round-trip would not be enough to
    keep the byte-identity guarantee."""
    import json
    import os

    payload = {
        "epoch": epoch,
        "w_hex": [float(v).hex() for v in w],
        "b_hex": float(b).hex(),
        "n_train": n,
        "loss_curve_micro": losses,
    }
    tmp = os.path.join(resume_dir, f"_tmp-epoch-{epoch:05d}.json")
    with open(tmp, "w") as f:
        json.dump(payload, f, separators=(",", ":"))
    os.replace(tmp, os.path.join(
        resume_dir, f"epoch-{epoch:05d}.json"))


def _load_epoch_state(
        resume_dir: str, d: int, max_epochs: int
) -> tuple[int, np.ndarray, float, int | None, list[int]]:
    """Latest committed epoch state NOT PAST the requested budget (a
    dir trained further than ``max_epochs`` resumes from epoch
    ``max_epochs - 1``, so a smaller request returns that run's exact
    result, not a later state), or the zero-init start. A crash
    mid-write leaves only a ``_tmp-`` file, which is ignored — the
    rename is the commit point."""
    import glob
    import json
    import os

    done = sorted(
        p for p in glob.glob(os.path.join(resume_dir, "epoch-*.json"))
        if int(os.path.basename(p)[len("epoch-"):-len(".json")])
        < max_epochs)
    if not done:
        return 0, np.zeros(d, dtype=np.float64), 0.0, None, []
    with open(done[-1]) as f:
        st = json.load(f)
    w = np.array([float.fromhex(h) for h in st["w_hex"]],
                 dtype=np.float64)
    return (st["epoch"] + 1, w, float.fromhex(st["b_hex"]),
            st["n_train"], list(st["loss_curve_micro"])[:max_epochs])


def train_quality_distributed(docs: DataFrame, d: int = 1024,
                              epochs: int = 80, lr: float = 2.0,
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              resume_dir: str | None = None,
                              fail_after_epoch: int | None = None
                              ) -> dict:
    """Full training job; returns the same payload shape
    ``tools/train_quality.py`` commits. One featurization scan, then
    ``epochs`` passes over the cached sparse features.

    ``resume_dir``: driver-side checkpoint directory for long
    trainings — each epoch's exact weights (float64 hex) are committed
    atomically after the update; a restarted job resumes from the last
    committed epoch and lands on byte-identical final weights (a crash
    mid-epoch redoes only that epoch; the gradient pass is read-only,
    so replaying it is side-effect-free). The dir is per-JOB: state
    carries the weights, not the config — resuming with a different
    corpus, ``lr`` or ``d`` than the run that wrote it is the
    caller's error (a ``d`` mismatch fails fast on the weight shape;
    the others cannot be detected from state alone).
    ``fail_after_epoch`` is the test hook that injects a crash AFTER
    epoch k's commit."""
    import os

    from .indexes import track_persist

    feats = track_persist(
        featurize_examples(docs, d, id_col, text_col))
    train = feats.filter(F.col("is_train"))
    start, w, b = 0, np.zeros(d, dtype=np.float64), 0.0
    n_train: int | None = None
    losses: list[int] = []
    if resume_dir is not None:
        os.makedirs(resume_dir, exist_ok=True)
        start, w, b, n_train, losses = _load_epoch_state(
            resume_dir, d, epochs)
    for epoch in range(start, epochs):
        s, sb, sl, n = _epoch_partials(train, w, b, d)
        n_train = n
        losses.append(mean_loss_micro(sl, n))
        w, b = apply_update(w, b, s, sb, n, lr)
        if resume_dir is not None:
            _save_epoch_state(resume_dir, epoch, w, b, n, losses)
        if fail_after_epoch is not None and epoch >= fail_after_epoch:
            raise RuntimeError(
                f"injected failure after epoch {epoch}")
    w_micro = [int(v) for v in np.floor(w * 1e6 + 0.5)]
    b_micro = int(np.floor(b * 1e6 + 0.5))
    acc, n_holdout = holdout_accuracy(feats, w_micro, b_micro, d)
    return {
        "d": d,
        "b_micro": b_micro,
        "w_micro": w_micro,
        "holdout_acc": acc,
        "n_train": int(n_train or 0),
        "n_holdout": n_holdout,
        "loss_curve_micro": losses,
    }
