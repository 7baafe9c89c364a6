"""SemDeDup — semantic deduplication over embeddings (Abbas et al.
2023, arXiv:2303.09540) re-expressed Spark-first.

The published recipe: k-means-cluster the embedding space, compute
pairwise cosine similarities WITHIN each cluster only (the clustering
is what makes the quadratic step tractable), and inside every group of
eps-similar examples keep exactly one — the member LEAST similar to
its cluster centroid (the most "peripheral", least redundant example).

Spark shape: Lloyd iterations are one hash-aggregate each over the
corpus (:func:`kmeans_lloyd` — only the k×dim centroid table ever
reaches the driver, standard distributed k-means); the within-cluster
pair generation is a capped self-equi-join on the cluster id (at real
scale k grows with the corpus — k ≈ n / target_cluster_size — so
cluster sizes, and with them the quadratic term, stay ~constant; the
cap is the hard guard, logged like every other cap in the dedup
family). The keep-one rule needs no iteration: rank cluster members
by (centroid-similarity asc, id), and drop a member iff some
LOWER-ranked member is eps-close — exactly the upper-triangular max
of the reference implementation.

No counterpart in the reference repo; training-data mandate operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import (
    _centroid_array,
    nearest_centroid_expr,
    train_centroids,
)


def kmeans_lloyd(df: DataFrame, init: list[list[float]], iters: int = 5,
                 vec_col: str = "embedding",
                 resume_dir: str | None = None,
                 fail_after_iter: int | None = None
                 ) -> list[list[float]]:
    """Distributed Lloyd refinement: each iteration assigns every row to
    its nearest centroid with a vectorized Arrow-batched argmin (the
    k×dim centroid matrix rides the closure — one numpy matmul per
    batch) and recomputes means with ONE hash aggregate keyed
    (cluster, dim) via posexplode. Only the k×dim centroid table is
    collected per iteration; the corpus never moves. An emptied cluster
    keeps its previous centroid (deterministic, no re-seeding RNG).
    Combine with :func:`train_centroids` (bounded driver-sample init)
    for the standard large-scale recipe: sample init, full-corpus
    refine.

    The assignment is deliberately NOT the Catalyst literal-array
    argmin the serving path uses (``nearest_centroid_expr``): at k=8,
    dim=64 that expression tree carries 512 literals and cost ~10 s of
    analysis/codegen PER ITERATION on a 4k-row corpus (round-5 bench
    profile) — training re-plans it every iteration because the
    centroids change, while serving plans it once. Inside Lloyd any
    deterministic nearest-assignment yields a valid step, so the numpy
    kernel (same first-min tie rule) is the right tool; the FINAL
    assignment consumers see still comes from the Catalyst expr.

    Round 6 — the per-cluster mean uses the same order-free exact
    accumulation as the BPE/quality trainers: each coordinate is
    quantized to integer NANOS and summed as decimal(38,0) (no
    overflow at any corpus size, no float merge-order sensitivity from
    shuffle fetch), then divided once on the driver — so the refined
    centroids are bit-identical under ANY partitioning. That makes the
    resume contract meaningful: with ``resume_dir`` each iteration's
    centroids are committed atomically (float64 hex, write-tmp →
    rename) and a restarted job replays at most one read-only
    assignment pass to land on identical centroids.
    ``fail_after_iter`` injects a crash AFTER iteration i's commit
    (test hook)."""
    import glob
    import json
    import os

    centroids = [list(map(float, c)) for c in init]
    start = 0
    if resume_dir is not None:
        os.makedirs(resume_dir, exist_ok=True)
        # never load state PAST the requested budget: a dir trained
        # further than ``iters`` resumes from iteration iters-1, so a
        # smaller request returns that run's exact result
        done = sorted(
            p for p in glob.glob(os.path.join(resume_dir, "iter-*.json"))
            if int(os.path.basename(p)[len("iter-"):-len(".json")])
            < iters)
        if done:
            with open(done[-1]) as f:
                st = json.load(f)
            centroids = [[float.fromhex(h) for h in row]
                         for row in st["c_hex"]]
            start = st["iter"] + 1
    for it in range(start, iters):
        rows = (_lloyd_assigned(df, centroids, vec_col)
                .groupBy("_c", "_d")
                .agg(F.sum(
                    F.floor(F.col("_x").cast("double") * 1e9 + F.lit(0.5))
                    .cast("decimal(38,0)")).alias("_s"),
                     F.count(F.lit(1)).alias("_n"))
                .collect())
        nxt = [list(c) for c in centroids]
        for r in rows:
            nxt[int(r["_c"])][int(r["_d"])] = (
                float(int(r["_s"])) / 1e9) / float(r["_n"])
        centroids = nxt
        if resume_dir is not None:
            tmp = os.path.join(resume_dir, f"_tmp-iter-{it:05d}.json")
            with open(tmp, "w") as f:
                json.dump({"iter": it, "c_hex": [
                    [float(v).hex() for v in row] for row in centroids],
                }, f, separators=(",", ":"))
            os.replace(tmp, os.path.join(
                resume_dir, f"iter-{it:05d}.json"))
        if fail_after_iter is not None and it >= fail_after_iter:
            raise RuntimeError(f"injected failure after iter {it}")
    return centroids


def _lloyd_assigned(df: DataFrame, centroids: list[list[float]],
                    vec_col: str) -> DataFrame:
    """One Lloyd iteration's (cluster, dim, value) rows — factored out
    so tests can assert the REAL assignment plan (ArrowEvalPython, not
    a re-planned literal argmin). NULL or wrong-dimension embeddings
    assign -1 and are dropped before the mean (the Catalyst argmin this
    replaced degraded the same way via NULL propagation — a dirty row
    must not fail the training job; round-5 review)."""
    cmat = np.array(centroids, dtype=np.float64)
    dim = cmat.shape[1]

    @F.pandas_udf("int")
    def _assign(vs: pd.Series) -> pd.Series:
        out = np.full(len(vs), -1, dtype="int32")
        idxs, vals = [], []
        for i, v in enumerate(vs):
            if v is not None and len(v) == dim:
                idxs.append(i)
                vals.append(np.asarray(v, dtype=np.float64))
        if vals:
            m = np.stack(vals)
            d2 = ((m[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
            out[np.asarray(idxs)] = d2.argmin(axis=1).astype("int32")
        return pd.Series(out)

    return (df.select(_assign(F.col(vec_col)).alias("_c"),
                      F.posexplode(F.col(vec_col)).alias("_d", "_x"))
            .filter(F.col("_c") >= 0))


def semdedup(df: DataFrame, k: int = 8, eps: float = 0.95,
             lloyd_iters: int = 3, id_col: str = "vec_id",
             vec_col: str = "embedding",
             centroids: list[list[float]] | None = None,
             max_cluster_size: int | None = 1000) -> DataFrame:
    """(id, cluster, cent_sim, keep): SemDeDup verdict for every row.
    ``keep=false`` rows are the semantic duplicates to drop — members
    with an eps-cosine-similar neighbor ranked before them in the
    cluster's (centroid-similarity asc, id) order, so each duplicate
    neighborhood keeps its least-central member (the paper's rule).

    ``centroids=None`` trains them here (sample init + Lloyd refine).
    Rows in clusters over ``max_cluster_size`` are dropped from
    judgment (kept, logged by cap_buckets) — the quadratic guard.
    """
    from .dedup import cap_buckets, ensure_parallelism
    from .indexes import track_persist
    from .similarity import cosine_with_norms, norm_expr, norm_lit

    if centroids is None:
        centroids = kmeans_lloyd(
            df, train_centroids(df, k=k, vec_col=vec_col, id_col=id_col),
            iters=lloyd_iters, vec_col=vec_col)
    cents = _centroid_array(centroids)
    # centroid norms precomputed driver-side (bit-identical to the HOF
    # fold over the same literals — see norm_lit); the row norm is
    # computed ONCE per row here and reused by the pair verifier below,
    # cutting the per-PAIR work from 3 interpreted folds to 1 (guide
    # §1.2 — measured 29 s → ~10 s of stage CPU at sf0.1).
    from .litarrays import lit_double_array

    cnorms = lit_double_array([norm_lit(c) for c in centroids])
    assigned = track_persist(ensure_parallelism(df).select(
        F.col(id_col), F.col(vec_col),
        nearest_centroid_expr(F.col(vec_col), centroids).alias("cluster"),
        norm_expr(F.col(vec_col)).alias("_nrm"),
    ).withColumn(
        "cent_sim",
        cosine_with_norms(F.col(vec_col),
                          F.element_at(cents, F.col("cluster") + 1),
                          F.col("_nrm"),
                          F.element_at(cnorms, F.col("cluster") + 1))))
    judged = cap_buckets(assigned, ["cluster"], max_cluster_size,
                         label="semdedup")
    # r7: the pair join keyed by cluster alone has only k distinct
    # values, so with small k every cluster's m² pair evaluations land
    # in ONE task (profiled 12× max/median task skew — guide §2.5, and
    # AQE's skew join cannot split a single key). Salt: the a side
    # gets a deterministic salt from its member id, the b side is
    # replicated across all salts, and the join key becomes
    # (cluster, salt) — identical pair set, spread over k×S tasks.
    # S is scale-adaptive: ceil(parallelism / k) — at corpus scale k
    # grows with n (k ≈ n/target_cluster_size, module doc), the
    # cluster key alone spreads fine, and S degenerates to 1 (no
    # replication, no extra shuffle bytes). Deterministic salt
    # (id-derived, no rand()) so task retries reproduce the rows.
    par = judged.sparkSession.sparkContext.defaultParallelism
    n_salts = max(1, -(-par // max(1, len(centroids))))
    a = judged.select(F.col("cluster"),
                      F.col(id_col).alias("_ida"),
                      F.col(vec_col).alias("_va"),
                      F.col("_nrm").alias("_na"),
                      F.col("cent_sim").alias("_sa"),
                      F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts))
                      .cast("int").alias("_salt"))
    b = judged.select(F.col("cluster"),
                      F.col(id_col).alias("_idb"),
                      F.col(vec_col).alias("_vb"),
                      F.col("_nrm").alias("_nb"),
                      F.col("cent_sim").alias("_sb"),
                      F.explode(F.sequence(
                          F.lit(0), F.lit(n_salts - 1))).alias("_salt"))
    # rank(a) < rank(b) in (cent_sim asc, id asc) order — a is the
    # earlier (less central) member whose eps-closeness kills b
    earlier = (F.col("_sa") < F.col("_sb")) | (
        (F.col("_sa") == F.col("_sb")) & (F.col("_ida") < F.col("_idb")))
    dropped = (
        a.join(b, ["cluster", "_salt"])
        .filter(earlier)
        .filter(cosine_with_norms(F.col("_va"), F.col("_vb"),
                                  F.col("_na"), F.col("_nb")) >= eps)
        .select(F.col("_idb").alias(id_col))
        .distinct()
        .withColumn("_drop", F.lit(True))
    )
    return (assigned.join(dropped, id_col, "left")
            .select(id_col, "cluster", "cent_sim",
                    F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep")))
