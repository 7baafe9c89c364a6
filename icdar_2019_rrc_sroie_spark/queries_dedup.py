"""Query battery, batch 3: dedup + similarity search (training-data ops).

The Spark side calls the real engine operators
(operators/dedup.py, operators/similarity.py); the DuckDB oracle
recomputes the identical md5-based signatures in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.dedup import (
    jaccard_pairs,
    lsh_bands,
    minhash_candidates,
    minhash_signatures,
    simhash_dedup,
)
from .operators.similarity import ann_topk_bucketed, cosine_topk


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _micro(col):
    return F.floor(col * 1e6 + F.lit(0.5)).cast("long")


def _with_dups(docs: DataFrame) -> DataFrame:
    """Corpus ∪ shifted copy — guarantees duplicate pairs exist."""
    shifted = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    return docs.select("doc_id", "text").unionByName(shifted)


_WITH_DUPS_SQL = """
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents
"""

_SHINGLES_SQL = r"""
  SELECT doc_id, unnest(list_distinct(
    [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
     for i in generate_series(1, greatest(len(t)-2, 0))])) AS shingle
  FROM (SELECT doc_id,
          regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '\s+') AS t
        FROM corpus)
"""


def q_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures + LSH band hashes (one 'sig' row per doc),
    the banded candidate pairs over the planted-duplicate corpus (one
    'cand' row per pair), AND the incremental cross-snapshot path (one
    'inc_cross'/'inc_new' row per pair) as a discriminated union — the
    former minhash_bands query merged in round 4, incremental_
    candidates merged in round 5 (the flat-in-history ingest flagship
    had pytest plan-asserts but no driver-checked values; its band
    algebra is DuckDB-expressible exactly like the batch path). The
    Spark side exercises the REAL store: snapshot A's bands are
    written to a scratch band index (write_band_index) and snapshot B
    — odd docs plus planted +2e6 copies of every 10th even doc — is
    deduped against the stored parquet only."""
    docs = _t(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, num_hashes=4)
    bands = (lsh_bands(sigs, num_hashes=4, rows_per_band=2)
             .groupBy("doc_id")
             .pivot("band_idx", [0, 1]).agg(F.first("band_hash")))
    sig_rows = sigs.join(bands, "doc_id").select(
        F.lit("sig").alias("kind"),
        F.col("doc_id").alias("id_a"),
        F.lit(None).cast("long").alias("id_b"),
        F.concat_ws("|", "sig0", "sig1", "sig2", "sig3").alias("sigs"),
        F.col("0").alias("band0_hash"), F.col("1").alias("band1_hash"),
    )
    corpus = _with_dups(docs)
    cand_rows = minhash_candidates(
        corpus, num_hashes=4, rows_per_band=2, max_bucket_size=200
    ).select(
        F.lit("cand").alias("kind"), "id_a", "id_b",
        F.lit(None).cast("string").alias("sigs"),
        F.lit(None).cast("string").alias("band0_hash"),
        F.lit(None).cast("string").alias("band1_hash"),
    )
    import os
    import tempfile

    from .operators.incremental import (
        incremental_candidates,
        write_band_index,
    )

    snap_a = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    snap_b = docs.filter(F.col("doc_id") % 2 == 1) \
        .select("doc_id", "text").unionByName(
            docs.filter(F.col("doc_id") % 10 == 0)
            .select((F.col("doc_id") + 2_000_000).alias("doc_id"), "text"))
    # scratch index on local disk (pid-suffixed: concurrent checkers
    # must not race); NOT a TemporaryDirectory — the returned plan is
    # lazy and the driver collects after this function returns — but
    # registered for deletion at the next release_indexes() so
    # repeated runs don't accumulate dirs in the temp root
    from .operators.indexes import track_scratch_dir

    idx = os.path.join(tempfile.gettempdir(),
                       f"sroie_inc_oracle_idx_{os.getpid()}")
    track_scratch_dir(spark, idx)
    write_band_index(snap_a, idx, "snapA", num_hashes=4)
    inc_rows = incremental_candidates(
        snap_b, idx, "snapB", num_hashes=4
    ).select(
        F.concat(F.lit("inc_"), F.col("src")).alias("kind"),
        "id_a", "id_b",
        F.lit(None).cast("string").alias("sigs"),
        F.lit(None).cast("string").alias("band0_hash"),
        F.lit(None).cast("string").alias("band1_hash"),
    )
    return sig_rows.unionByName(cand_rows).unionByName(inc_rows) \
        .orderBy("kind", "id_a", "id_b")


def _sig_bands_sql(src: str, pfx: str) -> str:
    """CTE fragments computing ``{pfx}bands(doc_id, band_idx,
    band_hash)`` from a ``{src}(doc_id, text)`` CTE — the num_hashes=4
    / rows_per_band=2 banding shared by the batch and incremental
    oracle halves."""
    return rf"""{pfx}sh AS (
  SELECT doc_id, unnest(list_distinct(
    [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
     for i in generate_series(1, greatest(len(t)-2, 0))])) AS shingle
  FROM (SELECT doc_id,
          regexp_split_to_array(
            regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
            '\s+') AS t
        FROM {src})
), {pfx}sigs AS (
  SELECT doc_id,
    min(substr(md5(shingle), 1, 8)) AS sig0,
    min(substr(md5(shingle), 9, 8)) AS sig1,
    min(substr(md5(shingle), 17, 8)) AS sig2,
    min(substr(md5(shingle), 25, 8)) AS sig3
  FROM {pfx}sh GROUP BY doc_id
), {pfx}bands AS (
  SELECT doc_id, 0 AS band_idx, md5(sig0 || '|' || sig1) AS band_hash
  FROM {pfx}sigs
  UNION ALL
  SELECT doc_id, 1 AS band_idx, md5(sig2 || '|' || sig3) AS band_hash
  FROM {pfx}sigs
)"""


SQL_MINHASH_CANDIDATES = rf"""
WITH corpus AS ({_WITH_DUPS_SQL}),
snap_a AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
snap_b AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, text FROM documents
  WHERE doc_id % 10 = 0
),
{_sig_bands_sql('snap_a', 'a_')},
{_sig_bands_sql('snap_b', 'b_')},
sh AS ({_SHINGLES_SQL}),
sigs AS (
  SELECT doc_id,
    min(substr(md5(shingle), 1, 8)) AS sig0, min(substr(md5(shingle), 9, 8)) AS sig1,
    min(substr(md5(shingle), 17, 8)) AS sig2, min(substr(md5(shingle), 25, 8)) AS sig3
  FROM sh GROUP BY doc_id
), bands AS (
  SELECT doc_id, 0 AS band_idx, md5(sig0 || '|' || sig1) AS band_hash FROM sigs
  UNION ALL
  SELECT doc_id, 1 AS band_idx, md5(sig2 || '|' || sig3) AS band_hash FROM sigs
), gbands AS (
  SELECT doc_id, band_idx, band_hash FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY band_idx, band_hash) AS bsz
    FROM bands) WHERE bsz <= 200
)
SELECT 'cand' AS kind, id_a, id_b,
  CAST(NULL AS VARCHAR) AS sigs,
  CAST(NULL AS VARCHAR) AS band0_hash, CAST(NULL AS VARCHAR) AS band1_hash
FROM (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM gbands a JOIN gbands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
  WHERE a.doc_id < b.doc_id
)
UNION ALL
SELECT 'sig' AS kind, doc_id AS id_a, CAST(NULL AS BIGINT) AS id_b,
  sig0 || '|' || sig1 || '|' || sig2 || '|' || sig3 AS sigs,
  md5(sig0 || '|' || sig1) AS band0_hash,
  md5(sig2 || '|' || sig3) AS band1_hash
FROM (
  SELECT doc_id,
    min(substr(md5(shingle), 1, 8)) AS sig0,
    min(substr(md5(shingle), 9, 8)) AS sig1,
    min(substr(md5(shingle), 17, 8)) AS sig2,
    min(substr(md5(shingle), 25, 8)) AS sig3
  FROM (
    SELECT doc_id, unnest(list_distinct(
      [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
       for i in generate_series(1, greatest(len(t)-2, 0))])) AS shingle
    FROM (SELECT doc_id,
            regexp_split_to_array(
              regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
              '\s+') AS t
          FROM documents)
  ) GROUP BY doc_id
)
UNION ALL
SELECT 'inc_cross' AS kind, id_a, id_b,
  CAST(NULL AS VARCHAR) AS sigs,
  CAST(NULL AS VARCHAR) AS band0_hash, CAST(NULL AS VARCHAR) AS band1_hash
FROM (
  SELECT DISTINCT b.doc_id AS id_a, a.doc_id AS id_b
  FROM b_bands b JOIN a_bands a
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
)
UNION ALL
SELECT 'inc_new' AS kind, id_a, id_b,
  CAST(NULL AS VARCHAR) AS sigs,
  CAST(NULL AS VARCHAR) AS band0_hash, CAST(NULL AS VARCHAR) AS band1_hash
FROM (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM b_bands x JOIN b_bands y
    ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
   AND x.doc_id < y.doc_id
)
ORDER BY kind, id_a, id_b
"""


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-bounded verification: exact Jaccard only for pairs the
    MinHash-LSH stage proposed (never the full shingle self-join)."""
    corpus = _with_dups(_t(spark, sf_dir, "documents").filter(F.col("doc_id") < 60))
    cands = minhash_candidates(corpus, num_hashes=4, rows_per_band=2,
                               max_bucket_size=200)
    out = jaccard_pairs(corpus, threshold=0.6, candidates=cands)
    return out.select(
        "id_a", "id_b",
        F.col("common").cast("long").alias("common"),
        F.col("sz_a").cast("long").alias("sz_a"),
        F.col("sz_b").cast("long").alias("sz_b"),
        _micro(F.col("jaccard")).alias("jaccard_micro"),
    ).orderBy("id_a", "id_b")


SQL_JACCARD_PAIRS = rf"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 60
  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 60
),
sh AS ({_SHINGLES_SQL}),
sigs AS (
  SELECT doc_id,
    min(substr(md5(shingle), 1, 8)) AS sig0, min(substr(md5(shingle), 9, 8)) AS sig1,
    min(substr(md5(shingle), 17, 8)) AS sig2, min(substr(md5(shingle), 25, 8)) AS sig3
  FROM sh GROUP BY doc_id
), bands AS (
  SELECT doc_id, 0 AS band_idx, md5(sig0 || '|' || sig1) AS band_hash FROM sigs
  UNION ALL
  SELECT doc_id, 1 AS band_idx, md5(sig2 || '|' || sig3) AS band_hash FROM sigs
), gbands AS (
  SELECT doc_id, band_idx, band_hash FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY band_idx, band_hash) AS bsz
    FROM bands) WHERE bsz <= 200
), cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM gbands a JOIN gbands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS common
  FROM cands c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY c.id_a, c.id_b
)
SELECT c.id_a, c.id_b, CAST(c.common AS BIGINT) AS common,
  CAST(sa.sz AS BIGINT) AS sz_a, CAST(sb.sz AS BIGINT) AS sz_b,
  CAST(floor(c.common * 1.0 / (sa.sz + sb.sz - c.common) * 1e6 + 0.5) AS BIGINT) AS jaccard_micro
FROM common c
JOIN sizes sa ON sa.doc_id = c.id_a
JOIN sizes sb ON sb.doc_id = c.id_b
WHERE c.common * 1.0 / (sa.sz + sb.sz - c.common) >= 0.6
ORDER BY id_a, id_b
"""


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    out = cosine_topk(emb, list(query), k=25)
    return out.select("vec_id", _micro(F.col("cosine")).alias("cosine_micro"))


def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The similarity/ANN family as one discriminated union, every half
    fully value-checked in a single driver slot:

    * 'brute' — exact cosine top-25 (NULL bucket);
    * 'lsh'   — sign-LSH bucketed top-25 (seeded hyperplanes);
    * 'sem'   — SemDeDup's judged algebra on the COMMITTED centroids
      (models/centroids_k8.json): bucket=cluster, cosine_micro=the
      centroid similarity, keep=the least-central-survivor verdict
      over the planted-duplicate corpus (graduated from rows-only in
      round 5 — the oracle replays assignment argmin, centroid cosine
      and the eps-pruning rule with identical float literals);
    * 'ivf1'/'ivfb' — the IVF ANN serving shapes (q_ivf_ann composed:
      single-query nprobe=2 probe, batch k-NN against the materialized
      index), values replayed by the oracle from the same centroids;
    * 'knn' — the approximate k-NN JOIN (q_ann_knn_join composed:
      probe-key explode + one id-only self-join + exact-cosine
      window), replayed from the seeded hyperplane literals.

    The folds value-check the MATH; physical properties (partition
    pruning, persisted index, O(1) join stages) stay pytest-asserted
    on the rows-only ivf_ann/semdedup/ann_knn_join entries."""
    from .operators.semdedup import semdedup
    from .operators.similarity import load_centroids

    nul_l = F.lit(None).cast("long")
    nul_i = F.lit(None).cast("int")
    nul_b = F.lit(None).cast("boolean")
    brute = q_cosine_topk(spark, sf_dir).select(
        F.lit("brute").alias("kind"), nul_l.alias("query_id"), "vec_id",
        nul_i.alias("bucket"), nul_i.alias("rnk"), "cosine_micro",
        nul_b.alias("keep"))
    lsh = q_ann_bucketed(spark, sf_dir).select(
        F.lit("lsh").alias("kind"), nul_l.alias("query_id"), "vec_id",
        F.col("bucket").cast("int").alias("bucket"), nul_i.alias("rnk"),
        "cosine_micro", nul_b.alias("keep"))
    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.select("vec_id", "embedding").unionByName(
        emb.select((F.col("vec_id") + 1_000_000).alias("vec_id"),
                   "embedding"))
    sem = semdedup(corpus, eps=0.999, centroids=load_centroids()).select(
        F.lit("sem").alias("kind"), nul_l.alias("query_id"), "vec_id",
        F.col("cluster").cast("int").alias("bucket"), nul_i.alias("rnk"),
        _micro(F.col("cent_sim")).alias("cosine_micro"), "keep")
    from .queries_pipeline import q_ann_knn_join, q_ivf_ann

    ivf = q_ivf_ann(spark, sf_dir).select(
        F.when(F.col("kind") == "single", F.lit("ivf1"))
        .otherwise(F.lit("ivfb")).alias("kind"),
        "query_id", "vec_id",
        F.col("ivf_bucket").cast("int").alias("bucket"),
        F.col("rnk").cast("int").alias("rnk"),
        _micro(F.col("cosine")).alias("cosine_micro"),
        nul_b.alias("keep"))
    knn = q_ann_knn_join(spark, sf_dir).select(
        F.lit("knn").alias("kind"), F.col("id_a").alias("query_id"),
        F.col("id_b").alias("vec_id"), nul_i.alias("bucket"),
        F.col("rnk").cast("int").alias("rnk"), "cosine_micro",
        nul_b.alias("keep"))
    return (brute.unionByName(lsh).unionByName(sem).unionByName(ivf)
            .unionByName(knn)
            .orderBy("kind", "query_id", "vec_id"))


SQL_COSINE_TOPK = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id,
    list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)
              for i in generate_series(1, len(e.embedding))]) /
    (sqrt(list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)
              for i in generate_series(1, len(e.embedding))])) *
     sqrt(list_sum([CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)
              for i in generate_series(1, len(q.qv))]))) AS cosine
  FROM embeddings e, q
)
SELECT vec_id, CAST(floor(cosine*1e6+0.5) AS BIGINT) AS cosine_micro
FROM scored ORDER BY cosine DESC, vec_id ASC LIMIT 25
"""


_ANN_BITS = 4
_ANN_SEED = 7
_ANN_DIM = 64


def q_ann_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane sign-LSH (seeded projection matrix broadcast as
    literals) with 1-bit multiprobe — the SQL oracle recomputes the
    identical hyperplane dot products term-by-term."""
    from .operators.similarity import random_hyperplanes

    emb = _t(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    planes = random_hyperplanes(_ANN_DIM, _ANN_BITS, _ANN_SEED)
    out = ann_topk_bucketed(emb, list(query), k=25, hyperplanes=planes,
                            multiprobe=1)
    return out.select("vec_id", "bucket",
                      _micro(F.col("cosine")).alias("cosine_micro"))


def _sql_ann_bucketed() -> str:
    """Mirror the seeded hyperplanes as literal dot-product chains; '+'
    chains evaluate left-to-right in both engines, so the fp rounding of
    each dot matches Spark's sequential `aggregate` exactly."""
    from .operators.similarity import random_hyperplanes

    planes = random_hyperplanes(_ANN_DIM, _ANN_BITS, _ANN_SEED)

    def dot(col: str, h: list[float]) -> str:
        return "(" + " + ".join(
            f"CAST({col}[{j + 1}] AS DOUBLE) * ({x!r})"
            for j, x in enumerate(h)) + ")"

    def bucket(col: str) -> str:
        return "(" + " + ".join(
            f"CASE WHEN {dot(col, h)} > 0 THEN {1 << i} ELSE 0 END"
            for i, h in enumerate(planes)) + ")"

    flips = ", ".join(f"xor(qbucket, {1 << i})" for i in range(_ANN_BITS))
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
qb AS (SELECT {bucket('qv')} AS qbucket, qv FROM q),
probes AS (
  SELECT unnest([CAST(qbucket AS BIGINT), {flips}]) AS probe FROM qb
),
scored AS (
  SELECT e.vec_id, {bucket('e.embedding')} AS bucket,
    list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(qb.qv[i] AS DOUBLE)
              for i in generate_series(1, len(e.embedding))]) /
    (sqrt(list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)
              for i in generate_series(1, len(e.embedding))])) *
     sqrt(list_sum([CAST(qb.qv[i] AS DOUBLE) * CAST(qb.qv[i] AS DOUBLE)
              for i in generate_series(1, len(qb.qv))]))) AS cosine
  FROM embeddings e, qb
)
SELECT vec_id, CAST(bucket AS INT) AS bucket,
       CAST(floor(cosine*1e6+0.5) AS BIGINT) AS cosine_micro
FROM scored WHERE bucket IN (SELECT probe FROM probes)
ORDER BY cosine DESC, vec_id ASC LIMIT 25
"""


SQL_ANN_BUCKETED = _sql_ann_bucketed()

def _sql_similarity_topk() -> str:
    """Oracle for the five-way similarity union. The sem/ivf halves
    embed the committed centroids as DOUBLE[][] literals and replay
    the exact Catalyst float algebra: ``list_sum`` over a list
    comprehension is the same sequential left-to-right fold as Spark's
    ``aggregate`` (empirically bit-exact on this corpus — zero
    cluster/micro mismatches across all SFs), ``list_position(dl,
    list_min(dl))`` is the same first-minimum argmin as
    ``array_position(array_min)``, and the (dist, idx) struct sort is
    the same probe tie order as ``nprobe_buckets_expr``. The knn arm
    replays q_ann_knn_join's seeded 8-bit hyperplanes, masked probe
    explode, bucket cap and per-query window from the same literals."""
    from .operators.similarity import load_centroids, random_hyperplanes

    cents = load_centroids()
    cs_lit = ("CAST([" + ", ".join(
        "[" + ", ".join(repr(x) for x in c) + "]" for c in cents)
        + "] AS DOUBLE[][])")
    planes = random_hyperplanes(64, 8, 7)
    hp_lit = ("CAST([" + ", ".join(
        "[" + ", ".join(repr(x) for x in h) + "]" for h in planes)
        + "] AS DOUBLE[][])")

    def cos(a: str, b: str) -> str:
        return f"""(list_sum([CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)
      for i in generate_series(1, len({a}))])
    / (sqrt(list_sum([CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)
      for i in generate_series(1, len({a}))]))
       * sqrt(list_sum([CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)
      for i in generate_series(1, len({b}))]))))"""

    def dists(vec: str) -> str:
        return f"""[list_sum([(CAST({vec}[i] AS DOUBLE) - cs[j][i])
        * (CAST({vec}[i] AS DOUBLE) - cs[j][i])
        for i in generate_series(1, len({vec}))])
      for j in generate_series(1, len(cs))]"""

    # nprobe=2 nearest centroid indices in (dist, idx) order — the
    # struct sort ties exactly like Spark's array_sort over structs
    probes2 = """list_transform(list_slice(list_sort(
      [{'d': dq[j], 'i': j - 1} for j in generate_series(1, len(dq))]),
      1, 2), s -> s.i)"""

    return f"""
WITH cents AS (SELECT {cs_lit} AS cs),
sem_corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings
), sem_assigned AS (
  SELECT c.vec_id, c.embedding, cs, {dists('c.embedding')} AS dl
  FROM sem_corpus c, cents
), sem_clustered AS (
  SELECT vec_id, embedding,
    CAST(list_position(dl, list_min(dl)) - 1 AS INT) AS cluster,
    cs[list_position(dl, list_min(dl))] AS cvec
  FROM sem_assigned
), sem_scored AS (
  SELECT vec_id, embedding, cluster,
    {cos('embedding', 'cvec')} AS cent_sim,
    COUNT(*) OVER (PARTITION BY cluster) AS csz
  FROM sem_clustered
), sem_dropped AS (
  SELECT DISTINCT b.vec_id
  FROM sem_scored a JOIN sem_scored b ON a.cluster = b.cluster
  WHERE a.csz <= 1000 AND b.csz <= 1000
    AND (a.cent_sim < b.cent_sim
         OR (a.cent_sim = b.cent_sim AND a.vec_id < b.vec_id))
    AND {cos('a.embedding', 'b.embedding')} >= 0.999
), ivf_assigned AS (
  SELECT vec_id, embedding, cluster AS b FROM sem_clustered
  WHERE vec_id < 1000000
), qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
qp AS (
  SELECT {probes2} AS pl
  FROM (SELECT {dists('q')} AS dq FROM qv, cents)
), ivf_single AS (
  SELECT a.vec_id, a.b, {cos('a.embedding', 'qv.q')} AS cosine
  FROM ivf_assigned a, qv, qp
  WHERE list_contains(qp.pl, CAST(a.b AS BIGINT))
  ORDER BY cosine DESC, a.vec_id ASC LIMIT 20
), bq AS (
  SELECT vec_id AS query_id, embedding AS q FROM embeddings
  WHERE vec_id % 97 = 3
), bprobes AS (
  SELECT query_id, q, unnest({probes2}) AS pb
  FROM (SELECT query_id, q, {dists('q')} AS dq FROM bq, cents)
), ivf_batch AS (
  SELECT query_id, vec_id, b, cosine,
    row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, vec_id ASC) AS rnk
  FROM (
    SELECT p.query_id, a.vec_id, a.b,
      {cos('a.embedding', 'p.q')} AS cosine
    FROM ivf_assigned a JOIN bprobes p ON CAST(a.b AS BIGINT) = p.pb)
  QUALIFY rnk <= 5
), hps AS (SELECT {hp_lit} AS hp),
kbuck AS (
  SELECT e.vec_id, e.embedding,
    list_sum([CASE WHEN list_sum([CAST(e.embedding[i] AS DOUBLE)
                                  * hp[b][i]
        for i in generate_series(1, len(e.embedding))]) > 0
      THEN 1 << (b - 1) ELSE 0 END
      for b in generate_series(1, len(hp))]) AS bucket
  FROM embeddings e, hps
), kcap AS (
  SELECT vec_id, embedding, bucket FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY bucket) AS bsz FROM kbuck)
  WHERE bsz <= 200
), kprobe AS (
  SELECT vec_id,
    unnest([{{'pidx': i, 'pkey': bucket & xor(255, 1 << (i - 1))}}
            for i in generate_series(1, 8)]) AS p
  FROM kcap
), kpairs AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM kprobe a JOIN kprobe b
    ON a.p.pidx = b.p.pidx AND a.p.pkey = b.p.pkey
  WHERE a.vec_id != b.vec_id
), knn AS (
  SELECT id_a, id_b, cosine,
    row_number() OVER (PARTITION BY id_a
                       ORDER BY cosine DESC, id_b ASC) AS rnk
  FROM (
    SELECT k.id_a, k.id_b, {cos('ea.embedding', 'eb.embedding')} AS cosine
    FROM kpairs k
    JOIN embeddings ea ON ea.vec_id = k.id_a
    JOIN embeddings eb ON eb.vec_id = k.id_b)
  QUALIFY rnk <= 3
)
SELECT 'brute' AS kind, CAST(NULL AS BIGINT) AS query_id, vec_id,
  CAST(NULL AS INT) AS bucket, CAST(NULL AS INT) AS rnk, cosine_micro,
  CAST(NULL AS BOOLEAN) AS keep
FROM ({SQL_COSINE_TOPK})
UNION ALL
SELECT 'lsh' AS kind, CAST(NULL AS BIGINT) AS query_id, vec_id,
  bucket, CAST(NULL AS INT) AS rnk, cosine_micro,
  CAST(NULL AS BOOLEAN) AS keep
FROM ({SQL_ANN_BUCKETED})
UNION ALL
SELECT 'sem' AS kind, CAST(NULL AS BIGINT) AS query_id, s.vec_id,
  s.cluster AS bucket, CAST(NULL AS INT) AS rnk,
  CAST(floor(s.cent_sim * 1e6 + 0.5) AS BIGINT) AS cosine_micro,
  d.vec_id IS NULL AS keep
FROM sem_scored s LEFT JOIN sem_dropped d ON s.vec_id = d.vec_id
UNION ALL
SELECT 'ivf1' AS kind, CAST(NULL AS BIGINT) AS query_id, vec_id,
  b AS bucket, CAST(NULL AS INT) AS rnk,
  CAST(floor(cosine * 1e6 + 0.5) AS BIGINT) AS cosine_micro,
  CAST(NULL AS BOOLEAN) AS keep
FROM ivf_single
UNION ALL
SELECT 'ivfb' AS kind, query_id, vec_id, b AS bucket,
  CAST(rnk AS INT) AS rnk,
  CAST(floor(cosine * 1e6 + 0.5) AS BIGINT) AS cosine_micro,
  CAST(NULL AS BOOLEAN) AS keep
FROM ivf_batch
UNION ALL
SELECT 'knn' AS kind, id_a AS query_id, id_b AS vec_id,
  CAST(NULL AS INT) AS bucket, CAST(rnk AS INT) AS rnk,
  CAST(floor(cosine * 1e6 + 0.5) AS BIGINT) AS cosine_micro,
  CAST(NULL AS BOOLEAN) AS keep
FROM knn
ORDER BY kind, query_id, vec_id
"""


SQL_SIMILARITY_TOPK = _sql_similarity_topk()


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash signatures, SQL-checked: DuckDB parses the same
    md5 hex slices via CAST('0x…' AS BIGINT) and recomputes the
    majority-bit packing, including the signed-long wraparound of the
    high half."""
    docs = _t(spark, sf_dir, "documents")
    return simhash_dedup(docs).orderBy("doc_id")


SQL_SIMHASH = r"""
WITH toks AS (
  SELECT doc_id, list_distinct(
    regexp_split_to_array(
      regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '\s+')) AS ts
  FROM documents
), hashes AS (
  SELECT doc_id, len(ts) AS n,
    [CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) FOR t IN ts] AS los,
    [CAST('0x' || substr(md5(t), 9, 8) AS BIGINT) FOR t IN ts] AS his
  FROM toks
), halves AS (
  SELECT doc_id,
    CAST(list_sum([
      CASE WHEN 2 * list_sum(
        [CAST(floor(h / 2.0 ** j) AS BIGINT) % 2 FOR h IN los]) > n
      THEN CAST(2 ** j AS BIGINT) ELSE 0 END
      FOR j IN generate_series(0, 31)]) AS BIGINT) AS lo_sig,
    CAST(list_sum([
      CASE WHEN 2 * list_sum(
        [CAST(floor(h / 2.0 ** j) AS BIGINT) % 2 FOR h IN his]) > n
      THEN CAST(2 ** j AS BIGINT) ELSE 0 END
      FOR j IN generate_series(0, 31)]) AS BIGINT) AS hi_sig
  FROM hashes
)
SELECT doc_id,
  CAST(CAST(hi_sig AS HUGEINT) * 4294967296 + lo_sig
       - CASE WHEN hi_sig >= 2147483648
              THEN CAST(18446744073709551616 AS HUGEINT)
              ELSE 0 END AS BIGINT) AS simhash
FROM halves ORDER BY doc_id
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs → clusters → canonical keep-decision (the step a 100 TB
    dedup pipeline runs after candidate generation): MinHash-LSH pairs
    over the planted-duplicate corpus, hash-min connected components,
    one canonical doc per component. The DuckDB oracle recomputes the
    transitive closure with a recursive CTE — a green hash certifies
    the distributed fixpoint against an independent reachability
    computation.

    Round 4: a synthetic 13-node CHAIN (ids 5000000..5000012, diameter
    12) is unioned into the candidate edges — LSH clusters are shallow,
    so without it the fixpoint converges in 2-3 rounds and its DEPTH is
    never value-checked; the chain forces ~12 propagation rounds
    through the same driver-checked row."""
    from .operators.dedup import connected_components, minhash_candidates

    corpus = _with_dups(_t(spark, sf_dir, "documents"))
    cands = minhash_candidates(corpus, num_hashes=4, rows_per_band=2,
                               max_bucket_size=200)
    chain = spark.createDataFrame(
        [(5_000_000 + i, 5_000_000 + i + 1) for i in range(12)],
        "id_a long, id_b long")
    cc = connected_components(cands.unionByName(chain))
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).cast("long")
        .alias("canonical"),
    ).orderBy("doc_id")


SQL_DEDUP_CLUSTERS = rf"""
WITH RECURSIVE corpus AS ({_WITH_DUPS_SQL}),
sh AS ({_SHINGLES_SQL}),
sigs AS (
  SELECT doc_id,
    min(substr(md5(shingle), 1, 8)) AS sig0, min(substr(md5(shingle), 9, 8)) AS sig1,
    min(substr(md5(shingle), 17, 8)) AS sig2, min(substr(md5(shingle), 25, 8)) AS sig3
  FROM sh GROUP BY doc_id
), bands AS (
  SELECT doc_id, 0 AS band_idx, md5(sig0 || '|' || sig1) AS band_hash FROM sigs
  UNION ALL
  SELECT doc_id, 1 AS band_idx, md5(sig2 || '|' || sig3) AS band_hash FROM sigs
), gbands AS (
  SELECT doc_id, band_idx, band_hash FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY band_idx, band_hash) AS bsz
    FROM bands) WHERE bsz <= 200
), lsh_cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM gbands a JOIN gbands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
  WHERE a.doc_id < b.doc_id
), cands AS (
  SELECT id_a, id_b FROM lsh_cands
  UNION ALL
  SELECT 5000000 + i AS id_a, 5000000 + i + 1 AS id_b
  FROM generate_series(0, 11) t(i)
), edges AS (
  SELECT id_a AS u, id_b AS v FROM cands
  UNION ALL SELECT id_b, id_a FROM cands
), reach(node, lbl) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT e.u, r.lbl FROM edges e JOIN reach r ON r.node = e.v
)
SELECT node AS doc_id, min(lbl) AS cluster_id,
  CAST(min(lbl) = node AS BIGINT) AS canonical
FROM reach GROUP BY node ORDER BY doc_id
"""


def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup (remove-duplicated-passages): docs with
    doc_id % 10 == 7 get a 150-char passage of doc (id-5) appended —
    dedup_spans must excise those (plus any naturally shared ≥37-char
    canonical substrings, which this small-vocabulary corpus has) from
    the non-canonical (higher-id) copies. The oracle replays the whole
    winnow-with-positions → owner → interval-merge → complement-cut
    pipeline in DuckDB, so span boundaries AND the redacted strings
    are value-checked."""
    from .operators.dedup import dedup_spans

    base = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    src = base.select(F.col("doc_id").alias("_sid"),
                      F.col("text").alias("_stext"))
    planted = (
        base.join(src, F.col("_sid") == F.col("doc_id") - 5, "left")
        .select(
            "doc_id",
            F.when(
                (F.col("doc_id") % 10 == 7) & F.col("_sid").isNotNull(),
                F.concat(F.col("text"), F.lit(" "),
                         F.substring(F.col("_stext"), 1, 150)),
            ).otherwise(F.col("text")).alias("text"),
        )
    )
    return dedup_spans(planted, k=30, window=8).orderBy("doc_id")


SQL_DEDUP_SPANS = r"""
WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 150),
corpus AS (
  SELECT b.doc_id,
    CASE WHEN b.doc_id % 10 = 7 AND s.doc_id IS NOT NULL
         THEN b.text || ' ' || substr(s.text, 1, 150) ELSE b.text END AS text
  FROM base b LEFT JOIN base s ON s.doc_id = b.doc_id - 5
), norm AS (
  SELECT doc_id,
    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt
  FROM corpus
), grams AS (
  SELECT doc_id, length(nt) AS n,
    [CAST('0x' || substr(md5(substr(nt, i, 30)), 1, 8) AS BIGINT)
     FOR i IN generate_series(1, greatest(length(nt) - 29, 1))] AS g
  FROM norm
), occ AS (
  SELECT DISTINCT doc_id, w.fp AS fp, w.pos AS pos
  FROM (
    SELECT doc_id, unnest([
      struct_pack(fp := list_min(g[j:j+7]),
                  pos := j - 1 + list_position(g[j:j+7], list_min(g[j:j+7])))
      FOR j IN generate_series(1, greatest(len(g) - 7, 1))]) AS w
    FROM grams WHERE n >= 30)
), own AS (SELECT fp, MIN(doc_id) AS owner FROM occ GROUP BY fp),
dup AS (
  SELECT DISTINCT o.doc_id, o.pos AS s, o.pos + 29 AS e
  FROM occ o JOIN own ON o.fp = own.fp WHERE o.doc_id > own.owner
), flagged AS (
  SELECT doc_id, s, e,
    CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      OR s > max(e) OVER (PARTITION BY doc_id ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 38
    THEN 1 ELSE 0 END AS nw
  FROM dup
), isl AS (
  SELECT doc_id, s, e,
    SUM(nw) OVER (PARTITION BY doc_id ORDER BY s, e
                  ROWS UNBOUNDED PRECEDING) AS grp
  FROM flagged
), merged AS (
  SELECT doc_id, MIN(s) AS s, MAX(e) AS e FROM isl GROUP BY doc_id, grp
), iv AS (
  SELECT doc_id,
    array_agg(s ORDER BY s) AS ss, array_agg(e ORDER BY s) AS es
  FROM merged GROUP BY doc_id
)
SELECT iv.doc_id,
  CAST(len(ss) AS BIGINT) AS n_dup_spans,
  CAST(list_sum([es[i] - ss[i] + 1
                 FOR i IN generate_series(1, len(ss))]) AS BIGINT)
    AS dup_chars,
  array_to_string([CAST(ss[i] AS VARCHAR) || '-' || CAST(es[i] AS VARCHAR)
                   FOR i IN generate_series(1, len(ss))], ';') AS spans,
  COALESCE(array_to_string(
    [substr(nt, seg.st[i], greatest(seg.en[i] - seg.st[i] + 1, 0))
     FOR i IN generate_series(1, len(seg.st))], ''), '') AS redacted
FROM iv
JOIN norm n ON iv.doc_id = n.doc_id
CROSS JOIN LATERAL (SELECT
  list_prepend(1, [e + 1 FOR e IN es]) AS st,
  list_append([s - 1 FOR s IN ss], length(nt)) AS en) seg
ORDER BY iv.doc_id
"""


SQL_QUERIES_DEDUP = {
    "minhash_candidates": (q_minhash_candidates, SQL_MINHASH_CANDIDATES),
    "dedup_spans": (q_dedup_spans, SQL_DEDUP_SPANS),
    "jaccard_pairs": (q_jaccard_pairs, SQL_JACCARD_PAIRS),
    "dedup_clusters": (q_dedup_clusters, SQL_DEDUP_CLUSTERS),
    # "cosine_topk" + "ann_bucketed" folded into similarity_topk and
    # "simhash" into simhash_near_dups (round 5 driver-window folds);
    # every half is still value-checked
    "similarity_topk": (q_similarity_topk, SQL_SIMILARITY_TOPK),
}


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (dedup family, embedding space)
# ---------------------------------------------------------------------------

_ND_BITS = 8
_ND_SEED = 7
_ND_BUCKET_CAP = 200


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted exact duplicates (id+1e6, same vector) must all surface;
    the SQL oracle replays the hyperplane bucketing, the 1-bit-masked
    multiprobe unions and the exact cosine verification."""
    from .operators.similarity import embedding_near_dups

    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.select("vec_id", "embedding").unionByName(
        emb.select((F.col("vec_id") + 1_000_000).alias("vec_id"),
                   "embedding"))
    out = embedding_near_dups(corpus, threshold=0.95, n_bits=_ND_BITS,
                              seed=_ND_SEED, multiprobe=1, dim=_ANN_DIM,
                              max_bucket_size=_ND_BUCKET_CAP)
    return out.select(
        "id_a", "id_b", _micro(F.col("cosine")).alias("cosine_micro")
    ).orderBy("id_a", "id_b")


def _sql_embedding_near_dups() -> str:
    from .operators.similarity import random_hyperplanes

    planes = random_hyperplanes(_ANN_DIM, _ND_BITS, _ND_SEED)

    def dot(col: str, h: list[float]) -> str:
        return "(" + " + ".join(
            f"CAST({col}[{j + 1}] AS DOUBLE) * ({x!r})"
            for j, x in enumerate(h)) + ")"

    bucket = "(" + " + ".join(
        f"CASE WHEN {dot('embedding', h)} > 0 THEN {1 << i} ELSE 0 END"
        for i, h in enumerate(planes)) + ")"
    full = (1 << _ND_BITS) - 1
    masked_joins = "\n  UNION ALL ".join(
        f"""SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM capped a JOIN capped b
        ON (a.bucket & {full ^ (1 << i)}) = (b.bucket & {full ^ (1 << i)})
           AND a.vec_id < b.vec_id"""
        for i in range(_ND_BITS))
    return f"""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL SELECT vec_id + 1000000, embedding FROM embeddings
), bucketed AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM corpus
), capped AS (
  SELECT vec_id, embedding, bucket FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY bucket) AS _sz FROM bucketed
  ) WHERE _sz <= {_ND_BUCKET_CAP}
), pairs AS (
  SELECT DISTINCT id_a, id_b FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM capped a JOIN capped b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    UNION ALL {masked_joins}
  )
), scored AS (
  SELECT p.id_a, p.id_b,
    list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)
              FOR i IN generate_series(1, len(a.embedding))]) /
    (sqrt(list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)
              FOR i IN generate_series(1, len(a.embedding))])) *
     sqrt(list_sum([CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)
              FOR i IN generate_series(1, len(b.embedding))]))) AS cosine
  FROM pairs p
  JOIN bucketed a ON a.vec_id = p.id_a
  JOIN bucketed b ON b.vec_id = p.id_b
)
SELECT id_a, id_b, CAST(floor(cosine*1e6+0.5) AS BIGINT) AS cosine_micro
FROM scored WHERE cosine >= 0.95
ORDER BY id_a, id_b
"""


SQL_QUERIES_DEDUP["embedding_near_dups"] = (
    q_embedding_near_dups, _sql_embedding_near_dups())
