"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, plus a sign-LSH
bucketed variant as the scale path (probe only matching buckets). Dot
products are pure Catalyst (`zip_with` + `aggregate`) — JVM-side, no
Python. At 100 TB the bucketed variant turns a full scan into a
partition-pruned scan when the table is written bucketed/partitioned by
``bucket``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(df: DataFrame, query: list[float], k: int = 10,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact brute-force top-k by cosine to a constant query vector."""
    q = F.array(*[F.lit(float(v)) for v in query])
    scored = df.select(
        F.col(id_col),
        cosine_expr(F.col(vec_col), q).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def sign_bucket_expr(vec: Column, n_bits: int = 4) -> Column:
    """Sign-LSH bucket from the first ``n_bits`` components."""
    bits = [
        F.when(F.element_at(vec, i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(n_bits)
    ]
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out.cast("int")


def ann_topk_bucketed(df: DataFrame, query: list[float], k: int = 10,
                      n_bits: int = 4, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: score only vectors in the query's sign bucket.

    The bucket predicate is a plain column filter, so with a
    bucket-partitioned layout it prunes at scan time.
    """
    q_bucket = 0
    for i in range(n_bits):
        if query[i] > 0:
            q_bucket |= 1 << i
    q = F.array(*[F.lit(float(v)) for v in query])
    scored = (
        df.withColumn("bucket", sign_bucket_expr(F.col(vec_col), n_bits))
        .filter(F.col("bucket") == q_bucket)
        .select(F.col(id_col), F.col("bucket"),
                cosine_expr(F.col(vec_col), q).alias("cosine"))
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)
