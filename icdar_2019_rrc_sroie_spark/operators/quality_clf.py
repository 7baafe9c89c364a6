"""fastText-style document quality classifier (round 5).

CCNet-style pipelines gate documents with a linear classifier over
hashed bag-of-n-gram features (Wenzek et al. 2020 §4.3; Joulin et al.
2017). This module serves corpus-trained weights
(``models/quality_clf.json``, produced deterministically by
``tools/train_quality.py``) as PURE Catalyst — no UDF, no join, no
shuffle:

* features: unigrams + bigrams of the normalized token sequence,
  hashed to ``d`` buckets with the engine-portable md5-substring trick
  (``conv(substr(md5(g),1,8),16,10) % d`` — DuckDB computes the
  identical value, so the oracle checks exact scores);
* the weight vector rides the plan as a LITERAL array (constant-folded
  by Catalyst into one ArrayData — the same broadcast-as-literal
  discipline as ``sign_bucket_expr``'s hyperplanes), and the dot
  product is one ``aggregate`` over the row's gram buckets;
* scores stay in INTEGER micros end-to-end: the emitted numerator is
  ``b_micro * n_grams + Σ w_micro[h(g)]`` (the sign of the mean-pooled
  logit without ever dividing), so both engines agree bit-exactly —
  no float summation order to worry about.

Training pairs each real document with its token-SORTED corruption:
the unigram multiset is identical by construction, so the classifier
can only separate the classes through word-ORDER statistics (the
bigram buckets) — a held-out accuracy gate is pinned in
tests/test_quality_clf.py.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def default_weights_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "models", "quality_clf.json")


def load_weights(path: str | None = None) -> dict:
    with open(path or default_weights_path()) as f:
        return json.load(f)


def norm_tokens_expr(text: Column) -> Column:
    return F.split(
        F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "), " ")


def grams_expr(tokens: Column) -> Column:
    """Unigrams + space-joined bigrams of a token array."""
    n = F.size(tokens)
    bigrams = F.zip_with(
        F.slice(tokens, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(tokens, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.concat(tokens, bigrams)


def gram_bucket_expr(gram: Column, d: int) -> Column:
    """md5-substring feature hash — bit-identical in DuckDB as
    ``CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) % d``."""
    return F.conv(F.substring(F.md5(gram), 1, 8), 16, 10) \
        .cast("long") % F.lit(d)


def score_numer_expr(grams: Column, weights: dict) -> Column:
    """Integer-micro score numerator ``b_micro * n_grams +
    Σ w_micro[bucket(g)]`` — positive iff the mean-pooled logit is
    positive (n_grams > 0). The weight literal is constant-folded;
    ``grams`` should be a materialized column (argument position —
    evaluated once)."""
    from .litarrays import lit_long_array

    w = lit_long_array(weights["w_micro"])  # one py4j call for 1024 lits
    d = int(weights["d"])
    return (
        F.lit(int(weights["b_micro"])) * F.size(grams)
        + F.aggregate(
            grams,
            F.lit(0).cast("long"),
            lambda acc, g: acc + F.element_at(
                w, (gram_bucket_expr(g, d) + 1).cast("int")),
        )
    ).cast("long")


def quality_classify(df: DataFrame, weights: dict | None = None,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Per-doc classifier verdict: (id, ``clf_n_grams``,
    ``clf_numer_micro``, ``clf_is_quality``). One zero-shuffle
    projection; the gram array is materialized between projections so
    the bucket aggregate consumes it in argument position."""
    if weights is None:
        weights = load_weights()
    base = df.select(
        F.col(id_col),
        grams_expr(norm_tokens_expr(F.col(text_col))).alias("_g"))
    # r7: the numer fold is materialized in its own projection — as a
    # single select it appeared in TWO output columns (numer and the
    # >0 verdict) and the 1024-weight aggregate evaluated twice per
    # row. Multi-referenced non-cheap expressions block projection
    # collapse, so each fold now runs exactly once.
    scored = base.select(
        F.col(id_col),
        F.size("_g").cast("long").alias("clf_n_grams"),
        score_numer_expr(F.col("_g"), weights).alias("clf_numer_micro"))
    return scored.select(
        F.col(id_col),
        "clf_n_grams",
        "clf_numer_micro",
        (F.col("clf_numer_micro") > 0).cast("int").alias("clf_is_quality"),
    )


def clf_sql_exprs(weights: dict | None = None,
                  grams_sql: str = "pg") -> dict[str, str]:
    """DuckDB expression strings for the classifier columns over a
    grams list column ``{grams_sql}`` — same integer-micro arithmetic
    as :func:`score_numer_expr`, weight vector embedded as a list
    literal."""
    if weights is None:
        weights = load_weights()
    wl = "[" + ", ".join(str(int(x)) for x in weights["w_micro"]) + "]"
    d = int(weights["d"])
    b = int(weights["b_micro"])
    numer = (
        f"CAST({b} * len({grams_sql}) + COALESCE(list_sum("
        f"[({wl})[CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) % {d} + 1] "
        f"FOR g IN {grams_sql}]), 0) AS BIGINT)"
    )
    return {
        "n_grams": f"CAST(len({grams_sql}) AS BIGINT)",
        "numer": numer,
        "is_quality": f"CAST(CASE WHEN {numer} > 0 THEN 1 ELSE 0 END AS INT)",
    }
