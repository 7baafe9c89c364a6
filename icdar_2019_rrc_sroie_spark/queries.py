"""Driver-facing query battery.

Each entry pairs a PySpark DataFrame program with a semantically identical
ANSI-SQL oracle that DuckDB runs on the same parquet tables
(``CORRECTNESS_r{N}.json`` gate). Column names/aliases match exactly on
both sides; float outputs are fixed-point encoded as
``floor(x*1e6 + 0.5)`` BIGINT to dodge engine formatting/rounding drift.

Operator ids in the names refer to SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .constants import (
    DATE_PATTERN_1,
    DATE_PATTERN_2,
    TOTAL_PATTERN,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _micro(col):
    """Fixed-point encode a double for engine-independent comparison."""
    return F.floor(col * 1e6 + F.lit(0.5)).cast("long")


_MONTHS_SQL = "['JAN','FEB','MAR','APR','MAY','JUN','JUL','AUG','SEP','OCT','NOV','DEC']"

# ---------------------------------------------------------------------------
# X1+X2 date + total extraction over synthesized receipt lines
# (merged into one driver row in round 3 — the CORRECTNESS gate checks
# queries()[:50], so small single-operator queries pair up; the per-
# operator coverage mapping lives in COVERAGE.md §2)
# ---------------------------------------------------------------------------


def q_date_total_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    day = F.col("doc_id") % 28 + 1
    month = F.col("doc_id") % 12 + 1
    year = F.col("doc_id") % 4 + 2016
    months = F.array(*[F.lit(m) for m in
                       ("JAN", "FEB", "MAR", "APR", "MAY", "JUN",
                        "JUL", "AUG", "SEP", "OCT", "NOV", "DEC")])
    d2 = F.lpad(day.cast("string"), 2, "0")
    m2 = F.lpad(month.cast("string"), 2, "0")
    y2 = F.lpad((year % 100).cast("string"), 2, "0")
    style = F.col("doc_id") % 3
    datestr = (
        F.when(style == 0, F.concat(d2, F.lit("/"), m2, F.lit("/"), year))
        .when(style == 1, F.concat(year, F.lit("-"), m2, F.lit("-"), d2))
        .otherwise(F.concat(d2, F.lit(" "), F.element_at(months, month.cast("int")),
                            F.lit(" "), y2))
    )
    line = F.concat(F.lit("REG "), F.col("doc_id"), F.lit(" DATE: "),
                    datestr, F.lit(" POS 3"))
    m_1 = F.regexp_extract(line, DATE_PATTERN_1, 0)
    m_2 = F.regexp_extract(line, DATE_PATTERN_2, 0)
    date = F.trim(F.when(m_1 != "", m_1).otherwise(m_2))
    # X2 total extraction over a second synthesized amount line
    whole = F.col("doc_id") % 300 + 1
    cents = F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0")
    amount = F.concat(whole.cast("string"), F.lit("."), cents)
    tstyle = F.col("doc_id") % 4
    tline = (
        F.when(tstyle == 0, F.concat(F.lit("TOTAL RM"), amount))
        .when(tstyle == 1, F.concat(F.lit("AMOUNT DUE "), amount))
        .when(tstyle == 2, F.concat(F.lit("- "), amount))
        .otherwise(F.concat(F.lit("$"), amount, F.lit(" NETT")))
    )
    total = F.trim(F.regexp_extract(F.trim(tline), TOTAL_PATTERN, 0))
    return docs.select(
        F.col("doc_id"), date.alias("date"), total.alias("total")
    ).orderBy("doc_id")


SQL_DATE_TOTAL_EXTRACT = rf"""
WITH src AS (
  SELECT doc_id,
         doc_id % 28 + 1 AS day, doc_id % 12 + 1 AS month,
         doc_id % 4 + 2016 AS year, doc_id % 3 AS style
  FROM documents
), built AS (
  SELECT doc_id,
    'REG ' || doc_id || ' DATE: ' ||
    CASE WHEN style = 0 THEN lpad(CAST(day AS VARCHAR),2,'0') || '/' || lpad(CAST(month AS VARCHAR),2,'0') || '/' || year
         WHEN style = 1 THEN year || '-' || lpad(CAST(month AS VARCHAR),2,'0') || '-' || lpad(CAST(day AS VARCHAR),2,'0')
         ELSE lpad(CAST(day AS VARCHAR),2,'0') || ' ' || {_MONTHS_SQL}[month] || ' ' || lpad(CAST(year % 100 AS VARCHAR),2,'0')
    END || ' POS 3' AS line
  FROM src
), tbuilt AS (
  SELECT doc_id,
    CASE doc_id % 4
      WHEN 0 THEN 'TOTAL RM' || (doc_id % 300 + 1) || '.' || lpad(CAST(doc_id % 100 AS VARCHAR),2,'0')
      WHEN 1 THEN 'AMOUNT DUE ' || (doc_id % 300 + 1) || '.' || lpad(CAST(doc_id % 100 AS VARCHAR),2,'0')
      WHEN 2 THEN '- ' || (doc_id % 300 + 1) || '.' || lpad(CAST(doc_id % 100 AS VARCHAR),2,'0')
      ELSE '$' || (doc_id % 300 + 1) || '.' || lpad(CAST(doc_id % 100 AS VARCHAR),2,'0') || ' NETT'
    END AS tline
  FROM documents
)
SELECT b.doc_id,
  trim(CASE WHEN regexp_extract(b.line, '{DATE_PATTERN_1}', 0) <> ''
            THEN regexp_extract(b.line, '{DATE_PATTERN_1}', 0)
            ELSE regexp_extract(b.line, '{DATE_PATTERN_2}', 0) END) AS date,
  trim(regexp_extract(trim(t.tline), '{TOTAL_PATTERN}', 0)) AS total
FROM built b JOIN tbuilt t ON b.doc_id = t.doc_id ORDER BY b.doc_id
"""

# ---------------------------------------------------------------------------
# W1 reading-order sort (tolerance-bucketed y, then x)
# ---------------------------------------------------------------------------


def _reading_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    x = (F.col("event_id") * 37 % 997).cast("long")
    y = (F.col("event_id") * 61 % 613).cast("long")
    return events.select(
        F.col("user_id").alias("doc_id"),
        F.col("event_id").alias("box_id"),
        x.alias("x"), y.alias("y"),
    )


def q_reading_order_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 scale path: tolerance-bucketed (floor(y/14), x) window — the
    relational APPROXIMATION of the reference comparator (the oracle
    mirrors the bucketed formulation, not misc.py:115-132; boundary
    parity is covered by reading_order + tests)."""
    from .operators.ordering import reading_order_bucketed

    pts = _reading_points(spark, sf_dir)
    out = reading_order_bucketed(pts)
    return out.select(
        F.col("doc_id").alias("user_id"),
        F.col("box_id").alias("event_id"),
        "x", "y", F.col("reading_pos").alias("rn"),
    ).orderBy("user_id", "rn")


def q_reading_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 default: EXACT reference comparator (misc.py:115-132) via the
    per-doc Arrow kernel — non-transitive, so no SQL oracle exists;
    rows-only here, parity pinned by tests/test_ordering_geometry.py."""
    from .operators.ordering import reading_order

    pts = _reading_points(spark, sf_dir)
    out = reading_order(pts)  # exact by default
    return out.select(
        F.col("doc_id").alias("user_id"),
        F.col("box_id").alias("event_id"),
        "x", "y", F.col("reading_pos").alias("rn"),
    ).orderBy("user_id", "rn")


SQL_READING_ORDER = """
WITH pts AS (
  SELECT user_id, event_id,
         CAST(event_id * 37 % 997 AS BIGINT) AS x,
         CAST(event_id * 61 % 613 AS BIGINT) AS y
  FROM events
)
SELECT user_id, event_id, x, y,
       CAST(row_number() OVER (PARTITION BY user_id
            ORDER BY CAST(floor(y / 14.0) AS BIGINT), x, event_id) AS INT) AS rn
FROM pts ORDER BY user_id, rn
"""

# ---------------------------------------------------------------------------
# W3 run-length segmentation (gaps and islands) over event_type sequences
# ---------------------------------------------------------------------------


def q_runs_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    change = (
        F.lag("event_type").over(w).isNull()
        | (F.col("event_type") != F.lag("event_type").over(w))
    ).cast("int")
    runs = events.withColumn(
        "run_id",
        F.sum(change).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"),
    )
    return (
        runs.groupBy("user_id", "run_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("run_len"),
            F.first("event_type").alias("event_type"),
            F.min("event_id").alias("first_event"),
        )
        .orderBy("user_id", "run_id")
    )


SQL_RUNS_ISLANDS = """
WITH flagged AS (
  SELECT user_id, event_id, event_type, ts,
    CASE WHEN lag(event_type) OVER w IS NULL
              OR event_type <> lag(event_type) OVER w THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), runs AS (
  SELECT user_id, event_id, event_type,
    CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING) AS INT) AS run_id
  FROM flagged
)
SELECT user_id, run_id, CAST(COUNT(*) AS BIGINT) AS run_len,
       min(event_type) AS event_type, min(event_id) AS first_event
FROM runs GROUP BY user_id, run_id ORDER BY user_id, run_id
"""

# ---------------------------------------------------------------------------
# A8 top-k per group (hard-negative mining shape)
# ---------------------------------------------------------------------------


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_linenumber")
    )
    return (
        li.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("l_orderkey", "l_linenumber", "rk",
                _micro(F.col("l_extendedprice")).alias("price_micro"))
        .orderBy("l_orderkey", "rk")
    )


SQL_TOPK_PER_GROUP = """
SELECT l_orderkey, l_linenumber, rk,
       CAST(floor(l_extendedprice * 1e6 + 0.5) AS BIGINT) AS price_micro
FROM (
  SELECT l_orderkey, l_linenumber, l_extendedprice,
         CAST(row_number() OVER (PARTITION BY l_orderkey
              ORDER BY l_extendedprice DESC, l_linenumber ASC) AS INT) AS rk
  FROM lineitem
) WHERE rk <= 3 ORDER BY l_orderkey, rk
"""

# ---------------------------------------------------------------------------
# A2 dataset mean/std (Welford by Catalyst)
# ---------------------------------------------------------------------------


def q_mean_std(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            _micro(F.avg("l_quantity")).alias("mean_qty_micro"),
            _micro(F.stddev_pop("l_quantity")).alias("std_qty_micro"),
            _micro(F.avg("l_discount")).alias("mean_disc_micro"),
        )
        .orderBy("l_returnflag")
    )


SQL_MEAN_STD = """
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(floor(avg(l_quantity) * 1e6 + 0.5) AS BIGINT) AS mean_qty_micro,
  CAST(floor(stddev_pop(l_quantity) * 1e6 + 0.5) AS BIGINT) AS std_qty_micro,
  CAST(floor(avg(l_discount) * 1e6 + 0.5) AS BIGINT) AS mean_disc_micro
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""

# ---------------------------------------------------------------------------
# A3 class weights: max(1, log(mu * total / count))
# ---------------------------------------------------------------------------


def q_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
    total = docs.count()
    weight = F.greatest(
        F.lit(1.0), F.log(F.lit(1.02) * F.lit(float(total)) / F.col("cnt"))
    )
    return (
        counts.select("lang", F.col("cnt").cast("long").alias("cnt"),
                      _micro(weight).alias("weight_micro"))
        .orderBy("lang")
    )


SQL_CLASS_WEIGHTS = """
WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
     t AS (SELECT COUNT(*) AS total FROM documents)
SELECT lang, CAST(cnt AS BIGINT) AS cnt,
  CAST(floor(greatest(1.0, ln(1.02 * total / cnt)) * 1e6 + 0.5) AS BIGINT) AS weight_micro
FROM c, t ORDER BY lang
"""

def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-window fold (round 5): A2 dataset mean/std and A3 class
    weights as one discriminated union — both halves still fully
    value-checked, one correctness slot instead of two (frees a slot
    for the detection_sink oracle)."""
    ms = q_mean_std(spark, sf_dir).select(
        F.lit("mean_std").alias("src"),
        F.col("l_returnflag").alias("key"), "n",
        F.col("mean_qty_micro").alias("m1"),
        F.col("std_qty_micro").alias("m2"),
        F.col("mean_disc_micro").alias("m3"),
    )
    cw = q_class_weights(spark, sf_dir).select(
        F.lit("class_weights").alias("src"), F.col("lang").alias("key"),
        F.col("cnt").alias("n"), F.col("weight_micro").alias("m1"),
        F.lit(None).cast("long").alias("m2"),
        F.lit(None).cast("long").alias("m3"),
    )
    return ms.unionByName(cw).orderBy("src", "key")


SQL_CORPUS_STATS = """
SELECT 'mean_std' AS src, l_returnflag AS key, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(floor(avg(l_quantity) * 1e6 + 0.5) AS BIGINT) AS m1,
  CAST(floor(stddev_pop(l_quantity) * 1e6 + 0.5) AS BIGINT) AS m2,
  CAST(floor(avg(l_discount) * 1e6 + 0.5) AS BIGINT) AS m3
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT 'class_weights', lang, CAST(cnt AS BIGINT),
  CAST(floor(greatest(1.0, ln(1.02 * total / cnt)) * 1e6 + 0.5) AS BIGINT),
  NULL, NULL
FROM (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
     (SELECT COUNT(*) AS total FROM documents)
ORDER BY src, key
"""

# ---------------------------------------------------------------------------
# S6/J7 equi-join + projection: labeled-line generator shape
# ---------------------------------------------------------------------------


def q_join_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.countDistinct("l_orderkey").cast("long").alias("n_orders"),
            # sum exact integer cents: FP addition order differs per engine
            F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
        )
        .orderBy("o_orderstatus")
    )


SQL_JOIN_INTERSECTION = """
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""

# A11 anti-join validation now lives inside queries_clean.q_set_algebra
# (round-3 merge to free driver-window slots; operator unchanged).

# ---------------------------------------------------------------------------
# Text analysis (merged driver rows, round 3 — see COVERAGE.md §2):
#   doc_text_profile  = token stats/TTR + BPE-ish token count (dedup
#                       family pretokenizer) + md5 fingerprint
#   text_quality_lang = quality scoring + language-ID heuristic
# ---------------------------------------------------------------------------


def _doc_profile(docs: DataFrame) -> DataFrame:
    """The profile-only projection (token stats / TTR / BPE-ish count /
    fingerprint) — one codegen pass, no joins. Benched on its own as
    ``doc_text_profile`` so its cost is legible round-over-round; the
    decontamination semi-join is benched separately (round-4 split,
    VERDICT r3 'What's wrong' #3)."""
    from .operators.dedup import bpe_token_count

    tokens = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(tokens).cast("long")
    n_uniq = F.size(F.array_distinct(tokens)).cast("long")
    n_chars = F.length("text").cast("long")
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_uniq.alias("n_uniq"),
        n_chars.alias("n_chars_actual"),
        _micro(n_uniq / n_tokens).alias("ttr_micro"),
        bpe_token_count(F.col("text")).cast("long").alias("n_bpe_tokens"),
        F.md5(normalized).alias("fingerprint"),
    )


def q_doc_text_profile_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only: the profile projection without the decontamination
    join (the driver-checked query below keeps both merged)."""
    return _doc_profile(_t(spark, sf_dir, "documents"))


def q_doc_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc text profile; extended (round 3) with benchmark
    decontamination hit counts: docs with doc_id % 97 == 3 play the
    eval set, and every doc sharing one of their 8-grams carries its
    hit count — the operator's broadcast semi-join, value-checked
    (the oracle matches on gram STRINGS where the operator matches on
    xxhash64(gram); identical results absent a 64-bit collision).
    Round 5 adds the TRAINED-BPE columns (``n_bpe_true_tokens`` +
    ``bpe_stream_md5`` — an md5 of the full in-order token stream):
    corpus-trained merges applied with the canonical greedy loop in an
    Arrow kernel, replayed by the oracle as a DuckDB recursive CTE
    (operators/bpe.py)."""
    from .operators.bpe import bpe_profile
    from .operators.dedup import decontaminate

    docs = _t(spark, sf_dir, "documents")
    eval_set = docs.filter(F.col("doc_id") % 97 == 3) \
        .select(F.col("doc_id").alias("qid"), "text")
    hits = decontaminate(docs, eval_set, k=8)
    return _doc_profile(docs).join(hits, "doc_id", "left") \
        .withColumn("n_eval_hits",
                    F.coalesce(F.col("n_hits"), F.lit(0)).cast("long")) \
        .drop("n_hits") \
        .join(bpe_profile(docs), "doc_id", "left") \
        .orderBy("doc_id")


def _sql_doc_text_profile() -> str:
    """Built at import: embeds the trained BPE merge table (a VALUES
    list) into the recursive-CTE replay of the canonical greedy BPE."""
    from .operators.bpe import bpe_sql_ctes

    return "WITH RECURSIVE " + bpe_sql_ctes() + r""",
toks AS (
  SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS tokens
  FROM documents
), nt AS (
  SELECT doc_id, regexp_split_to_array(
    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '\s+') AS t
  FROM documents
), ng AS (
  SELECT doc_id, unnest(
    [t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4]
       ||' '||t[i+5]||' '||t[i+6]||' '||t[i+7]
     FOR i IN generate_series(1, greatest(len(t)-7, 0))]) AS g
  FROM nt
), ev AS (SELECT DISTINCT g FROM ng WHERE doc_id % 97 = 3),
hits AS (
  SELECT ng.doc_id, CAST(COUNT(*) AS BIGINT) AS n_eval_hits
  FROM ng JOIN ev ON ng.g = ev.g GROUP BY ng.doc_id
)
SELECT toks.doc_id,
  CAST(len(tokens) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(tokens)) AS BIGINT) AS n_uniq,
  CAST(length(text) AS BIGINT) AS n_chars_actual,
  CAST(floor(CAST(len(list_distinct(tokens)) AS DOUBLE) / len(tokens) * 1e6 + 0.5) AS BIGINT) AS ttr_micro,
  CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+'))
    AS BIGINT) AS n_bpe_tokens,
  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
  COALESCE(hits.n_eval_hits, 0) AS n_eval_hits,
  COALESCE(bpe_doc.n_bpe_true_tokens, 0) AS n_bpe_true_tokens,
  COALESCE(bpe_doc.bpe_stream_md5, md5('')) AS bpe_stream_md5
FROM toks LEFT JOIN hits ON toks.doc_id = hits.doc_id
LEFT JOIN bpe_doc ON toks.doc_id = bpe_doc.doc_id
ORDER BY toks.doc_id
"""


SQL_DOC_TEXT_PROFILE = _sql_doc_text_profile()


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level TF-IDF keyword extraction (training-data curation:
    topic tagging / stopword discovery): tokenize → per-(doc, term) TF
    → per-term document frequency → IDF → top-3 terms per doc.

    Scale shape: two hash aggregations (term stats partial-agg
    map-side) + one broadcast of the tiny corpus-size scalar + one
    window top-k partitioned by doc — no self-joins, no collect. IDF
    is quantized to integer micros BEFORE the TF multiply so the
    ranking key is exact integer arithmetic in both engines."""
    from .operators.indexes import track_persist

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    terms = docs.select(
        "doc_id", F.explode(F.split(norm, " ")).alias("term"))
    # tf is the index both downstream aggregates consume — persist it
    # once or the df branch re-runs the corpus explode (same policy as
    # the LSH bands index)
    tf = track_persist(terms.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")))
    df_ = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"))
    n_docs = tf.select("doc_id").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"))
    idf_micro = F.floor(
        F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) * 1e6 + 0.5
    ).cast("long")
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select("doc_id", "term", "tf", idf_micro.alias("idf_micro"))
        .withColumn("score_micro", F.col("tf") * F.col("idf_micro"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_micro"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", F.col("rnk").cast("long").alias("rnk"),
                "term", "tf", "score_micro")
        .orderBy("doc_id", "rnk")
    )


SQL_TFIDF_TOPK = r"""
WITH corpus AS (
  SELECT doc_id,
    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
  FROM documents WHERE doc_id < 300
), terms AS (
  SELECT doc_id, unnest(string_split(norm, ' ')) AS term FROM corpus
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM terms GROUP BY doc_id, term
), df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
    tf.tf * CAST(floor(ln(((SELECT COUNT(DISTINCT doc_id) FROM tf) + 1.0)
                          / (df.df + 1.0)) * 1e6 + 0.5) AS BIGINT) AS score_micro
  FROM tf JOIN df ON tf.term = df.term
)
SELECT doc_id, rnk, term, tf, score_micro FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY doc_id ORDER BY score_micro DESC, term ASC) AS BIGINT) AS rnk
  FROM scored
) WHERE rnk <= 3 ORDER BY doc_id, rnk
"""


def q_lm_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM quality scoring (the CCNet-style filtering signal:
    rank documents by their likelihood under a language model — here
    the corpus's own n-gram distributions, the built-in-only analog of
    a wiki-LM perplexity filter): per doc the summed unigram
    log-probability p(t) = count(t)/total AND (round 4, CCNet
    fidelity) the summed add-1-smoothed bigram log-probability
    p(b|a) = (count(a b) + 1) / (count(a) + V).

    Same scale shape as tfidf_topk, twice: a persisted per-doc n-gram
    index, a hash-agg corpus-count dim joined back on the gram, and
    broadcast scalars (total tokens, vocabulary size). Log-probs are
    quantized to integer micros PER GRAM before the weighted sum, so
    the per-doc totals are exact integer arithmetic in both engines.
    Lower sum per token = rarer vocabulary/transitions."""
    from .operators.dedup import word_shingles
    from .operators.indexes import track_persist

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    terms = docs.select(
        "doc_id", F.explode(F.split(norm, " ")).alias("term"))
    tf = track_persist(terms.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")))
    freq = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    total = freq.agg(F.sum("cnt").cast("double").alias("total"))
    lp_micro = F.floor(
        F.log(F.col("cnt") / F.col("total")) * 1e6 + 0.5).cast("long")
    scored = (
        tf.join(F.broadcast(freq), "term")
        .crossJoin(F.broadcast(total))
        .select("doc_id", "tf", lp_micro.alias("lp_micro"))
    )
    uni = (
        scored.groupBy("doc_id")
        .agg(F.sum("tf").cast("long").alias("n_tokens"),
             F.sum(F.col("tf") * F.col("lp_micro")).cast("long")
             .alias("sum_lp_micro"))
    )
    # bigram half: word_shingles(k=2) tokenizes identically to the
    # unigram split (both run over the canonical text)
    bgrams = docs.select(
        "doc_id", F.explode(word_shingles(F.col("text"), 2)).alias("bg"))
    tf2 = track_persist(bgrams.groupBy("doc_id", "bg").agg(
        F.count(F.lit(1)).cast("long").alias("tf2")))
    c2 = tf2.groupBy("bg").agg(F.sum("tf2").alias("c2"))
    vocab = freq.agg(F.count(F.lit(1)).cast("long").alias("v"))
    ctx = freq.select(F.col("term").alias("_a"), F.col("cnt").alias("ca"))
    lp2_micro = F.floor(
        F.log((F.col("c2") + F.lit(1.0)) / (F.col("ca") + F.col("v")))
        * 1e6 + 0.5).cast("long")
    scored2 = (
        tf2.join(c2, "bg")
        .withColumn("_a", F.split(F.col("bg"), " ").getItem(0))
        .join(F.broadcast(ctx), "_a")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", "tf2", lp2_micro.alias("lp2_micro"))
    )
    bi = (
        scored2.groupBy("doc_id")
        .agg(F.sum("tf2").cast("long").alias("n_bigrams"),
             F.sum(F.col("tf2") * F.col("lp2_micro")).cast("long")
             .alias("sum_lp2_micro"))
    )
    return (
        uni.join(bi, "doc_id", "left")
        .select("doc_id", "n_tokens", "sum_lp_micro",
                F.coalesce("n_bigrams", F.lit(0)).cast("long")
                .alias("n_bigrams"),
                F.coalesce("sum_lp2_micro", F.lit(0)).cast("long")
                .alias("sum_lp2_micro"))
        .orderBy("doc_id")
    )


SQL_LM_LOGPROB = r"""
WITH corpus AS (
  SELECT doc_id,
    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
  FROM documents WHERE doc_id < 400
), terms AS (
  SELECT doc_id, unnest(string_split(norm, ' ')) AS term FROM corpus
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM terms GROUP BY doc_id, term
), freq AS (
  SELECT term, SUM(tf) AS cnt FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id, tf.tf,
    CAST(floor(ln(freq.cnt / (SELECT CAST(SUM(cnt) AS DOUBLE) FROM freq))
               * 1e6 + 0.5) AS BIGINT) AS lp_micro
  FROM tf JOIN freq ON tf.term = freq.term
), uni AS (
  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
    CAST(SUM(tf * lp_micro) AS BIGINT) AS sum_lp_micro
  FROM scored GROUP BY doc_id
), bgrams AS (
  SELECT doc_id, unnest([t[i] || ' ' || t[i+1]
    FOR i IN generate_series(1, greatest(len(t) - 1, 0))]) AS bg
  FROM (SELECT doc_id, string_split(norm, ' ') AS t FROM corpus)
), tf2 AS (
  SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS tf2
  FROM bgrams GROUP BY doc_id, bg
), c2 AS (
  SELECT bg, SUM(tf2) AS c2 FROM tf2 GROUP BY bg
), scored2 AS (
  SELECT tf2.doc_id, tf2.tf2,
    CAST(floor(ln((c2.c2 + 1.0)
                  / (freq.cnt + (SELECT COUNT(*) FROM freq)))
               * 1e6 + 0.5) AS BIGINT) AS lp2_micro
  FROM tf2 JOIN c2 ON tf2.bg = c2.bg
  JOIN freq ON freq.term = string_split(tf2.bg, ' ')[1]
), bi AS (
  SELECT doc_id, CAST(SUM(tf2) AS BIGINT) AS n_bigrams,
    CAST(SUM(tf2 * lp2_micro) AS BIGINT) AS sum_lp2_micro
  FROM scored2 GROUP BY doc_id
)
SELECT uni.doc_id, n_tokens, sum_lp_micro,
  COALESCE(bi.n_bigrams, 0) AS n_bigrams,
  COALESCE(bi.sum_lp2_micro, 0) AS sum_lp2_micro
FROM uni LEFT JOIN bi ON uni.doc_id = bi.doc_id
ORDER BY uni.doc_id
"""


#: Deterministic per-language vowel decoration: the synthetic corpus
#: shares one vocabulary across lang labels, so language is made to
#: manifest in the BYTES (same planting pattern as the PII columns in
#: text_quality_lang) — the model then has something real to learn.
LANGID_VOWELS = (("de", "äëïöü"), ("fr", "àéîôù"),
                 ("es", "áéíóú"), ("zh", "丫也依哦乌"))


def q_langid_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language identification via corpus-trained character-trigram
    profiles (the textcat / langid.py n-gram family — a first-class
    model upgrade over text_quality_lang's stopword heuristic):
    training docs (doc_id < 300) build a top-40 trigram profile per
    language; every doc is scored by how many of each profile's
    trigrams it contains, predicted language = argmax overlap
    (ties → lexicographic, integer-exact in both engines).

    Scale shape: one trigram explode (persisted — both the training
    agg and the scoring join consume it), a per-language hash agg +
    window top-k for the profiles (tiny: langs × 40 rows → broadcast
    into the scoring join), one distinct + broadcast join + hash agg +
    per-doc window for scoring. No self-joins; the profile dim is the
    only state, exactly the CLD/langid serving shape at corpus scale.
    """
    from .operators.indexes import track_persist

    docs = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    surf = norm
    for lang, repl in LANGID_VOWELS:
        surf = F.when(F.col("lang") == lang,
                      F.translate(norm, "aeiou", repl)).otherwise(surf)
    base = docs.select("doc_id", "lang", surf.alias("_t"))
    n = F.length("_t")
    tris = F.when(
        n >= 3,
        F.transform(F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1))),
                    lambda i: F.col("_t").substr(i, F.lit(3)))
    ).otherwise(F.array().cast("array<string>"))
    tri_rows = track_persist(
        base.select("doc_id", "lang", F.explode(tris).alias("tri")))
    counts = (
        tri_rows.filter(F.col("doc_id") < 300)
        .groupBy("lang", "tri")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("tri"))
    profile = (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 40)
        .select(F.col("lang").alias("cand_lang"), "tri")
    )
    doc_tris = tri_rows.select("doc_id", "tri").distinct()
    overlap = (
        doc_tris.join(F.broadcast(profile), "tri")
        .groupBy("doc_id", "cand_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("ov"))
    )
    w2 = Window.partitionBy("doc_id").orderBy(F.desc("ov"),
                                              F.asc("cand_lang"))
    pred = overlap.withColumn("rk", F.row_number().over(w2)) \
        .filter(F.col("rk") == 1)
    return (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id", "left")
        .select(
            "doc_id", "lang",
            F.coalesce("cand_lang", F.lit("")).alias("pred_lang"),
            F.coalesce("ov", F.lit(0)).cast("long").alias("overlap"),
            (F.coalesce("cand_lang", F.lit("")) == F.col("lang"))
            .cast("long").alias("correct"),
        )
        .orderBy("doc_id")
    )


SQL_LANGID_TRIGRAM = r"""
WITH surf AS (
  SELECT doc_id, lang,
    CASE lang
      WHEN 'de' THEN translate(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), 'aeiou', 'äëïöü')
      WHEN 'fr' THEN translate(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), 'aeiou', 'àéîôù')
      WHEN 'es' THEN translate(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), 'aeiou', 'áéíóú')
      WHEN 'zh' THEN translate(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), 'aeiou', '丫也依哦乌')
      ELSE regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
    END AS t
  FROM documents
), tri AS (
  SELECT doc_id, lang, unnest(
    [substr(t, i, 3) FOR i IN generate_series(1, greatest(length(t) - 2, 1))]
  ) AS tri
  FROM surf WHERE length(t) >= 3
), counts AS (
  SELECT lang, tri, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tri WHERE doc_id < 300 GROUP BY lang, tri
), profile AS (
  SELECT lang AS cand_lang, tri FROM (
    SELECT *, row_number() OVER (
      PARTITION BY lang ORDER BY cnt DESC, tri ASC) AS rk
    FROM counts) WHERE rk <= 40
), doc_tris AS (
  SELECT DISTINCT doc_id, tri FROM tri
), overlap AS (
  SELECT d.doc_id, p.cand_lang, CAST(COUNT(*) AS BIGINT) AS ov
  FROM doc_tris d JOIN profile p ON d.tri = p.tri
  GROUP BY d.doc_id, p.cand_lang
), pred AS (
  SELECT doc_id, cand_lang, ov FROM (
    SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY ov DESC, cand_lang ASC) AS rk
    FROM overlap) WHERE rk = 1
)
SELECT s.doc_id, s.lang,
  COALESCE(p.cand_lang, '') AS pred_lang,
  COALESCE(p.ov, 0) AS overlap,
  CAST(CASE WHEN COALESCE(p.cand_lang, '') = s.lang
       THEN 1 ELSE 0 END AS BIGINT) AS correct
FROM (SELECT doc_id, lang FROM documents) s
LEFT JOIN pred p ON s.doc_id = p.doc_id
ORDER BY s.doc_id
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic class rebalancing (training-data curation: cap
    every language at the rarest language's count, in expectation):
    per-class counts → broadcast the tiny rates dim → keep a row iff
    its portable content hash falls under the class rate. The md5
    bucket is engine-independent, so the oracle reproduces the EXACT
    row set — sampling without RNG state, reproducible at any scale
    (the same technique as the IVF trainer's hash-threshold sample)."""
    docs = _t(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_lang"))
    # min over the (tiny) per-class agg via an unpartitioned window —
    # one scan of the fact table total, no second counts subplan
    min_n = F.min("n_lang").over(Window.partitionBy())
    rates = counts.select(
        "lang",
        F.floor(min_n * F.lit(1_000_000.0) / F.col("n_lang"))
        .cast("long").alias("rate_ppm"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit("d"),
                                          F.col("doc_id").cast("string"))),
                           1, 8), 16, 10).cast("long") % 1_000_000
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .withColumn("bucket", bucket)
        .filter(F.col("bucket") < F.col("rate_ppm"))
        .select("doc_id", "lang", "bucket", "rate_ppm")
        .orderBy("doc_id")
    )


SQL_STRATIFIED_SAMPLE = """
WITH counts AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_lang FROM documents GROUP BY lang
), rates AS (
  SELECT lang,
    CAST(floor((SELECT MIN(n_lang) FROM counts) * 1000000.0 / n_lang)
         AS BIGINT) AS rate_ppm
  FROM counts
)
SELECT doc_id, d.lang, bucket, rate_ppm FROM (
  SELECT doc_id, lang,
    CAST('0x' || substr(md5('d' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
      % 1000000 AS bucket
  FROM documents
) d JOIN rates r ON d.lang = r.lang
WHERE bucket < rate_ppm ORDER BY doc_id
"""


def q_text_quality_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality + lang-ID heuristics, extended (round 3) with the PII
    scrub (operators/pii.py — counts + redacted text over a line with
    planted contact details) and the Gopher-style repetition signals
    (operators/boilerplate.py: duplicate-segment and top-bigram
    fractions) — all value-checked in this one driver row.

    Round 4 completes the Gopher quality rule-set (Rae et al. 2021
    §A1.1 heuristics): symbol-to-word ratio (# / ellipsis), fraction
    of lines starting with a bullet, fraction of lines ending in an
    ellipsis, mean word length, and alphabetic-word fraction — pure
    Catalyst regex/HOFs like the rest of the row (documents carry no
    newlines, so the '. '-delimited segments stand in for lines, the
    same proxy the repetition signals use).

    Round 5 adds the TRAINED fastText-style classifier
    (operators/quality_clf.py — logistic regression over hashed
    unigram+bigram buckets, weights as a constant-folded literal,
    integer-micro scores): each doc carries the classifier numerator
    for its real text AND for its token-sorted corruption (identical
    unigram multiset — only word-order statistics separate them), so
    the oracle value-checks the model on both classes."""
    from .operators.boilerplate import (
        dup_segment_fraction,
        top_bigram_fraction,
    )
    from .operators.pii import email_count, phone_count, redact_pii
    from .operators.quality_clf import (
        grams_expr,
        load_weights,
        norm_tokens_expr,
        score_numer_expr,
    )

    clf_w = load_weights()
    docs = _t(spark, sf_dir, "documents")
    docs = docs.withColumn(
        "_qg", grams_expr(norm_tokens_expr(F.col("text")))
    ).withColumn(
        "_qgn", grams_expr(F.array_sort(norm_tokens_expr(F.col("text")))))
    clf_numer = score_numer_expr(F.col("_qg"), clf_w)
    text = F.col("text")
    pii_text = F.concat(
        text, F.lit(" CONTACT d"), F.col("doc_id").cast("string"),
        F.lit("@shop.example.com TEL 012-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit("89"))
    n_chars = F.length(text)
    tokens = F.split(F.trim(text), r"\s+")
    n_tokens = F.size(tokens)
    stop_hits = F.size(
        F.filter(tokens, lambda t: t.isin("the", "a", "of", "and", "is"))
    )
    mean_tok_len = (n_chars - n_tokens + 1) / n_tokens
    quality = (
        (F.col("n_chars") >= 100)
        & (stop_hits / n_tokens >= 0.05)
        & (mean_tok_len >= 2.0)
    ).cast("int")
    en_hits = F.size(F.filter(tokens, lambda t: t.isin("the", "a", "of", "and")))
    pred = F.when(en_hits / n_tokens >= 0.02, F.lit("en")).otherwise(F.lit("other"))
    agree = (pred == F.col("lang")).cast("int")
    symbol_hits = F.size(
        F.regexp_extract_all(text, F.lit(r"#|\.\.\.|…"), 0))
    segs = F.filter(
        F.transform(F.split(text, r"\. "), lambda s: F.trim(s)),
        lambda s: F.length(s) > 0)
    n_segs = F.greatest(F.size(segs), F.lit(1))
    bullet_hits = F.size(F.filter(
        segs, lambda s: F.substring(s, 1, 1).isin("-", "*", "•")))
    ellipsis_hits = F.size(F.filter(
        segs, lambda s: s.endswith("...") | s.endswith("…")))
    alpha_hits = F.size(F.filter(tokens,
                                 lambda t: t.rlike("[A-Za-z]")))
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        stop_hits.cast("long").alias("stop_hits"),
        _micro(stop_hits / n_tokens).alias("stop_ratio_micro"),
        quality.alias("is_quality"),
        F.col("lang"), pred.alias("pred_lang"), agree.alias("agree"),
        email_count(pii_text).cast("long").alias("n_emails"),
        phone_count(pii_text).cast("long").alias("n_phones"),
        redact_pii(pii_text).alias("redacted"),
        _micro(dup_segment_fraction(text)).alias("dup_seg_micro"),
        _micro(top_bigram_fraction(text)).alias("top_bigram_micro"),
        _micro(symbol_hits / n_tokens).alias("symbol_ratio_micro"),
        _micro(bullet_hits / n_segs).alias("bullet_line_micro"),
        _micro(ellipsis_hits / n_segs).alias("ellipsis_line_micro"),
        _micro(mean_tok_len).alias("mean_word_len_micro"),
        _micro(alpha_hits / n_tokens).alias("alpha_word_micro"),
        F.size("_qg").cast("long").alias("clf_n_grams"),
        clf_numer.alias("clf_numer_micro"),
        (clf_numer > 0).cast("int").alias("clf_is_quality"),
        score_numer_expr(F.col("_qgn"), clf_w)
        .alias("clf_neg_numer_micro"),
    ).orderBy("doc_id")


def _sql_text_quality_lang() -> str:
    """Built at import: embeds the trained classifier weight vector as
    a list literal (twice — real-text and sorted-corruption scoring)."""
    from .operators.quality_clf import clf_sql_exprs

    pos = clf_sql_exprs(grams_sql="c.pg")
    neg = clf_sql_exprs(grams_sql="c.ng")
    return r"""
WITH pii AS (
  SELECT doc_id,
    text || ' CONTACT d' || doc_id || '@shop.example.com TEL 012-'
         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '89' AS pt
  FROM documents
), toks AS (
  SELECT doc_id, lang, n_chars, text AS orig_text, length(text) AS len_chars,
         regexp_split_to_array(trim(text), '\s+') AS tokens,
         regexp_split_to_array(trim(text), '\s+') AS btoks,
         [x FOR x IN [trim(seg) FOR seg IN regexp_split_to_array(text, '\. ')]
            IF length(x) > 0] AS segs
  FROM documents
), feat AS (
  SELECT doc_id, lang, n_chars, orig_text, len_chars, btoks, segs,
         len(tokens) AS n_tokens,
         len(list_filter(tokens, t -> t IN ('the','a','of','and','is'))) AS stop_hits,
         len(list_filter(tokens, t -> t IN ('the','a','of','and'))) AS en_hits,
         len(list_filter(tokens, t -> regexp_matches(t, '[A-Za-z]'))) AS alpha_hits
  FROM toks
), clf_toks AS (
  SELECT doc_id,
    regexp_split_to_array(
      regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS nt,
    list_sort(regexp_split_to_array(
      regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS st
  FROM documents
), clf AS (
  SELECT doc_id,
    list_concat(nt, [nt[i] || ' ' || nt[i+1]
      FOR i IN generate_series(1, greatest(len(nt)-1, 0))]) AS pg,
    list_concat(st, [st[i] || ' ' || st[i+1]
      FOR i IN generate_series(1, greatest(len(st)-1, 0))]) AS ng
  FROM clf_toks
)
SELECT f.doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
  CAST(stop_hits AS BIGINT) AS stop_hits,
  CAST(floor(CAST(stop_hits AS DOUBLE) / n_tokens * 1e6 + 0.5) AS BIGINT) AS stop_ratio_micro,
  CAST(CASE WHEN n_chars >= 100
             AND CAST(stop_hits AS DOUBLE)/n_tokens >= 0.05
             AND CAST(len_chars - n_tokens + 1 AS DOUBLE)/n_tokens >= 2.0
        THEN 1 ELSE 0 END AS INT) AS is_quality,
  lang,
  CASE WHEN CAST(en_hits AS DOUBLE)/n_tokens >= 0.02 THEN 'en' ELSE 'other' END AS pred_lang,
  CAST(CASE WHEN (CASE WHEN CAST(en_hits AS DOUBLE)/n_tokens >= 0.02 THEN 'en' ELSE 'other' END) = lang
        THEN 1 ELSE 0 END AS INT) AS agree,
  CAST(len(regexp_extract_all(p.pt,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(
    regexp_replace(p.pt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                   '[EMAIL]', 'g'),
    '\+?\d[\d\- ]{7,}\d')) AS BIGINT) AS n_phones,
  regexp_replace(
    regexp_replace(p.pt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                   '[EMAIL]', 'g'),
    '\+?\d[\d\- ]{7,}\d', '[PHONE]', 'g') AS redacted,
  CAST(floor(CASE WHEN len(f.segs) > 0
        THEN CAST(len(f.segs) - len(list_distinct(f.segs)) AS DOUBLE) / len(f.segs)
        ELSE 0.0 END * 1e6 + 0.5) AS BIGINT) AS dup_seg_micro,
  CAST(floor(CASE WHEN len(f.btoks) >= 2
        THEN CAST(list_max(
               [len(list_filter(bg, x -> x = d)) FOR d IN list_distinct(bg)])
             AS DOUBLE) / len(bg)
        ELSE 0.0 END * 1e6 + 0.5) AS BIGINT) AS top_bigram_micro,
  CAST(floor(CAST(len(regexp_extract_all(f.orig_text, '#|\.\.\.|…'))
        AS DOUBLE) / n_tokens * 1e6 + 0.5) AS BIGINT) AS symbol_ratio_micro,
  CAST(floor(CAST(len(list_filter(f.segs,
        x -> substr(x, 1, 1) IN ('-', '*', '•'))) AS DOUBLE)
        / greatest(len(f.segs), 1) * 1e6 + 0.5) AS BIGINT)
    AS bullet_line_micro,
  CAST(floor(CAST(len(list_filter(f.segs,
        x -> x LIKE '%...' OR x LIKE '%…')) AS DOUBLE)
        / greatest(len(f.segs), 1) * 1e6 + 0.5) AS BIGINT)
    AS ellipsis_line_micro,
  CAST(floor(CAST(len_chars - n_tokens + 1 AS DOUBLE) / n_tokens
        * 1e6 + 0.5) AS BIGINT) AS mean_word_len_micro,
  CAST(floor(CAST(alpha_hits AS DOUBLE) / n_tokens * 1e6 + 0.5)
        AS BIGINT) AS alpha_word_micro,
  """ + pos["n_grams"] + r""" AS clf_n_grams,
  """ + pos["numer"] + r""" AS clf_numer_micro,
  """ + pos["is_quality"] + r""" AS clf_is_quality,
  """ + neg["numer"] + r""" AS clf_neg_numer_micro
FROM feat f
JOIN pii p ON f.doc_id = p.doc_id
JOIN clf c ON f.doc_id = c.doc_id
CROSS JOIN LATERAL (SELECT
  [f.btoks[i] || ' ' || f.btoks[i+1]
   FOR i IN generate_series(1, greatest(len(f.btoks) - 1, 0))] AS bg) b
ORDER BY f.doc_id
"""


SQL_TEXT_QUALITY_LANG = _sql_text_quality_lang()

# ---------------------------------------------------------------------------
# Exact dedup (fingerprint groupBy; the per-doc fingerprint itself is
# attested inside doc_text_profile)
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # duplicate the corpus with shifted ids to guarantee dup groups exist
    shifted = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    both = docs.select("doc_id", "text").unionByName(shifted)
    key = F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))
    return (
        both.withColumn("fp", key)
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).cast("long").alias("dup_cnt"),
        )
        .orderBy("keep_doc_id")
    )


SQL_DEDUP_EXACT = r"""
WITH unioned AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents
)
SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
       min(doc_id) AS keep_doc_id, CAST(COUNT(*) AS BIGINT) AS dup_cnt
FROM unioned GROUP BY fp ORDER BY keep_doc_id
"""

# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

SQL_QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "date_total_extract": (q_date_total_extract, SQL_DATE_TOTAL_EXTRACT),
    "reading_order": (q_reading_order, None),
    "reading_order_bucketed": (q_reading_order_bucketed, SQL_READING_ORDER),
    "runs_islands": (q_runs_islands, SQL_RUNS_ISLANDS),
    "topk_per_group": (q_topk_per_group, SQL_TOPK_PER_GROUP),
    # "mean_std" + "class_weights" folded into corpus_stats (round 5,
    # driver-window fold); both halves still value-checked there.
    "corpus_stats": (q_corpus_stats, SQL_CORPUS_STATS),
    "join_intersection": (q_join_intersection, SQL_JOIN_INTERSECTION),
    "doc_text_profile": (q_doc_text_profile, SQL_DOC_TEXT_PROFILE),
    "tfidf_topk": (q_tfidf_topk, SQL_TFIDF_TOPK),
    "lm_logprob": (q_lm_logprob, SQL_LM_LOGPROB),
    "stratified_sample": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "langid_trigram": (q_langid_trigram, SQL_LANGID_TRIGRAM),
    "text_quality_lang": (q_text_quality_lang, SQL_TEXT_QUALITY_LANG),
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
}


def _all_batches() -> dict:
    from .queries_dedup import SQL_QUERIES_DEDUP
    from .queries_geo import SQL_QUERIES_GEO
    from .queries_clean import SQL_QUERIES_CLEAN
    from .queries_parse import SQL_QUERIES_PARSE
    from .queries_pipeline import ROWS_ONLY_QUERIES
    from .queries_labeling import ROWS_ONLY_LABELING, SQL_QUERIES_LABELING
    from .queries_rules import SQL_QUERIES_RULES
    from .queries_training import ROWS_ONLY_TRAINING, SQL_QUERIES_TRAINING

    merged = dict(SQL_QUERIES)
    merged.update(SQL_QUERIES_TRAINING)
    merged.update(SQL_QUERIES_GEO)
    merged.update(SQL_QUERIES_DEDUP)
    merged.update(SQL_QUERIES_PARSE)
    merged.update(SQL_QUERIES_CLEAN)
    merged.update(SQL_QUERIES_LABELING)
    merged.update(SQL_QUERIES_RULES)
    merged.update(ROWS_ONLY_QUERIES)
    merged.update(ROWS_ONLY_LABELING)
    merged.update(ROWS_ONLY_TRAINING)
    from .queries_rules import q_extraction_f1, q_raster_stats
    merged["extraction_f1"] = (q_extraction_f1, None)
    merged["raster_stats"] = (q_raster_stats, None)
    # The driver's CORRECTNESS gate checks exactly queries()[:50] in
    # registry order — every oracle-backed query must sit inside that
    # window, rows-only entries go after it. Small single-operator
    # queries were merged (round 3) until the oracled set fits;
    # tests/test_registry.py pins both invariants.
    oracled = {n: v for n, v in merged.items() if v[1] is not None}
    rows_only = {n: v for n, v in merged.items() if v[1] is None}
    assert len(oracled) <= 50, (
        f"{len(oracled)} oracle-backed queries won't fit the driver's "
        "50-entry correctness window; merge queries, don't spill")
    return {**oracled, **rows_only}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _all_batches().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_, sql) in _all_batches().items()
        if sql is not None
    }
