"""Query battery, batch 8: driver-visible oracles for the rule
operators that previously had only pytest coverage — W5 first-two-lines
company fallback, X6 rounding adjustment, X8 is_number, X12 clockwise
corner ordering, X15 label shift."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.entities import (
    company_fallback_expr,
    is_number_expr,
    total_fallback_expr,
)
from .operators.geometry import order_clockwise, shift_boxes


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _cases_sql(cases: list[str]) -> str:
    quoted = ", ".join("'" + c.replace("'", "''") + "'" for c in cases)
    return f"[{quoted}]"


# --------------------------------------------------------------------------
# W5 first-two-lines company fallback (entity_matching.py:192-201)
# --------------------------------------------------------------------------

_FALLBACK_CASES = [
    ("GOLDEN KEY MAKER", "SECOND LINE CO"),          # line 0 wins
    ("TAX INVOICE", "REAL COMPANY SDN BHD"),          # unwanted → line 1
    ("99 SPEED MART S/B", "OTHER"),                   # digit-leading verbatim
    ("12345", "FALLBACK TRADING"),                    # pure number → line 1
    ("RECEIPT", "67890"),                             # both rejected → ''
    ("MR STORE (A12B) HQ", "X"),                      # cleaned via pattern
]


def q_entity_fallbacks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 first-two-lines company fallback + X6 rounding adjustment,
    merged into one driver row (round 3): per doc, a synthesized
    two-line header drives the company fallback and a synthesized
    receipt tail (with/without a ROUNDING note) drives the total
    fallback."""
    docs = _t(spark, sf_dir, "documents")
    n = len(_FALLBACK_CASES)
    l0 = F.element_at(F.array(*[F.lit(a) for a, _ in _FALLBACK_CASES]),
                      (F.col("doc_id") % n + 1).cast("int"))
    l1 = F.element_at(F.array(*[F.lit(b) for _, b in _FALLBACK_CASES]),
                      (F.col("doc_id") % n + 1).cast("int"))
    cents = (F.col("doc_id") % 5000 + 100)
    amt = F.concat((cents / 100).cast("long").cast("string"), F.lit("."),
                   F.lpad((cents % 100).cast("string"), 2, "0"))
    noisy = F.col("doc_id") % 2 == 0
    tail = F.array(
        F.lit("SOME STORE"),
        F.lit("TOTAL DUE"),
        F.concat(F.lit("AMOUNT "), amt),
        F.when(noisy, F.lit("ROUNDING ADJ 0.05")).otherwise(F.lit("CASH")),
    )
    return docs.select(
        "doc_id", l0.alias("line0"), l1.alias("line1"),
        company_fallback_expr(F.array(l0, l1)).alias("company"),
        amt.alias("amt"), noisy.alias("noisy"),
        total_fallback_expr(tail).alias("total"),
    ).orderBy("doc_id")


def _clean_sql(col: str) -> str:
    """clean_company as a SQL CASE (same formulation the company_clean
    oracle uses)."""
    return f"""CASE
      WHEN regexp_matches(trim({col}), 'TAX|RECEIPT|INVOICE') THEN ''
      WHEN regexp_extract(trim({col}), '^(\\d+[^0-9]*[A-Z]+)$', 0) <> ''
        THEN trim(substr(trim({col}), 1,
          strpos(trim({col}), trim(regexp_extract(trim({col}), '^(\\d+[^0-9]*[A-Z]+)$', 0))) - 1))
      WHEN regexp_extract(trim({col}), '\\([A-Z]*\\d+[^0-9]*[A-Z]+\\).*$', 0) <> ''
        THEN trim(substr(trim({col}), 1,
          strpos(trim({col}), trim(regexp_extract(trim({col}), '\\([A-Z]*\\d+[^0-9]*[A-Z]+\\).*$', 0))) - 1))
      WHEN regexp_extract(trim({col}), '\\([A-Z\\s]+[\\)]*$', 0) <> ''
        THEN trim(substr(trim({col}), 1,
          strpos(trim({col}), trim(regexp_extract(trim({col}), '\\([A-Z\\s]+[\\)]*$', 0))) - 1))
      ELSE trim({col}) END"""


def _fallback_value_sql(col: str) -> str:
    return (f"CASE WHEN regexp_matches({col}, '^\\d+') THEN {col} "
            f"ELSE {_clean_sql(col)} END")


SQL_ENTITY_FALLBACKS = f"""
WITH src AS (
  SELECT doc_id,
    ({_cases_sql([a for a, _ in _FALLBACK_CASES])})[CAST(doc_id % {len(_FALLBACK_CASES)} + 1 AS INT)] AS line0,
    ({_cases_sql([b for _, b in _FALLBACK_CASES])})[CAST(doc_id % {len(_FALLBACK_CASES)} + 1 AS INT)] AS line1,
    CAST((doc_id % 5000 + 100) // 100 AS VARCHAR) || '.' ||
      lpad(CAST((doc_id % 5000 + 100) % 100 AS VARCHAR), 2, '0') AS amt,
    doc_id % 2 = 0 AS noisy
  FROM documents
), ok AS (
  SELECT *,
    NOT regexp_matches(line0, 'TAX|RECEIPT|INVOICE')
      AND regexp_matches(line0, '[^0-9]') AS ok0,
    NOT regexp_matches(line1, 'TAX|RECEIPT|INVOICE')
      AND regexp_matches(line1, '[^0-9]') AS ok1
  FROM src
)
SELECT doc_id, line0, line1,
  CASE WHEN ok0 THEN {_fallback_value_sql('line0')}
       WHEN ok1 THEN {_fallback_value_sql('line1')}
       ELSE '' END AS company,
  amt, noisy,
  CASE WHEN noisy
       THEN CAST(CAST(amt AS DOUBLE) + 0.05 AS VARCHAR)
       ELSE amt END AS total
FROM ok ORDER BY doc_id
"""

# --------------------------------------------------------------------------
# X8 is_number + X12 clockwise ordering + X15 shift (merged, round 3)
# --------------------------------------------------------------------------

_NUMBER_CASES = ["12345", "12.34", "", "00", "1A2", " 42", "999999999", "-1"]


def q_rule_kernels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 is_number over cycled string cases, plus X12/X15: build a
    quad with distinct corner coords, present its corners in a
    doc-dependent rotation, order clockwise, then shift by (dx, dy);
    emit the flattened coords. One driver row for three scalar
    kernels (round-3 merge)."""
    docs = _t(spark, sf_dir, "documents")
    nc = len(_NUMBER_CASES)
    t = F.element_at(F.array(*[F.lit(c) for c in _NUMBER_CASES]),
                     (F.col("doc_id") % nc + 1).cast("int"))
    x0 = (F.col("doc_id") % 50) * 10.0
    y0 = (F.col("doc_id") % 30) * 10.0
    tl = F.struct(x0.alias("x"), y0.alias("y"))
    tr = F.struct((x0 + 80).alias("x"), (y0 + 3).alias("y"))
    br = F.struct((x0 + 83).alias("x"), (y0 + 21).alias("y"))
    bl = F.struct((x0 + 2).alias("x"), (y0 + 18).alias("y"))
    rotations = F.array(
        F.array(tl, tr, br, bl), F.array(br, bl, tl, tr),
        F.array(bl, tl, tr, br), F.array(tr, br, bl, tl),
    )
    pts = F.element_at(rotations, (F.col("doc_id") % 4 + 1).cast("int"))
    ordered = order_clockwise(pts)
    box = F.struct(
        ordered[0]["x"].alias("xmin"), ordered[0]["y"].alias("ymin"),
        ordered[2]["x"].alias("xmax"), ordered[2]["y"].alias("ymax"),
    )
    dx = (F.col("doc_id") % 7).cast("double")
    dy = (F.col("doc_id") % 11).cast("double")
    shifted = F.element_at(shift_boxes(F.array(box), dx, dy), 1)
    return docs.select(
        "doc_id",
        t.alias("t"), is_number_expr(t).alias("is_num"),
        *[ordered[i][c].cast("long").alias(f"p{i}{c}")
          for i in range(4) for c in ("x", "y")],
        shifted["xmin"].cast("long").alias("sxmin"),
        shifted["ymin"].cast("long").alias("symin"),
        shifted["xmax"].cast("long").alias("sxmax"),
        shifted["ymax"].cast("long").alias("symax"),
    ).orderBy("doc_id")


SQL_RULE_KERNELS = f"""
WITH src AS (
  SELECT doc_id,
    ({_cases_sql(_NUMBER_CASES)})[CAST(doc_id % {len(_NUMBER_CASES)} + 1 AS INT)] AS t,
    (doc_id % 50) * 10.0 AS x0, (doc_id % 30) * 10.0 AS y0,
    CAST(doc_id % 7 AS DOUBLE) AS dx, CAST(doc_id % 11 AS DOUBLE) AS dy
  FROM documents
)
SELECT doc_id,
  t, NOT regexp_matches(t, '[^0-9]') AS is_num,
  CAST(x0 AS BIGINT) AS p0x, CAST(y0 AS BIGINT) AS p0y,
  CAST(x0 + 80 AS BIGINT) AS p1x, CAST(y0 + 3 AS BIGINT) AS p1y,
  CAST(x0 + 83 AS BIGINT) AS p2x, CAST(y0 + 21 AS BIGINT) AS p2y,
  CAST(x0 + 2 AS BIGINT) AS p3x, CAST(y0 + 18 AS BIGINT) AS p3y,
  CAST(x0 + dx AS BIGINT) AS sxmin, CAST(y0 + dy AS BIGINT) AS symin,
  CAST(x0 + 83 + dx AS BIGINT) AS sxmax, CAST(y0 + 21 + dy AS BIGINT) AS symax
FROM src ORDER BY doc_id
"""


SQL_QUERIES_RULES = {
    "entity_fallbacks": (q_entity_fallbacks, SQL_ENTITY_FALLBACKS),
    "rule_kernels": (q_rule_kernels, SQL_RULE_KERNELS),
}


# --------------------------------------------------------------------------
# §2.10 tumbling-window aggregation (batch-mode semantics of the
# streaming windowed_span_counts; the watermark itself is pytest-only)
# --------------------------------------------------------------------------


def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    out = (
        events.groupBy(
            F.window("ts", "10 minutes").alias("w"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
             .alias("value_cents"))
    )
    return out.select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("w_start"),
        "event_type", "n", "value_cents",
    ).orderBy("w_start", "event_type")


SQL_TUMBLING_WINDOW = """
SELECT strftime(time_bucket(INTERVAL '10 minutes', ts),
                '%Y-%m-%d %H:%M:%S') AS w_start,
       event_type, COUNT(*) AS n,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
"""


SQL_QUERIES_RULES["tumbling_window"] = (q_tumbling_window, SQL_TUMBLING_WINDOW)


# --------------------------------------------------------------------------
# U2 CTC greedy decode contract (operators/recognize.py) — one-hot logit
# frames synthesized from a deterministic symbol path; the full decode
# (argmax → collapse repeats → drop blanks → vocab map) runs in Spark,
# the oracle computes the same collapse/drop/map from the path.
# --------------------------------------------------------------------------


def q_ctc_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .constants import VOCAB
    from .operators.recognize import ctc_greedy_decode

    docs = _t(spark, sf_dir, "documents")
    frames = []
    for t in range(8):
        sym = (F.col("doc_id") * 7 + t * 3) % 5
        frames.append(F.array(*[
            F.when(sym == s, F.lit(1.0)).otherwise(F.lit(0.0))
            for s in range(5)
        ]))
    logits = F.array(*frames)
    return docs.select(
        "doc_id",
        ctc_greedy_decode(logits, VOCAB).alias("decoded"),
    ).orderBy("doc_id")


def _sql_ctc_decode() -> str:
    from .constants import VOCAB
    vocab_sql = VOCAB.replace("'", "''")
    return f"""
WITH src AS (
  SELECT doc_id,
    [(doc_id * 7 + (t - 1) * 3) % 5 FOR t IN generate_series(1, 8)] AS path
  FROM documents
), collapsed AS (
  SELECT doc_id,
    [path[i] FOR i IN generate_series(1, 8) IF i = 1 OR path[i] != path[i-1]]
      AS kept
  FROM src
)
SELECT doc_id,
  array_to_string(
    [substr('{vocab_sql}', CAST(c AS INT), 1)
     FOR c IN list_filter(kept, c -> c != 0)], '') AS decoded
FROM collapsed ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Skew machinery: two-phase salted count must equal the plain groupBy
# --------------------------------------------------------------------------


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.skew import salted_count

    events = _t(spark, sf_dir, "events")
    return salted_count(events, "event_type").orderBy("event_type")


SQL_SALTED_AGG = """
SELECT event_type, COUNT(*) AS n FROM events
GROUP BY event_type ORDER BY event_type
"""


# --------------------------------------------------------------------------
# X18 resize ratios over typed media metadata
# --------------------------------------------------------------------------


def q_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import resize_meta

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.concat(F.lit("m"), F.col("doc_id").cast("string")).alias("media_id"),
        F.lit("image").alias("kind"),
        F.struct(
            (F.col("doc_id") % 640 + 32).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 24).cast("int").alias("height"),
            F.lit(3).alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )
    out = resize_meta(media, target_w=512, target_h=256)
    return out.select(
        "media_id", "kind",
        F.floor(F.col("ratio_w") * 1e6 + 0.5).cast("long").alias("rw_micro"),
        F.floor(F.col("ratio_h") * 1e6 + 0.5).cast("long").alias("rh_micro"),
    ).orderBy("media_id")


SQL_RESIZE_META = """
SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id, 'image' AS kind,
  CAST(floor(512.0 / (doc_id % 640 + 32) * 1e6 + 0.5) AS BIGINT) AS rw_micro,
  CAST(floor(256.0 / (doc_id % 480 + 24) * 1e6 + 0.5) AS BIGINT) AS rh_micro
FROM documents ORDER BY media_id
"""


SQL_QUERIES_RULES["ctc_decode"] = (q_ctc_decode, _sql_ctc_decode())
SQL_QUERIES_RULES["salted_agg"] = (q_salted_agg, SQL_SALTED_AGG)
SQL_QUERIES_RULES["resize_meta"] = (q_resize_meta, SQL_RESIZE_META)


# --------------------------------------------------------------------------
# Curated-corrections workflow (fix_ocr_mismatches.csv parity): a small
# broadcast patch table replaces values keyed by (doc, field)
# --------------------------------------------------------------------------


def q_apply_corrections(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sinks import apply_corrections

    docs = _t(spark, sf_dir, "documents")
    spans = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit("company").alias("label"),
        F.upper(F.substring("text", 1, 20)).alias("text"),
    )
    corrections = docs.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit("company").alias("label"),
        F.concat(F.lit("FIXED "), F.col("doc_id").cast("string"))
        .alias("corrected"),
    )
    return apply_corrections(spans, corrections).orderBy("doc_id")


SQL_APPLY_CORRECTIONS = """
WITH spans AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, 'company' AS label,
         upper(substr(text, 1, 20)) AS text
  FROM documents
), corr AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, 'company' AS label,
         'FIXED ' || CAST(doc_id AS VARCHAR) AS corrected
  FROM documents WHERE doc_id % 10 = 0
)
SELECT s.doc_id, s.label, COALESCE(c.corrected, s.text) AS text
FROM spans s LEFT JOIN corr c ON s.doc_id = c.doc_id AND s.label = c.label
ORDER BY s.doc_id
"""

SQL_QUERIES_RULES["apply_corrections"] = (q_apply_corrections,
                                          SQL_APPLY_CORRECTIONS)


# --------------------------------------------------------------------------
# §2.3/§2.4 breadth: five-table star join with selective filters — the
# dim chain (region→nation→customer) broadcasts, lineitem⋈orders
# shuffles on the key; Catalyst plans it, the oracle pins the numbers.
# --------------------------------------------------------------------------


def q_orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    dims = (
        cust.join(F.broadcast(nat),
                  cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("c_custkey", "r_name")
    )
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .filter(F.col("o_orderstatus") != "F")
        .groupBy("r_name", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            # per-row round THEN integer sum: a floating SUM is
            # partition-order-dependent and can flip floor(.+0.5) at
            # exact half-cent boundaries (repo idiom, queries.py)
            F.sum(F.floor(revenue * 100 + 0.5).cast("long"))
            .alias("revenue_cents"),
        )
        .orderBy("r_name", "o_orderpriority")
    )


SQL_ORDERS_ROLLUP = """
SELECT r.r_name, o.o_orderpriority,
  COUNT(*) AS n_lines,
  CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
       AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderstatus != 'F'
GROUP BY 1, 2 ORDER BY 1, 2
"""

SQL_QUERIES_RULES["orders_rollup"] = (q_orders_rollup, SQL_ORDERS_ROLLUP)


# --------------------------------------------------------------------------
# A6-adjacent: corpus extraction F1 (task-3 score) over the fixture
# corpus — rows-only (fixture input), semantics pytest-pinned.
# --------------------------------------------------------------------------


def q_extraction_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .eval.extraction_f1 import extraction_scores
    from .fixtures import gt_entities_df, transcripts_df
    from .plans.extraction import extract_spans

    spans = extract_spans(transcripts_df(spark, n_convs=40, seed=42))
    gt = gt_entities_df(spark, n_convs=40, seed=42)
    out = extraction_scores(spans.select("conv_id", "turn_idx",
                                         "label", "text"), gt)
    return out.select(
        "label",
        F.floor(F.col("precision") * 1e6 + 0.5).cast("long").alias("p_micro"),
        F.floor(F.col("recall") * 1e6 + 0.5).cast("long").alias("r_micro"),
        F.floor(F.col("hmean") * 1e6 + 0.5).cast("long").alias("h_micro"),
    ).orderBy("label")


# --------------------------------------------------------------------------
# Winnowing fingerprints (rolling-hash dedup family) + BPE-ish tokens
# --------------------------------------------------------------------------


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import winnow_fingerprints

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return winnow_fingerprints(docs, k=5, window=4) \
        .orderBy("doc_id", "fp")


SQL_WINNOW_FINGERPRINTS = r"""
WITH norm AS (
  SELECT doc_id,
    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
  FROM documents WHERE doc_id < 100
), grams AS (
  SELECT doc_id, length(t) AS n,
    [CAST('0x' || substr(md5(substr(t, i, 5)), 1, 8) AS BIGINT)
     FOR i IN generate_series(1, greatest(length(t) - 4, 1))] AS g
  FROM norm
), minima AS (
  SELECT doc_id,
    CASE WHEN n >= 5 THEN list_distinct(
      [list_min(g[j : j + 3])
       FOR j IN generate_series(1, greatest(len(g) - 3, 1))])
    ELSE [] END AS fps
  FROM grams
)
SELECT doc_id, unnest(fps) AS fp FROM minima ORDER BY doc_id, fp
"""

SQL_QUERIES_RULES["winnow_fingerprints"] = (
    q_winnow_fingerprints, SQL_WINNOW_FINGERPRINTS)


# BPE-ish token counting moved into queries.py::q_doc_text_profile
# (round-3 merge — one driver row per small scalar family).


# --------------------------------------------------------------------------
# X20 raster analysis over real BMP payloads (rows-only: Otsu/Sobel are
# raster math with no tractable SQL form; semantics pytest-pinned vs
# naive loop implementations in tests/test_multimodal_sinks.py)
# --------------------------------------------------------------------------


def q_raster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from .operators.multimodal import MEDIA_SCHEMA, raster_stats

    def gen(batches):
        from .operators.multimodal import encode_bmp

        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                px = ((np.arange(12 * 10 * 3, dtype=np.int64)
                       * (d % 97 + 3) + d * 7) % 256).astype(np.uint8)
                out.append({
                    "media_id": f"r{d:06d}", "kind": "image",
                    "payload": encode_bmp(px.reshape(12, 10, 3)),
                    "meta": {"width": 10, "height": 12, "channels": 3,
                             "sample_rate": None, "n_frames": None},
                })
            yield pd.DataFrame(out)

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = docs.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)
    out = raster_stats(media)
    return out.select(
        "media_id",
        F.floor(F.col("otsu_t")).cast("long").alias("otsu_t"),
        F.floor(F.col("fg_frac") * 1e6 + 0.5).cast("long").alias("fg_micro"),
        F.floor(F.col("fg_frac_opened") * 1e6 + 0.5).cast("long")
        .alias("fg_open_micro"),
        F.floor(F.col("edge_mean") * 1e3 + 0.5).cast("long")
        .alias("edge_milli"),
    ).orderBy("media_id")
