"""Query battery, batch 4: pipeline-level operators.

Sequential per-document kernels (NMS, connector, DetEval) are recorded
as rows-only checks by the driver with pytest NumPy-oracle coverage
(tests/test_detection.py, tests/test_deteval.py). anchor_matching,
multimodal_features and simhash_near_dups graduated to full SQL
oracles in round 2 (windowed relational algebra, first-principles BMP
feature recomputation, and HUGEINT signature replay respectively)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.detection_kernels import nms_per_doc
from .operators.geometry import anchor_grid
from .queries_geo import SQL_GRID_CTES, sql_md5_boxes_ctes
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


def q_detection_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discriminated union (driver-window fold, round 5): the Catalyst
    detection prefix (X17 grid -> X14 decode -> F2 clip -> F1 filter,
    formerly the standalone `detection_prefix` row) plus the greedy-NMS
    kernel output (J3/A9, formerly rows-only `nms`) in one oracled row
    — both halves stay fully value-checked."""
    from .queries_geo import q_detection_prefix

    def _micro(c: F.Column) -> F.Column:
        return F.floor(c * 1e6 + 0.5).cast("long")

    prefix = q_detection_prefix(spark, sf_dir).select(
        F.lit("prefix").alias("src"),
        F.col("l_orderkey").cast("string").alias("doc_id"),
        F.col("anchor_id").cast("long").alias("item_id"),
        "xmin_micro", "ymin_micro", "xmax_micro", "ymax_micro",
        "score_micro",
    )
    survivors = nms_per_doc(_proposals(spark, sf_dir), 0.3).select(
        F.lit("nms").alias("src"), "doc_id",
        F.col("pick_order").cast("long").alias("item_id"),
        _micro(F.col("xmin")).alias("xmin_micro"),
        _micro(F.col("ymin")).alias("ymin_micro"),
        _micro(F.col("xmax")).alias("xmax_micro"),
        _micro(F.col("ymax")).alias("ymax_micro"),
        _micro(F.col("score")).alias("score_micro"),
    )
    lines = q_detection_pipeline(spark, sf_dir).select(
        F.lit("lines").alias("src"), "doc_id",
        F.col("line_id").cast("long").alias("item_id"),
        F.col("xmin_m4").alias("xmin_micro"),
        F.col("ymin_m4").alias("ymin_micro"),
        F.col("xmax_m4").alias("xmax_micro"),
        F.col("ymax_m4").alias("ymax_micro"),
        F.col("score_m4").alias("score_micro"),
    )
    return prefix.unionByName(survivors).unionByName(lines) \
        .orderBy("src", "doc_id", "item_id")


# Greedy NMS is sequential per document, but the sequence is still pure
# relational algebra over list state: seed each doc with its proposals
# sorted by the reference's exact pick priority (stable ascending argsort
# reversed = score DESC, original-position DESC; non_max_suppression.py:29),
# then one recursive step per pick pops the head and list_filters the
# survivors with the same +1-area / no-+1-intersection IoU arithmetic,
# division-form compare included so the float semantics match NumPy's
# bit-for-bit. Graduates J3 from rows-only to a value-checked row
# (round 5).
def _sql_nms_recursion(props: str = "props", nms: str = "nms",
                       thresh: str = "0.3") -> str:
    """The recursive-suppression CTE pair over an existing proposals
    CTE named ``props`` with columns (doc_id, proposal_id, xmin, ymin,
    xmax, ymax, score). Parameterized by CTE names so one statement
    can replay NMS over two distinct proposal sets."""
    return f"""{nms}_seed AS (
  SELECT doc_id,
         list(struct_pack(xmin := xmin, ymin := ymin, xmax := xmax,
                          ymax := ymax, score := score)
              ORDER BY score DESC, proposal_id DESC) AS rem
  FROM {props} GROUP BY doc_id
), {nms} AS (
  SELECT doc_id, rem,
         CAST(NULL AS DOUBLE) AS xmin, CAST(NULL AS DOUBLE) AS ymin,
         CAST(NULL AS DOUBLE) AS xmax, CAST(NULL AS DOUBLE) AS ymax,
         CAST(NULL AS DOUBLE) AS score, -1 AS pick_order
  FROM {nms}_seed
  UNION ALL
  SELECT doc_id,
         list_filter(rem[2:], r ->
           (greatest(0.0, least(rem[1].xmax, r.xmax)
                          - greatest(rem[1].xmin, r.xmin))
            * greatest(0.0, least(rem[1].ymax, r.ymax)
                            - greatest(rem[1].ymin, r.ymin)))
           / ((rem[1].xmax - rem[1].xmin + 1.0)
              * (rem[1].ymax - rem[1].ymin + 1.0)
              + (r.xmax - r.xmin + 1.0) * (r.ymax - r.ymin + 1.0)
              - (greatest(0.0, least(rem[1].xmax, r.xmax)
                               - greatest(rem[1].xmin, r.xmin))
                 * greatest(0.0, least(rem[1].ymax, r.ymax)
                                 - greatest(rem[1].ymin, r.ymin))))
           <= {thresh}) AS rem,
         rem[1].xmin AS xmin, rem[1].ymin AS ymin,
         rem[1].xmax AS xmax, rem[1].ymax AS ymax,
         rem[1].score AS score, pick_order + 1
  FROM {nms} WHERE len(rem) > 0
)"""


SQL_NMS_CTES = """props AS (
  SELECT 'doc' || CAST(l_orderkey % 200 AS VARCHAR) AS doc_id,
         l_orderkey * 10 + l_linenumber AS proposal_id,
         (l_partkey % 30) * 16.0 AS xmin,
         (l_suppkey % 25) * 16.0 AS ymin,
         (l_partkey % 30) * 16.0 + 15.0 AS xmax,
         (l_suppkey % 25) * 16.0 + 12.0
           + CAST(l_orderkey % 7 AS DOUBLE) AS ymax,
         (l_extendedprice % 1000) / 1000.0 AS score
  FROM lineitem
), """ + _sql_nms_recursion()


# Detection tail replayed in SQL past NMS (round 5): the successor
# graph is pure relational algebra (first-qualifying-x scan = min/max
# over the v_ok pair set; best-successor = windowed argmax with the
# kernel's exact tie order; the edge gate compares against the max
# precursor score at the precursor scan's first x), chains walk the
# one-out-edge DAG with a recursive CTE, and the per-line assembly is
# the least-squares closed form (regr_slope/regr_intercept) evaluated
# at the kernel's head-offset endpoints — outputs quantized at 1e-4,
# far above the lstsq-vs-closed-form float divergence.
SQL_DETECTION_LINES_CTES = f"""{sql_md5_boxes_ctes(
    "SELECT DISTINCT (l_orderkey // 100) % 40 AS doc FROM lineitem"
    " WHERE l_orderkey % 100 = 0", "doc", prefix="p", thr=0.9)},
pprops AS (
  SELECT 'doc' || CAST(doc AS VARCHAR) AS doc_id,
         anchor_id AS proposal_id,
         cxmin AS xmin, cymin AS ymin, cxmax AS xmax, cymax AS ymax,
         score
  FROM pclipped
), {_sql_nms_recursion(props="pprops", nms="pnms")},
surv AS (
  SELECT doc_id, pick_order AS i, xmin, ymin, xmax, ymax, score,
         CAST(trunc(xmin) AS INT) AS tx0, ymax - ymin + 1.0 AS hgt
  FROM pnms WHERE pick_order >= 0
), vok AS (
  SELECT a.doc_id, a.i AS ia, b.i AS ib, a.tx0 AS xa, b.tx0 AS xb,
         a.score AS sa, b.score AS sb
  FROM surv a JOIN surv b
    ON a.doc_id = b.doc_id
   AND b.tx0 >= a.tx0 + 1 AND b.tx0 <= least(a.tx0 + 20, 255)
   AND greatest(0.0, least(a.ymax, b.ymax)
                     - greatest(a.ymin, b.ymin) + 1.0)
       / least(a.hgt, b.hgt) >= 0.7
   AND least(a.hgt, b.hgt) / greatest(a.hgt, b.hgt) >= 0.7
), succ_first AS (
  SELECT doc_id, ia, min(xb) AS fx FROM vok GROUP BY doc_id, ia
), best AS (
  SELECT doc_id, ia, ib AS ibest FROM (
    SELECT v.doc_id, v.ia, v.ib,
           row_number() OVER (PARTITION BY v.doc_id, v.ia
                              ORDER BY v.sb DESC, v.ib ASC) AS rn
    FROM vok v JOIN succ_first f
      ON f.doc_id = v.doc_id AND f.ia = v.ia AND v.xb = f.fx)
  WHERE rn = 1
), prec_last AS (
  SELECT doc_id, ib, max(xa) AS lx FROM vok GROUP BY doc_id, ib
), prec_max AS (
  SELECT v.doc_id, v.ib, max(v.sa) AS pmax
  FROM vok v JOIN prec_last pl
    ON pl.doc_id = v.doc_id AND pl.ib = v.ib AND v.xa = pl.lx
  GROUP BY v.doc_id, v.ib
), edges AS (
  SELECT b.doc_id, b.ia AS i, b.ibest AS j
  FROM best b
  JOIN surv s ON s.doc_id = b.doc_id AND s.i = b.ia
  JOIN prec_max pm ON pm.doc_id = b.doc_id AND pm.ib = b.ibest
  WHERE s.score >= pm.pmax
), heads AS (
  SELECT doc_id, i AS head FROM edges e
  WHERE NOT EXISTS (SELECT 1 FROM edges x
                    WHERE x.doc_id = e.doc_id AND x.j = e.i)
), chainwalk AS (
  SELECT doc_id, head, head AS node, 0 AS pos FROM heads
  UNION ALL
  SELECT c.doc_id, c.head, e.j AS node, c.pos + 1
  FROM chainwalk c
  JOIN edges e ON e.doc_id = c.doc_id AND e.i = c.node
), chain_members AS (
  SELECT c.doc_id, c.head, c.pos,
         s.xmin, s.ymin, s.xmax, s.ymax, s.score
  FROM chainwalk c
  JOIN surv s ON s.doc_id = c.doc_id AND s.i = c.node
), fitted AS (
  SELECT doc_id, head,
    min(xmin) AS gx0, max(xmax) AS gx1,
    max(CASE WHEN pos = 0 THEN (xmax - xmin) / 2.0 END) AS off,
    count(*) AS n, sum(score) AS ssum,
    regr_slope(ymin, xmin) AS s_top, regr_intercept(ymin, xmin) AS i_top,
    regr_slope(ymax, xmin) AS s_bot, regr_intercept(ymax, xmin) AS i_bot,
    max(CASE WHEN pos = 0 THEN ymin END) AS hy0,
    max(CASE WHEN pos = 0 THEN ymax END) AS hy1,
    count(DISTINCT xmin) AS nx
  FROM chain_members GROUP BY doc_id, head
), plines AS (
  SELECT doc_id,
    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY head) - 1
         AS BIGINT) AS line_id,
    greatest(0.0, least(gx0, 255.0)) AS xmin,
    greatest(0.0, least(least(top_a, top_b), 127.0)) AS ymin,
    greatest(0.0, least(gx1, 255.0)) AS xmax,
    greatest(0.0, least(greatest(bot_a, bot_b), 127.0)) AS ymax,
    ssum / n AS score
  FROM (
    SELECT *,
      CASE WHEN nx = 1 THEN hy0 ELSE s_top * (gx0 + off) + i_top END AS top_a,
      CASE WHEN nx = 1 THEN hy0 ELSE s_top * (gx1 - off) + i_top END AS top_b,
      CASE WHEN nx = 1 THEN hy1 ELSE s_bot * (gx0 + off) + i_bot END AS bot_a,
      CASE WHEN nx = 1 THEN hy1 ELSE s_bot * (gx1 - off) + i_bot END AS bot_b
    FROM fitted)
)"""


# The prefix half composes queries_geo.sql_md5_boxes_ctes (md5-driven
# synthetic predictions -> decode -> clip -> score filter — ONE source,
# shared with the lines half's pclipped chain); the NMS half replays
# the recursive suppression above; the lines half replays the full
# detection tail (SQL_DETECTION_LINES_CTES); the union is discriminated
# by `src` with all halves floored onto one schema (prefix/nms at 1e-6,
# lines at 1e-4 matching the Spark side).
SQL_DETECTION_BOXES = f"""
WITH RECURSIVE {SQL_GRID_CTES},
{sql_md5_boxes_ctes(
    "SELECT DISTINCT l_orderkey FROM lineitem WHERE l_orderkey % 100 = 0",
    "l_orderkey", thr=0.7)},
{SQL_NMS_CTES},
{SQL_DETECTION_LINES_CTES}
SELECT 'prefix' AS src, CAST(l_orderkey AS VARCHAR) AS doc_id,
  CAST(anchor_id AS BIGINT) AS item_id,
  CAST(floor(cxmin*1e6+0.5) AS BIGINT) AS xmin_micro,
  CAST(floor(cymin*1e6+0.5) AS BIGINT) AS ymin_micro,
  CAST(floor(cxmax*1e6+0.5) AS BIGINT) AS xmax_micro,
  CAST(floor(cymax*1e6+0.5) AS BIGINT) AS ymax_micro,
  CAST(floor(score*1e6+0.5) AS BIGINT) AS score_micro
FROM clipped WHERE score > 0.7
UNION ALL
SELECT 'nms' AS src, doc_id, CAST(pick_order AS BIGINT) AS item_id,
  CAST(floor(xmin*1e6+0.5) AS BIGINT) AS xmin_micro,
  CAST(floor(ymin*1e6+0.5) AS BIGINT) AS ymin_micro,
  CAST(floor(xmax*1e6+0.5) AS BIGINT) AS xmax_micro,
  CAST(floor(ymax*1e6+0.5) AS BIGINT) AS ymax_micro,
  CAST(floor(score*1e6+0.5) AS BIGINT) AS score_micro
FROM nms WHERE pick_order >= 0
UNION ALL
SELECT 'lines' AS src, doc_id, line_id AS item_id,
  CAST(floor(xmin*1e4+0.5) AS BIGINT) AS xmin_micro,
  CAST(floor(ymin*1e4+0.5) AS BIGINT) AS ymin_micro,
  CAST(floor(xmax*1e4+0.5) AS BIGINT) AS xmax_micro,
  CAST(floor(ymax*1e4+0.5) AS BIGINT) AS ymax_micro,
  CAST(floor(score*1e4+0.5) AS BIGINT) AS score_micro
FROM plines
ORDER BY src, doc_id, item_id
"""


# S10 graduates to a full value oracle (round 5): the submission payload
# is NMS survivors serialized per doc — replay the same recursive
# suppression, then string_agg the int-truncated coords in pick order
# (Spark's cast(int) truncates toward zero; trunc() mirrors it — the
# synthetic coords are exact integers either way).
SQL_DETECTION_SINK = f"""
WITH RECURSIVE {SQL_NMS_CTES}
SELECT doc_id,
  string_agg(
    CAST(trunc(xmin) AS BIGINT) || ',' || CAST(trunc(ymin) AS BIGINT)
    || ',' || CAST(trunc(xmax) AS BIGINT) || ','
    || CAST(trunc(ymax) AS BIGINT),
    chr(10) ORDER BY pick_order) AS submission
FROM nms WHERE pick_order >= 0
GROUP BY doc_id ORDER BY doc_id
"""


def q_detection_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full detection tail end-to-end: decode -> clip -> score filter
    -> greedy NMS -> successor graph -> chain following -> per-line
    least-squares assembly (J4/J5/A1). Graduated to a full value
    oracle in round 5: predictions are md5-driven (engine-portable,
    was xxhash64) and the output is quantized at 1e-4 — the oracle's
    regr_slope/intercept closed form and numpy's polyfit lstsq agree
    well past that precision."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    docs = li.select(
        ((F.col("l_orderkey") / 100).cast("long") % 40).alias("doc")
    ).distinct()
    anchors = anchor_grid(spark, feat_h=8, feat_w=16, heights=(11, 15, 22))
    key = F.concat(F.col("doc").cast("string"), F.lit("_"),
                   F.col("anchor_id").cast("string"))
    h1 = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5(key), 9, 8), 16, 10).cast("long")
    preds = docs.crossJoin(F.broadcast(anchors.select("anchor_id"))).select(
        F.concat(F.lit("doc"), F.col("doc")).alias("doc_id"),
        "anchor_id",
        ((h1 % 21 - 10) / 20.0).alias("vc"),
        ((h2 % 13 - 6) / 10.0).alias("vh"),
        ((h1 % 1000) / 1000.0).alias("score"),
    )
    lines = detect_text_lines(preds, anchors, img_w=256.0, img_h=128.0)

    def _m4(c: str) -> F.Column:
        return F.floor(F.col(c) * 1e4 + 0.5).cast("long").alias(c + "_m4")

    return lines.select(
        "doc_id", "line_id", _m4("xmin"), _m4("ymin"), _m4("xmax"),
        _m4("ymax"), _m4("score"),
    ).orderBy("doc_id", "line_id")


def q_deteval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8/J9/A6 graduated to a full value oracle (round 5).

    The fixture is a pure function of (doc, gt_id) via md5 slices (no
    dropDuplicates nondeterminism), with one planted match regime per
    doc class (``mode = doc % 4``): 0 = one-to-one shifts for every
    gt; 1 = gt#1 split into two half-width dets (one-to-many, 0.8
    accumulator semantics); 2 = one det spanning gt#2+gt#3
    (many-to-one); 3 = gt#3 has no det (miss). Dontcare gts arise
    hash-randomly in every mode, exercising the det-dontcare
    propagation. Output: per-mode accumulator sums + rollup metrics —
    the DuckDB oracle replays the sequential matcher phase-for-phase
    (recursive CTE over the exact phase-2/phase-3 iteration order), so
    every per-doc divergence shifts a hashed sum."""
    def _gt(spark: SparkSession) -> DataFrame:
        # built twice (once for the gt side, once as the det seed) so
        # the cogroup's two sides carry independent expression ids —
        # Spark rejects a cogroup whose det side descends from the gt
        # side as an ambiguous self-join
        li = _t(spark, sf_dir, "lineitem")
        d = li.select((F.col("l_orderkey") % 300).alias("d")).distinct()
        g = spark.range(1, 4).select(F.col("id").cast("int").alias("g"))
        base = d.crossJoin(g)
        key = F.concat(F.col("d").cast("string"), F.lit("_"),
                       F.col("g").cast("string"))
        h1 = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
        h2 = F.conv(F.substring(
            F.md5(F.concat(F.col("d").cast("string"), F.lit("_2"))),
            1, 8), 16, 10).cast("long")
        mode = (F.col("d") % 4).cast("int")
        # mode 2 pins gt#3's x to gt#2's so the spanning det stays tight
        xbase = F.when((mode == 2) & (F.col("g") == 3),
                       (h2 % 8).cast("double") * 30.0) \
            .otherwise((h1 % 8).cast("double") * 30.0)
        return base.select(
            F.concat(F.lit("doc"), F.col("d")).alias("doc_id"),
            mode.alias("mode"), F.col("g").alias("gt_id"),
            xbase.alias("xmin"),
            ((F.col("g") - 1).cast("double") * 40.0).alias("ymin"),
            (xbase + 89.0).alias("xmax"),
            ((F.col("g") - 1).cast("double") * 40.0 + 19.0).alias("ymax"),
            (h1 % 13 == 0).alias("dontcare"),
        )

    gt, gt2 = _gt(spark), _gt(spark)
    m, gid = F.col("mode"), F.col("gt_id")
    shifted = gt2.filter(
        (m == 0) | ((m == 1) & (gid >= 2)) | ((m == 2) & (gid == 1))
        | ((m == 3) & (gid <= 2))
    ).select(
        "doc_id", gid.alias("det_id"),
        (F.col("xmin") + 3.0).alias("xmin"), (F.col("ymin") + 2.0).alias("ymin"),
        (F.col("xmax") + 3.0).alias("xmax"), (F.col("ymax") + 2.0).alias("ymax"))
    split_a = gt2.filter((m == 1) & (gid == 1)).select(
        "doc_id", F.lit(11).alias("det_id"), "xmin", "ymin",
        (F.col("xmin") + 44.0).alias("xmax"), "ymax")
    split_b = gt2.filter((m == 1) & (gid == 1)).select(
        "doc_id", F.lit(12).alias("det_id"),
        (F.col("xmin") + 45.0).alias("xmin"), "ymin", "xmax", "ymax")
    span = gt2.filter((m == 2) & (gid == 2)).select(
        "doc_id", F.lit(23).alias("det_id"), "xmin", "ymin", "xmax",
        (F.col("ymax") + 40.0).alias("ymax"))
    det = shifted.unionByName(split_a).unionByName(split_b) \
        .unionByName(span)
    per_doc = deteval_per_doc(
        gt.select("doc_id", "gt_id", "xmin", "ymin", "xmax", "ymax",
                  "dontcare"),
        det).withColumn(
            "mode", F.substring("doc_id", 4, 10).cast("int") % 4)
    sums = per_doc.groupBy(F.col("mode").alias("mode_s")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("num_gt_care").cast("long").alias("n_gt_care"),
        F.sum("num_det_care").cast("long").alias("n_det_care"),
    )
    roll = deteval_corpus(per_doc, by=("mode",))
    return roll.join(sums, roll["mode"] == sums["mode_s"]).select(
        "mode", "n_docs", "n_gt_care", "n_det_care",
        F.floor(F.col("recall") * 1e6 + 0.5).cast("long").alias("recall_micro"),
        F.floor(F.col("precision") * 1e6 + 0.5).cast("long")
        .alias("precision_micro"),
        F.floor(F.col("hmean") * 1e6 + 0.5).cast("long").alias("hmean_micro"),
    ).orderBy("mode")


# DetEval replayed in SQL: phase 1 (one-to-one) is order-free pure
# relational algebra (qualifying pairs are mutually unique, so the
# in-phase mark guards never fire); phases 2/3 ARE order-dependent, so
# the recursive CTE iterates the exact kernel order — gts ascending
# then dets ascending — carrying (gt_mat, det_mat, accumulators) as
# per-doc list state, with the ratio matrices packed into a struct
# list per doc. Same +1-area intersection, center-distance gate,
# round(.,4) threshold compares, and 1.0/0.8 accumulator weights as
# eval/deteval.py (scripts/evaluation/task1/script.py semantics).
SQL_DETEVAL = """
WITH RECURSIVE d0 AS (SELECT DISTINCT l_orderkey % 300 AS d FROM lineitem),
gs(g) AS (VALUES (1),(2),(3)),
hashed AS (
  SELECT d, g, CAST(d % 4 AS INT) AS mode,
    CAST('0x' || substr(md5(CAST(d AS VARCHAR) || '_' ||
         CAST(g AS VARCHAR)), 1, 8) AS BIGINT) AS h1,
    CAST('0x' || substr(md5(CAST(d AS VARCHAR) || '_2'), 1, 8)
         AS BIGINT) AS h2
  FROM d0 CROSS JOIN gs),
gt AS (
  SELECT d, mode, g AS gt_id,
    CASE WHEN mode = 2 AND g = 3 THEN CAST(h2 % 8 AS DOUBLE) * 30.0
         ELSE CAST(h1 % 8 AS DOUBLE) * 30.0 END AS xmin,
    CAST(g - 1 AS DOUBLE) * 40.0 AS ymin,
    CASE WHEN mode = 2 AND g = 3 THEN CAST(h2 % 8 AS DOUBLE) * 30.0
         ELSE CAST(h1 % 8 AS DOUBLE) * 30.0 END + 89.0 AS xmax,
    CAST(g - 1 AS DOUBLE) * 40.0 + 19.0 AS ymax,
    h1 % 13 = 0 AS gdc
  FROM hashed),
det AS (
  SELECT d, gt_id AS det_id, xmin + 3.0 AS xmin, ymin + 2.0 AS ymin,
         xmax + 3.0 AS xmax, ymax + 2.0 AS ymax
  FROM gt WHERE mode = 0 OR (mode = 1 AND gt_id >= 2)
             OR (mode = 2 AND gt_id = 1) OR (mode = 3 AND gt_id <= 2)
  UNION ALL SELECT d, 11, xmin, ymin, xmin + 44.0, ymax
    FROM gt WHERE mode = 1 AND gt_id = 1
  UNION ALL SELECT d, 12, xmin + 45.0, ymin, xmax, ymax
    FROM gt WHERE mode = 1 AND gt_id = 1
  UNION ALL SELECT d, 23, xmin, ymin, xmax, ymax + 40.0
    FROM gt WHERE mode = 2 AND gt_id = 2),
ratios AS (
  SELECT g.d, g.gt_id, t.det_id, g.gdc,
    CASE WHEN least(g.xmax, t.xmax) - greatest(g.xmin, t.xmin) + 1.0 >= 0
          AND least(g.ymax, t.ymax) - greatest(g.ymin, t.ymin) + 1.0 >= 0
         THEN (least(g.xmax, t.xmax) - greatest(g.xmin, t.xmin) + 1.0)
            * (least(g.ymax, t.ymax) - greatest(g.ymin, t.ymin) + 1.0)
         ELSE 0.0 END
      / ((g.xmax - g.xmin + 1.0) * (g.ymax - g.ymin + 1.0)) AS rmat,
    CASE WHEN least(g.xmax, t.xmax) - greatest(g.xmin, t.xmin) + 1.0 >= 0
          AND least(g.ymax, t.ymax) - greatest(g.ymin, t.ymin) + 1.0 >= 0
         THEN (least(g.xmax, t.xmax) - greatest(g.xmin, t.xmin) + 1.0)
            * (least(g.ymax, t.ymax) - greatest(g.ymin, t.ymin) + 1.0)
         ELSE 0.0 END
      / ((t.xmax - t.xmin + 1.0) * (t.ymax - t.ymin + 1.0)) AS pmat,
    2.0 * sqrt(
        ((g.xmin + (g.xmax - g.xmin + 1.0)/2.0)
         - (t.xmin + (t.xmax - t.xmin + 1.0)/2.0))
      * ((g.xmin + (g.xmax - g.xmin + 1.0)/2.0)
         - (t.xmin + (t.xmax - t.xmin + 1.0)/2.0))
      + ((g.ymin + (g.ymax - g.ymin + 1.0)/2.0)
         - (t.ymin + (t.ymax - t.ymin + 1.0)/2.0))
      * ((g.ymin + (g.ymax - g.ymin + 1.0)/2.0)
         - (t.ymin + (t.ymax - t.ymin + 1.0)/2.0)))
    / (sqrt((g.xmax - g.xmin + 1.0)*(g.xmax - g.xmin + 1.0)
            + (g.ymax - g.ymin + 1.0)*(g.ymax - g.ymin + 1.0))
     + sqrt((t.xmax - t.xmin + 1.0)*(t.xmax - t.xmin + 1.0)
            + (t.ymax - t.ymin + 1.0)*(t.ymax - t.ymin + 1.0))) AS cnorm
  FROM gt g JOIN det t USING (d)),
ddc AS (SELECT DISTINCT d, det_id FROM ratios WHERE gdc AND pmat > 0.4),
m2 AS (
  SELECT r.*, dd.det_id IS NOT NULL AS ddc
  FROM ratios r LEFT JOIN ddc dd
    ON r.d = dd.d AND r.det_id = dd.det_id),
ogt AS (
  SELECT d, gt_id,
         COUNT(*) FILTER (WHERE rmat > 0 AND NOT ddc) AS og
  FROM m2 GROUP BY d, gt_id),
odet AS (
  SELECT d, det_id,
         COUNT(*) FILTER (WHERE rmat > 0 AND NOT gdc) AS od
  FROM m2 GROUP BY d, det_id),
qual AS (SELECT d, gt_id, det_id FROM m2
         WHERE rmat >= 0.8 AND pmat >= 0.4),
qg AS (SELECT d, gt_id FROM qual GROUP BY d, gt_id HAVING COUNT(*) = 1),
qd AS (SELECT d, det_id FROM qual GROUP BY d, det_id HAVING COUNT(*) = 1),
o2o AS (
  SELECT x.d, x.gt_id, x.det_id
  FROM m2 x
  JOIN qg ON qg.d = x.d AND qg.gt_id = x.gt_id
  JOIN qd ON qd.d = x.d AND qd.det_id = x.det_id
  JOIN ogt o ON o.d = x.d AND o.gt_id = x.gt_id
  JOIN odet e ON e.d = x.d AND e.det_id = x.det_id
  WHERE x.rmat >= 0.8 AND x.pmat >= 0.4 AND NOT x.gdc AND NOT x.ddc
    AND o.og = 1 AND e.od = 1 AND x.cnorm < 1.0),
glist AS (
  SELECT g.d, list(struct_pack(gid := g.gt_id, gdc := g.gdc,
                               og := coalesce(o.og, 0))
                   ORDER BY g.gt_id) AS gts
  FROM gt g LEFT JOIN ogt o ON o.d = g.d AND o.gt_id = g.gt_id
  GROUP BY g.d),
dlist AS (
  SELECT t.d, list(struct_pack(did := t.det_id,
                               ddc := dd.det_id IS NOT NULL,
                               od := coalesce(e.od, 0))
                   ORDER BY t.det_id) AS dets
  FROM det t
  LEFT JOIN ddc dd ON dd.d = t.d AND dd.det_id = t.det_id
  LEFT JOIN odet e ON e.d = t.d AND e.det_id = t.det_id
  GROUP BY t.d),
mlist AS (
  SELECT d, list(struct_pack(gid := gt_id, did := det_id, rmat := rmat,
                             pmat := pmat, gdc := gdc, ddc := ddc)) AS mats
  FROM m2 GROUP BY d),
o2og AS (
  SELECT d, list(gt_id) AS g11, list(det_id) AS d11,
         COUNT(*) AS n11
  FROM o2o GROUP BY d),
replay AS (
  SELECT gl.d, 0 AS step,
         coalesce(oo.g11, []) AS gmat, coalesce(oo.d11, []) AS dmat,
         CAST(coalesce(oo.n11, 0) AS DOUBLE) AS racc,
         CAST(coalesce(oo.n11, 0) AS DOUBLE) AS pacc,
         gl.gts AS gts, coalesce(dl.dets, []) AS dets,
         coalesce(ml.mats, []) AS mats
  FROM glist gl
  LEFT JOIN dlist dl ON dl.d = gl.d
  LEFT JOIN mlist ml ON ml.d = gl.d
  LEFT JOIN o2og oo ON oo.d = gl.d
  UNION ALL
  SELECT d, step + 1,
    CASE WHEN isg AND condg THEN list_append(gmat, cg.gid)
         WHEN NOT isg AND condd
           THEN list_concat(gmat, list_transform(delig, q -> q.gid))
         ELSE gmat END AS gmat,
    CASE WHEN isg AND condg
           THEN list_concat(dmat, list_transform(gelig, q -> q.did))
         WHEN NOT isg AND condd THEN list_append(dmat, cd.did)
         ELSE dmat END AS dmat,
    racc + CASE
      WHEN isg AND condg
        THEN CASE WHEN len(gelig) = 1 THEN 1.0 ELSE 0.8 END
      WHEN NOT isg AND condd
        THEN CASE WHEN len(delig) = 1 THEN 1.0
                  ELSE 1.0 * len(delig) END
      ELSE 0.0 END AS racc,
    pacc + CASE
      WHEN isg AND condg
        THEN CASE WHEN len(gelig) = 1 THEN 1.0 ELSE 0.8 * len(gelig) END
      WHEN NOT isg AND condd THEN 1.0
      ELSE 0.0 END AS pacc,
    gts, dets, mats
  FROM (
    SELECT s1.*,
      isg AND cg.gdc = false AND NOT list_contains(gmat, cg.gid)
        AND round(coalesce(list_sum(
              list_transform(gelig, q -> q.rmat)), 0.0), 4) >= 0.8
        AND cg.og >= 2 AS condg,
      NOT isg AND cd.ddc = false AND NOT list_contains(dmat, cd.did)
        AND round(coalesce(list_sum(
              list_transform(delig, q -> q.pmat)), 0.0), 4) >= 0.4
        AND cd.od >= 2 AS condd
    FROM (
      SELECT s0.*,
        CASE WHEN isg THEN list_filter(mats, q ->
               q.gid = cg.gid AND q.pmat >= 0.4 AND NOT q.ddc
               AND NOT list_contains(dmat, q.did))
             ELSE [] END AS gelig,
        CASE WHEN NOT isg THEN list_filter(mats, q ->
               q.did = cd.did AND q.rmat >= 0.8 AND NOT q.gdc
               AND NOT list_contains(gmat, q.gid))
             ELSE [] END AS delig
      FROM (
        SELECT r.*, r.step < len(r.gts) AS isg,
          CASE WHEN r.step < len(r.gts) THEN r.gts[r.step + 1]
               ELSE NULL END AS cg,
          CASE WHEN r.step >= len(r.gts)
               THEN r.dets[r.step - len(r.gts) + 1] ELSE NULL END AS cd
        FROM replay r
        WHERE r.step < len(r.gts) + len(r.dets)
      ) s0
    ) s1
  ) s2),
fin AS (
  SELECT d, racc, pacc,
         len(list_filter(gts, q -> NOT q.gdc)) AS gt_care,
         len(list_filter(dets, q -> NOT q.ddc)) AS det_care
  FROM replay WHERE step = len(gts) + len(dets))
SELECT CAST(d % 4 AS INT) AS mode,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(gt_care) AS BIGINT) AS n_gt_care,
  CAST(SUM(det_care) AS BIGINT) AS n_det_care,
  CAST(floor(CASE WHEN SUM(gt_care) = 0 THEN 0.0
        ELSE SUM(racc) / SUM(gt_care) END * 1e6 + 0.5) AS BIGINT)
    AS recall_micro,
  CAST(floor(CASE WHEN SUM(det_care) = 0 THEN 0.0
        ELSE SUM(pacc) / SUM(det_care) END * 1e6 + 0.5) AS BIGINT)
    AS precision_micro,
  CAST(floor(CASE
        WHEN (CASE WHEN SUM(gt_care) = 0 THEN 0.0
              ELSE SUM(racc) / SUM(gt_care) END)
           + (CASE WHEN SUM(det_care) = 0 THEN 0.0
              ELSE SUM(pacc) / SUM(det_care) END) = 0 THEN 0.0
        ELSE 2.0 * (CASE WHEN SUM(gt_care) = 0 THEN 0.0
                    ELSE SUM(racc) / SUM(gt_care) END)
                 * (CASE WHEN SUM(det_care) = 0 THEN 0.0
                    ELSE SUM(pacc) / SUM(det_care) END)
             / ((CASE WHEN SUM(gt_care) = 0 THEN 0.0
                 ELSE SUM(racc) / SUM(gt_care) END)
              + (CASE WHEN SUM(det_care) = 0 THEN 0.0
                 ELSE SUM(pacc) / SUM(det_care) END)) END
      * 1e6 + 0.5) AS BIGINT) AS hmean_micro
FROM fin GROUP BY d % 4 ORDER BY mode
"""


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
    """Real-decode path: payloads are genuine 24-bit BMP bytes built
    per doc (deterministic pixels from doc_id), decoded byte-level by
    `decode_bmp` inside the Arrow kernel — not the stub."""
    import numpy as np
    import pandas as pd

    from .operators.multimodal import MEDIA_SCHEMA, decode_and_featurize

    def gen(batches):
        from .operators.multimodal import encode_bmp

        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                px = ((np.arange(8 * 16 * 3, dtype=np.int64)
                       * (d % 251 + 1) + d) % 256).astype(np.uint8)
                out.append({
                    "media_id": f"m{d:06d}",
                    "kind": "image",
                    "payload": encode_bmp(px.reshape(8, 16, 3)),
                    "meta": {"width": 16, "height": 8, "channels": 3,
                             "sample_rate": None, "n_frames": None},
                })
            yield pd.DataFrame(out)

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = docs.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)
    feats = decode_and_featurize(media)
    # Serialize the array<float> feature column (lists are unhashable in
    # the driver's pandas canonicalizer); micro-floor for stable hashing
    # (the oracle mirrors the float32 quantization with a REAL cast).
    return feats.select(
        "media_id", "kind", "decoded_bytes",
        F.floor(F.col("mean_intensity") * 1e6 + 0.5).cast("long")
        .alias("intensity_micro"),
        F.to_json(
            F.transform(
                "feature",
                lambda x: F.floor(x.cast("double") * 1e6 + 0.5).cast("long"))
        ).alias("feature_micro"),
    ).orderBy("media_id")


# The payload pixels are pure arithmetic from doc_id and the BMP decode
# is an exact round trip, so DuckDB can recompute the features from
# first principles — a green hash here validates the byte-level BMP
# encode/decode chain against an independent computation. The kernel
# casts features to float32; CAST AS REAL mirrors that quantization.
SQL_MULTIMODAL_FEATURES = """
WITH px AS (
  SELECT doc_id, doc_id % 251 + 1 AS m FROM documents WHERE doc_id < 200
), chan AS (
  SELECT doc_id,
    [list_sum([CAST((k * 3 + c) * m + doc_id AS BIGINT) % 256
               FOR k IN generate_series(0, 127)]) / 128.0
     FOR c IN generate_series(0, 2)] AS pooled,
    list_sum([CAST(i * m + doc_id AS BIGINT) % 256
              FOR i IN generate_series(0, 383)]) / 384.0 AS mean_i
  FROM px
)
SELECT 'm' || lpad(CAST(doc_id AS VARCHAR), 6, '0') AS media_id,
  'image' AS kind, CAST(384 AS BIGINT) AS decoded_bytes,
  CAST(floor(mean_i * 1e6 + 0.5) AS BIGINT) AS intensity_micro,
  to_json([CAST(floor(
      CAST(CAST(pooled[j % 3 + 1] / 255.0 AS REAL) AS DOUBLE) * 1e6 + 0.5)
    AS BIGINT) FOR j IN generate_series(0, 7)]) AS feature_micro
FROM chan ORDER BY media_id
"""


def q_anchor_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2/F4/F5: anchor↔gt matching over synthetic layouts —
    SQL-oracle-checked (windows + forced-override are portable
    relational algebra); tie semantics additionally pytest-verified
    against a NumPy port of the reference."""
    from pyspark.sql import Window

    from .operators.geometry import anchor_grid
    from .operators.matching import match_anchors

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 200 == 0)
    anchors = anchor_grid(spark, feat_h=6, feat_w=8, heights=(11, 15, 22, 32))
    # deterministic pick per (doc_id, gt_id): lowest l_orderkey wins
    w = Window.partitionBy(F.col("l_orderkey") % 60, "l_linenumber") \
        .orderBy("l_orderkey")
    gt = (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.concat(F.lit("doc"), (F.col("l_orderkey") % 60)).alias("doc_id"),
            F.col("l_linenumber").alias("gt_id"),
            ((F.col("l_partkey") % 6) * 16.0).alias("xmin"),
            ((F.col("l_suppkey") % 5) * 16.0).alias("ymin"),
            ((F.col("l_partkey") % 6) * 16.0 + 47.0).alias("xmax"),
            ((F.col("l_suppkey") % 5) * 16.0 + 14.0).alias("ymax"),
        )
    )
    out = match_anchors(anchors, gt, img_w=128.0, img_h=96.0)
    return out.filter(F.col("label") >= 0).select(
        "doc_id", "anchor_id",
        F.col("matched_gt_id").cast("long").alias("matched_gt_id"),
        F.floor(F.col("vc") * 1e6 + 0.5).cast("long").alias("vc_micro"),
        F.floor(F.col("vh") * 1e6 + 0.5).cast("long").alias("vh_micro"),
        F.col("label").cast("int").alias("label"),
        F.floor(F.col("eff_iou") * 1e6 + 0.5).cast("long").alias("iou_micro"),
    ).orderBy("doc_id", "anchor_id")


_IOU_SQL = """
    greatest(0.0, least(a_xmax, g_xmax) - greatest(a_xmin, g_xmin)) *
    greatest(0.0, least(a_ymax, g_ymax) - greatest(a_ymin, g_ymin)) /
    ((a_xmax - a_xmin + 1.0) * (a_ymax - a_ymin + 1.0)
     + (g_xmax - g_xmin + 1.0) * (g_ymax - g_ymin + 1.0)
     - greatest(0.0, least(a_xmax, g_xmax) - greatest(a_xmin, g_xmin)) *
       greatest(0.0, least(a_ymax, g_ymax) - greatest(a_ymin, g_ymin))
     + 1e-06)
"""

SQL_ANCHOR_MATCHING = f"""
WITH li AS (SELECT * FROM lineitem WHERE l_orderkey % 200 = 0),
gt_all AS (
  SELECT 'doc' || CAST(l_orderkey % 60 AS VARCHAR) AS doc_id,
         l_linenumber AS gt_id,
         CAST(l_partkey % 6 AS DOUBLE) * 16.0 AS g_xmin,
         CAST(l_suppkey % 5 AS DOUBLE) * 16.0 AS g_ymin,
         CAST(l_partkey % 6 AS DOUBLE) * 16.0 + 47.0 AS g_xmax,
         CAST(l_suppkey % 5 AS DOUBLE) * 16.0 + 14.0 AS g_ymax,
         row_number() OVER (PARTITION BY l_orderkey % 60, l_linenumber
                            ORDER BY l_orderkey) AS rn
  FROM li),
gt AS (SELECT doc_id, gt_id, g_xmin, g_ymin, g_xmax, g_ymax
       FROM gt_all WHERE rn = 1),
hs(hi, h) AS (VALUES (0, 11.0), (1, 15.0), (2, 22.0), (3, 32.0)),
anchors AS (
  SELECT (fy*8 + fx)*4 + hi AS anchor_id,
    fx*16 + 7.5 - 8.0 AS a_xmin, fy*16 + 7.5 - h/2 AS a_ymin,
    fx*16 + 7.5 + 8.0 AS a_xmax, fy*16 + 7.5 + h/2 AS a_ymax
  FROM generate_series(0, 5) g1(fy)
  CROSS JOIN generate_series(0, 7) g2(fx) CROSS JOIN hs),
pairs AS (
  SELECT g.doc_id, g.gt_id, g.g_xmin, g.g_ymin, g.g_xmax, g.g_ymax,
         a.anchor_id, a.a_xmin, a.a_ymin, a.a_xmax, a.a_ymax,
         ({_IOU_SQL}) AS iou
  FROM gt g CROSS JOIN anchors a),
best_gt AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id, anchor_id
      ORDER BY iou DESC, gt_id ASC) AS rn FROM pairs) WHERE rn = 1),
forced AS (
  SELECT doc_id, anchor_id, max(gt_id) AS forced_gt_id FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id, gt_id
      ORDER BY iou DESC, anchor_id ASC) AS rn FROM pairs) t
  WHERE rn = 1 GROUP BY doc_id, anchor_id),
resolved AS (
  SELECT m.doc_id, m.anchor_id,
    m.a_xmin, m.a_ymin, m.a_xmax, m.a_ymax,
    COALESCE(f.forced_gt_id, m.gt_id) AS matched_gt_id,
    COALESCE(fg.g_ymin, m.g_ymin) AS m_ymin,
    COALESCE(fg.g_ymax, m.g_ymax) AS m_ymax,
    CASE WHEN f.forced_gt_id IS NOT NULL THEN 1.0 ELSE m.iou END AS eff_iou
  FROM best_gt m
  LEFT JOIN forced f ON f.doc_id = m.doc_id AND f.anchor_id = m.anchor_id
  LEFT JOIN gt fg ON fg.doc_id = m.doc_id AND fg.gt_id = f.forced_gt_id),
labeled AS (
  SELECT *,
    CASE WHEN a_xmin < 0 OR a_ymin < 0 OR a_xmax > 128.0 OR a_ymax > 96.0
         THEN -1
         WHEN eff_iou > 0.5 THEN 1
         WHEN eff_iou < 0.3 THEN 0
         ELSE -1 END AS label,
    (m_ymax - m_ymin + 1.0) AS h, (a_ymax - a_ymin + 1.0) AS ha,
    (m_ymin + m_ymax)/2.0 AS cy, (a_ymin + a_ymax)/2.0 AS cya
  FROM resolved)
SELECT doc_id, anchor_id,
  CAST(matched_gt_id AS BIGINT) AS matched_gt_id,
  CAST(floor((cy - cya)/ha * 1e6 + 0.5) AS BIGINT) AS vc_micro,
  CAST(floor(ln(h/ha) * 1e6 + 0.5) AS BIGINT) AS vh_micro,
  CAST(label AS INT) AS label,
  CAST(floor(eff_iou * 1e6 + 0.5) AS BIGINT) AS iou_micro
FROM labeled WHERE label >= 0
ORDER BY doc_id, anchor_id
"""


def q_box_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-window fold (round 5): J1 pairwise IoU (former
    ``iou_pairs`` row) + J2/F4/F5 anchor<->gt matching (former
    ``anchor_matching`` row) as one discriminated union — both halves
    stay fully value-checked; frees a slot for the DetEval oracle."""
    from .queries_geo import q_iou_pairs

    am = q_anchor_matching(spark, sf_dir).select(
        F.lit("anchor").alias("src"), "doc_id",
        F.col("anchor_id").cast("long").alias("id_a"),
        F.col("matched_gt_id").alias("id_b"),
        F.col("vc_micro").alias("m1"), F.col("vh_micro").alias("m2"),
        "label", "iou_micro",
    )
    ip = q_iou_pairs(spark, sf_dir).select(
        F.lit("pairs").alias("src"), F.col("doc").cast("string").alias("doc_id"),
        F.col("la").cast("long").alias("id_a"),
        F.col("lb").cast("long").alias("id_b"),
        F.lit(None).cast("long").alias("m1"),
        F.lit(None).cast("long").alias("m2"),
        F.lit(None).cast("int").alias("label"),
        "iou_micro",
    )
    return am.unionByName(ip).orderBy("src", "doc_id", "id_a", "id_b")


def _sql_box_matching() -> str:
    from .queries_geo import SQL_IOU_PAIRS

    return f"""
SELECT 'anchor' AS src, doc_id, CAST(anchor_id AS BIGINT) AS id_a,
       matched_gt_id AS id_b, vc_micro AS m1, vh_micro AS m2,
       label, iou_micro
FROM ({SQL_ANCHOR_MATCHING})
UNION ALL
SELECT 'pairs', CAST(doc AS VARCHAR), CAST(la AS BIGINT),
       CAST(lb AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       CAST(NULL AS INT), iou_micro
FROM ({SQL_IOU_PAIRS})
ORDER BY src, doc_id, id_a, id_b
"""


def q_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over the embeddings table, both serving shapes as a
    discriminated union: ``single`` rows = the unindexed nprobe=2
    probe for one query vector (exactness vs brute force
    pytest-verified); ``batch`` rows = ``ivf_knn_indexed`` over a
    query table against a materialized partition-pruned index
    (round 5 — per-query parity with ``ivf_topk_indexed`` and
    PartitionFilters pruning pytest-asserted). Serves the COMMITTED
    centroids (models/centroids_k8.json), so the probe/assign/top-k
    values are ALSO fully SQL-checked as similarity_topk's 'ivf1' /
    'ivfb' rows; this entry keeps the materialized-index physical
    path (scratch write + pruned read) under the rows-only check."""
    import os
    import tempfile

    from .operators.similarity import (
        ivf_knn_indexed,
        ivf_topk,
        load_centroids,
        write_ivf_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cents = load_centroids()
    query = emb.filter(F.col("vec_id") == 0).select("embedding") \
        .collect()[0][0]
    single = ivf_topk(emb, cents, list(query), k=20, nprobe=2).select(
        F.lit("single").alias("kind"),
        F.lit(None).cast("long").alias("query_id"),
        "vec_id", F.col("ivf_bucket").cast("int").alias("ivf_bucket"),
        "cosine", F.lit(None).cast("int").alias("rnk"),
    )
    # scratch index on local disk (pid-suffixed — concurrent checkers
    # must not race); lazy-read by the returned plan, so not a
    # TemporaryDirectory — but registered for deletion at the next
    # release_indexes() so repeated runs don't accumulate dirs
    from .operators.indexes import track_scratch_dir

    idx = os.path.join(tempfile.gettempdir(),
                       f"sroie_ivf_oracle_idx_{os.getpid()}")
    track_scratch_dir(spark, idx)
    write_ivf_index(emb, idx, cents)
    # deterministic query subset (an unordered limit() would pick
    # engine-dependent rows — disqualifying for the SQL value check)
    queries = emb.filter(F.col("vec_id") % 97 == 3) \
        .selectExpr("vec_id as query_id", "embedding")
    batch = ivf_knn_indexed(spark, idx, cents, queries, k=5, nprobe=2) \
        .select(F.lit("batch").alias("kind"), "query_id", "vec_id",
                "ivf_bucket", "cosine", "rnk")
    return single.unionByName(batch) \
        .orderBy("kind", "query_id", "rnk", "vec_id")


def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit signatures, 4×16-bit pigeonhole words (65k buckets per
    word — candidate count stays ~linear in corpus size), bucket guard
    against degenerate buckets. SQL-checked: DuckDB recomputes the
    signatures, unsigned word extraction, the bucket-size guard, and
    bit_count(xor) verification. Round 5 folds the former standalone
    ``simhash`` signature query in as 'sig' rows (id_a=doc_id, val=the
    signed 64-bit signature) alongside the 'pair' rows (val=hamming) —
    both halves value-checked in one driver slot."""
    from .operators.dedup import simhash_dedup, simhash_near_dups

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text").unionByName(
        docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text"))
    pairs = simhash_near_dups(
        corpus, max_hamming=3, num_bits=64, n_words=4, max_bucket_size=200
    ).select(F.lit("pair").alias("kind"), "id_a", "id_b",
             F.col("hamming").cast("long").alias("val"))
    sigs = simhash_dedup(docs).select(
        F.lit("sig").alias("kind"), F.col("doc_id").alias("id_a"),
        F.lit(None).cast("long").alias("id_b"),
        F.col("simhash").alias("val"))
    return sigs.unionByName(pairs).orderBy("kind", "id_a", "id_b")


SQL_SIMHASH_NEAR_DUPS = r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 1000000, text FROM documents
), toks AS (
  SELECT doc_id, list_distinct(
    regexp_split_to_array(
      regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '\s+')) AS ts
  FROM corpus
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
), sigs AS (
  SELECT doc_id,
    CAST(CAST(hi_sig AS HUGEINT) * 4294967296 + lo_sig
         - CASE WHEN hi_sig >= 2147483648
                THEN CAST(18446744073709551616 AS HUGEINT)
                ELSE 0 END AS BIGINT) AS simhash,
    CAST(hi_sig AS HUGEINT) * 4294967296 + lo_sig AS us
  FROM halves
), words AS (
  SELECT doc_id, simhash, w AS word_idx,
    CAST(us // ([CAST(1 AS HUGEINT), 65536, 4294967296,
                 281474976710656])[w + 1] % 65536 AS BIGINT) AS word
  FROM sigs, generate_series(0, 3) g(w)
), guarded AS (
  SELECT * FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY word_idx, word) AS bsz
    FROM words) WHERE bsz <= 200
)
SELECT 'sig' AS kind, doc_id AS id_a, CAST(NULL AS BIGINT) AS id_b,
  simhash AS val
FROM sigs WHERE doc_id < 1000000
UNION ALL
SELECT DISTINCT 'pair' AS kind, a.doc_id AS id_a, b.doc_id AS id_b,
  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS val
FROM guarded a JOIN guarded b
  ON a.word_idx = b.word_idx AND a.word = b.word AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY kind, id_a, id_b
"""


def q_raster_crop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X20 composed end-to-end (rows-only: Sobel/Otsu/morphology have
    no SQL form; kernels pinned vs loop oracles in
    tests/test_crop_job.py): real BMP payloads with planted content at
    doc-dependent offsets run the crop-preprocess decision — gray →
    blur → |Sx−Sy| → Otsu → close → erode/dilate → largest-component
    bbox (split_labels.py:71-136)."""
    import numpy as np
    import pandas as pd

    from .operators.multimodal import MEDIA_SCHEMA, crop_offsets

    def gen(batches):
        from .operators.multimodal import encode_bmp

        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                h, w = 64, 96
                y0, x0 = 8 + d % 12, 10 + d % 20
                y1, x1 = y0 + 30, x0 + 48
                arr = np.full((h, w, 3), 245, dtype=np.uint8)
                yy, xx = np.mgrid[y0:y1, x0:x1]
                tex = (40 + 60 * ((yy + xx) % 3)).astype(np.uint8)
                arr[y0:y1, x0:x1, :] = tex[:, :, None]
                out.append({
                    "media_id": f"c{d:06d}", "kind": "image",
                    "payload": encode_bmp(arr),
                    "meta": {"width": w, "height": h, "channels": 3,
                             "sample_rate": None, "n_frames": None},
                })
            yield pd.DataFrame(out)

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    media = docs.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)
    # width gate 80 < 96: every image takes the crop path; erode/dilate
    # 2 (the content block is 30px tall; the reference's 6 is sized for
    # full receipts)
    return crop_offsets(media, width_threshold=80, erode_iterations=2,
                        dilate_iterations=2).orderBy("media_id")


def q_learned_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 learned path (rows-only: the softmax forward has no SQL
    form; held-out parity vs the deterministic scorer is pinned by
    tests/test_learned_classifier.py): the committed charlm_lite
    checkpoint — real NumPy-trained weights — broadcast to executors
    and applied per Arrow batch over synthesized receipt lines."""
    from .operators.model_udf import classify_lines_trained

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    day = (F.col("doc_id") % 28 + 1).cast("string")
    amt = F.concat((F.col("doc_id") % 90 + 1).cast("string"), F.lit(".50"))
    line = F.element_at(F.array(
        F.concat(F.lit("STORE "), F.col("doc_id").cast("string"),
                 F.lit(" SDN BHD")),
        F.concat(F.lit("NO 1"), F.col("doc_id").cast("string"),
                 F.lit(", JALAN TEST, 47300 SELANGOR")),
        F.concat(F.lit("DATE: "), F.lpad(day, 2, "0"), F.lit("/03/2018")),
        F.concat(F.lit("TOTAL RM"), amt),
        F.lit("THANK YOU PLEASE COME AGAIN"),
    ), (F.col("doc_id") % 5 + 1).cast("int"))
    lines = docs.select(
        F.concat(F.lit("d"), F.col("doc_id").cast("string")).alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        (F.col("doc_id") % 5).cast("int").alias("line_idx"),
        line.alias("text"),
    )
    out = classify_lines_trained(lines)
    return out.select(
        "conv_id", "turn_idx", "line_idx", "cls",
        F.floor(F.col("prob") * 1e6 + 0.5).cast("long").alias("prob_micro"),
    ).orderBy("conv_id", "line_idx")


def q_detection_learned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 learned path end-to-end (rows-only: logistic scoring + NMS +
    connector have no SQL form; held-out recall/precision ≥0.9 pinned
    by tests/test_detect_learned.py): the committed ctpn_lite
    checkpoint — real NumPy-trained anchor-scoring weights — broadcast
    to executors, applied per Arrow batch over real BMP receipt pages,
    then the standard decode→clip→filter→NMS→connector plan."""
    import pandas as pd

    from .operators.detect_learned import (
        PAGE_H,
        PAGE_W,
        detect_lines_learned,
        synth_page,
    )
    from .operators.multimodal import MEDIA_SCHEMA

    def gen(batches):
        from .operators.multimodal import encode_bmp

        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                arr, _ = synth_page(d + 100)  # seeds 100-159: disjoint
                # from training (even 0-94) and the tests (odd 1-39)
                out.append({
                    "media_id": f"g{d:06d}", "kind": "image",
                    "payload": encode_bmp(arr),
                    "meta": {"width": PAGE_W, "height": PAGE_H,
                             "channels": 3, "sample_rate": None,
                             "n_frames": None},
                })
            yield pd.DataFrame(out)

    # explicit repartition: the 60-row scan otherwise collapses to ONE
    # partition (AQE byte-based coalescing) and the CPU-bound raster
    # kernel runs serially — same fix as entity_line_labels. r7: full
    # core width (was 16 — page kernels are ~uniform, so more, smaller
    # hash buckets shorten the tail)
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 60) \
        .select("doc_id").repartition(
            spark.sparkContext.defaultParallelism, "doc_id")
    media = docs.mapInPandas(gen, MEDIA_SCHEMA)
    lines = detect_lines_learned(media)
    return lines.select(
        "doc_id", "line_id",
        F.round("xmin").cast("long").alias("x1"),
        F.round("ymin").cast("long").alias("y1"),
        F.round("xmax").cast("long").alias("x2"),
        F.round("ymax").cast("long").alias("y2"),
        F.floor(F.col("score") * 1e6 + 0.5).cast("long")
        .alias("score_micro"),
    ).orderBy("doc_id", "line_id")


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data curation DAG as ONE DataFrame job —
    exact-dup removal → near-dup cluster keep-filter → cross-doc
    duplicated-passage excision → Gopher-style quality gate →
    per-language stratified rebalancing. Every stage is individually
    SQL-oracled elsewhere (`dedup_exact`, `dedup_clusters`,
    `dedup_spans`, `text_quality_lang`, `stratified_sample`); this
    rows-only entry attests the COMPOSITION: one lazy DAG, no
    driver-side collection between stages, every join a
    semi/anti/broadcast join on doc_id. The two surviving-corpus
    stage boundaries (post-exact, post-cluster) are persisted via
    track_persist — each later stage embeds the earlier lineage in
    several plan branches (clusters + spans + output; Spark does no
    cross-operator CSE), so without the persist the exact/cluster
    stages execute up to 3× (22 → ~20 s cold at sf0.1 — the bulk is
    the genuine stage work: banding + CC + winnowing over the
    planted-dup corpus; at real scale these boundaries are
    checkpoints/tables anyway).

    Output: one row per SURVIVING document with its per-stage
    provenance — deterministic, so the driver's rows+hash check is
    stable. Invariants (monotone stage survival, planted-dup removal)
    are pinned by tests/test_curation_pipeline.py.
    """
    from .operators.dedup import (
        dedup_clusters,
        dedup_spans,
        exact_dedup,
        normalized_text,
    )

    docs = _t(spark, sf_dir, "documents")
    # planted duplicates so every stage has work: a shifted exact copy
    # (caught by stage 1) and a near-identical copy of doc_id<50 with
    # one appended token (survives exact, caught by the cluster stage)
    near = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), "lang",
        F.concat(F.col("text"), F.lit(" zz")).alias("text"))
    corpus = (
        docs.select("doc_id", "lang", "text")
        .unionByName(docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                                 "lang", "text"))
        .unionByName(near)
    )

    from .operators.indexes import track_persist

    # 1. exact dedup: keep the min-id copy of each canonical text
    keep_ids = exact_dedup(corpus).select(
        F.col("keep_doc_id").alias("doc_id"))
    s1 = track_persist(corpus.join(keep_ids, "doc_id", "left_semi"))

    # 2. near-dup clusters -> drop non-canonical members
    clusters = dedup_clusters(s1, num_hashes=4, rows_per_band=2,
                              max_bucket_size=200)
    s2 = track_persist(
        s1.join(clusters.filter(~F.col("is_canonical"))
                .select("doc_id"), "doc_id", "left_anti"))

    # 3. passage excision: survivors keep text minus passages owned by
    # a lower-id doc
    spans = dedup_spans(s2, k=30, window=8)
    s3 = (
        s2.join(spans.select("doc_id", "n_dup_spans", "redacted"),
                "doc_id", "left")
        .select(
            "doc_id", "lang",
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_excised"),
            F.coalesce(F.col("redacted"),
                       normalized_text(F.col("text")))
            .alias("curated_text"),
        )
    )

    # 4. quality gate on the CURATED text (Gopher-style bounds)
    toks = F.split(F.trim(F.col("curated_text")), r"\s+")
    n_tokens = F.size(toks)
    n_chars = F.length("curated_text")
    mean_len = (n_chars - n_tokens + 1) / n_tokens
    alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))) / n_tokens
    s4 = (
        s3.withColumn("n_tokens", n_tokens.cast("long"))
        .filter((n_tokens >= 10) & (mean_len >= 2.0) & (mean_len <= 12.0)
                & (alpha >= 0.5))
    )

    # 5. per-language stratified rebalance (portable md5 bucket, no RNG)
    counts = s4.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_lang"))
    from pyspark.sql import Window

    min_n = F.min("n_lang").over(Window.partitionBy())
    rates = counts.select(
        "lang",
        F.floor(min_n * F.lit(1_000_000.0) / F.col("n_lang"))
        .cast("long").alias("rate_ppm"))
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit("d"),
                                          F.col("doc_id").cast("string"))),
                           1, 8), 16, 10).cast("long") % 1_000_000
    )
    return (
        s4.join(F.broadcast(rates), "lang")
        .withColumn("bucket", bucket)
        .filter(F.col("bucket") < F.col("rate_ppm"))
        .select("doc_id", "lang", "n_excised", "n_tokens",
                F.md5("curated_text").alias("curated_fp"))
        .orderBy("doc_id")
    )


def q_ann_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate k-NN JOIN over the embeddings table (every vector's
    top-3 neighbors via the sign-LSH bucket machinery + exact-cosine
    window). Rows-only: recall is probabilistic by design (same as
    ann_bucketed's family); brute-force parity on clustered data is
    pinned by tests/test_dedup_similarity.py."""
    from .operators.similarity import ann_knn_join

    emb = _t(spark, sf_dir, "embeddings")
    return (
        ann_knn_join(emb, k=3, n_bits=8, multiprobe=1)
        .select("id_a", "id_b", "rnk",
                F.floor(F.col("cosine") * 1e6 + 0.5).cast("long")
                .alias("cosine_micro"))
        .orderBy("id_a", "rnk")
    )


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: within-cluster eps-cosine
    pruning keeping each neighborhood's least-central member, served
    from the COMMITTED centroids (models/centroids_k8.json — the
    judged assignment/cosine/keep algebra is fully value-checked as
    the 'sem' rows of similarity_topk with the same literals). This
    registry entry benches the production judge shape; the TRAINING
    path (sample init + distributed Lloyd) stays covered by NumPy
    parity in tests/test_training.py — its data-dependent float
    centroids are the one part no SQL oracle can replay."""
    from .operators.semdedup import semdedup
    from .operators.similarity import load_centroids

    emb = _t(spark, sf_dir, "embeddings")
    dup = emb.select((F.col("vec_id") + 1_000_000).alias("vec_id"),
                     "embedding")
    corpus = emb.select("vec_id", "embedding").unionByName(dup)
    out = semdedup(corpus, eps=0.999, centroids=load_centroids())
    return out.select(
        "vec_id", "cluster",
        F.floor(F.col("cent_sim") * 1e6 + F.lit(0.5)).cast("long")
        .alias("cent_sim_micro"),
        "keep").orderBy("vec_id")


ROWS_ONLY_QUERIES = {
    "curation_pipeline": (q_curation_pipeline, None),
    "ann_knn_join": (q_ann_knn_join, None),
    "semdedup": (q_semdedup, None),
    # "anchor_matching" + queries_geo's "iou_pairs" folded into
    # box_matching (round 5 driver-window fold); both halves still
    # value-checked there.
    "box_matching": (q_box_matching, _sql_box_matching()),
    "raster_crop": (q_raster_crop, None),
    "learned_classifier": (q_learned_classifier, None),
    "detection_learned": (q_detection_learned, None),
    "ivf_ann": (q_ivf_ann, None),
    "simhash_near_dups": (q_simhash_near_dups, SQL_SIMHASH_NEAR_DUPS),
    "detection_boxes": (q_detection_boxes, SQL_DETECTION_BOXES),
    # "detection_pipeline" folded into detection_boxes' `lines` branch
    # (round 5) — the full decode->NMS->graph->assembly tail is now
    # value-checked there instead of rows-only.
    "deteval_corpus": (q_deteval, SQL_DETEVAL),
    "detection_sink": (q_detection_sink, SQL_DETECTION_SINK),
    "entity_sink": (q_entity_sink, None),
    "multimodal_features": (q_multimodal_features, SQL_MULTIMODAL_FEATURES),
}
