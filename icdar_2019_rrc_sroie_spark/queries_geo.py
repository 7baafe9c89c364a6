"""Query battery, batch 2: detection geometry + windowed rules.

Boxes are synthesized deterministically from TPC-H columns so DuckDB
can reproduce them; all IoU/encode/decode arithmetic is checked
value-for-value (micro fixed-point).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .constants import (
    TOTAL_INFER_BLOCK_PATTERN,
    TOTAL_INFER_CONTEXT_PATTERN,
    TOTAL_PATTERN,
)
from .operators.encode import encode_chars
from .operators.geometry import (
    anchor_grid,
    clip_expr,
    decode_box,
    encode_box,
    iou_expr,
    split_strips,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _micro(col):
    return F.floor(col * 1e6 + F.lit(0.5)).cast("long")


def _boxes(li: DataFrame) -> DataFrame:
    """Deterministic synthetic layout boxes from lineitem keys."""
    x0 = (F.col("l_partkey") % 50).cast("double") * 16.0
    y0 = (F.col("l_suppkey") % 40).cast("double") * 16.0
    x1 = x0 + 16.0 * (1 + F.col("l_linenumber") % 3) - 1.0
    y1 = y0 + 11.0 + (F.col("l_orderkey") % 20).cast("double")
    return li.select(
        "l_orderkey", "l_linenumber",
        x0.alias("xmin"), y0.alias("ymin"),
        x1.alias("xmax"), y1.alias("ymax"),
    )


_BOXES_SQL = """
  SELECT l_orderkey, l_linenumber,
         CAST(l_partkey % 50 AS DOUBLE) * 16.0 AS xmin,
         CAST(l_suppkey % 40 AS DOUBLE) * 16.0 AS ymin,
         CAST(l_partkey % 50 AS DOUBLE) * 16.0 + 16.0 * (1 + l_linenumber % 3) - 1.0 AS xmax,
         CAST(l_suppkey % 40 AS DOUBLE) * 16.0 + 11.0 + CAST(l_orderkey % 20 AS DOUBLE) AS ymax
  FROM lineitem
"""

# ---------------------------------------------------------------------------
# J1/J8: pairwise IoU theta-join within a document group
# ---------------------------------------------------------------------------


def q_iou_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    boxes = _boxes(_t(spark, sf_dir, "lineitem"))
    a = boxes.select(
        F.col("l_orderkey").alias("doc"), F.col("l_linenumber").alias("la"),
        F.col("xmin").alias("axmin"), F.col("ymin").alias("aymin"),
        F.col("xmax").alias("axmax"), F.col("ymax").alias("aymax"))
    b = boxes.select(
        F.col("l_orderkey").alias("doc"), F.col("l_linenumber").alias("lb"),
        F.col("xmin").alias("bxmin"), F.col("ymin").alias("bymin"),
        F.col("xmax").alias("bxmax"), F.col("ymax").alias("bymax"))
    iou = iou_expr(F.col("axmin"), F.col("aymin"), F.col("axmax"), F.col("aymax"),
                   F.col("bxmin"), F.col("bymin"), F.col("bxmax"), F.col("bymax"))
    return (
        a.join(b, "doc")
        .filter(F.col("la") < F.col("lb"))
        .select("doc", "la", "lb", _micro(iou).alias("iou_micro"))
        .filter(F.col("iou_micro") > 0)
        .orderBy("doc", "la", "lb")
    )


SQL_IOU_PAIRS = f"""
WITH boxes AS ({_BOXES_SQL})
SELECT a.l_orderkey AS doc, a.l_linenumber AS la, b.l_linenumber AS lb,
  CAST(floor(
    greatest(0.0, least(a.xmax,b.xmax) - greatest(a.xmin,b.xmin)) *
    greatest(0.0, least(a.ymax,b.ymax) - greatest(a.ymin,b.ymin)) /
    ((a.xmax-a.xmin+1.0)*(a.ymax-a.ymin+1.0) + (b.xmax-b.xmin+1.0)*(b.ymax-b.ymin+1.0)
     - greatest(0.0, least(a.xmax,b.xmax) - greatest(a.xmin,b.xmin)) *
       greatest(0.0, least(a.ymax,b.ymax) - greatest(a.ymin,b.ymin)) + 1e-6)
    * 1e6 + 0.5) AS BIGINT) AS iou_micro
FROM boxes a JOIN boxes b
  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
WHERE greatest(0.0, least(a.xmax,b.xmax) - greatest(a.xmin,b.xmin)) *
      greatest(0.0, least(a.ymax,b.ymax) - greatest(a.ymin,b.ymin)) > 0
ORDER BY doc, la, lb
"""

# ---------------------------------------------------------------------------
# X13/X14 encode/decode roundtrip + X17 anchor grid (merged round 4)
# ---------------------------------------------------------------------------


def q_box_encode_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13/X14 encode/decode roundtrip PLUS the X17 anchor grid as a
    discriminated union (former ``anchor_grid`` query, merged round 4
    to free a driver-window slot for ``langid_trigram``; operators
    unchanged, both halves still fully value-checked): 'box' rows
    carry (vc, vh, roundtrip errors) in v1..v4, 'grid' rows carry the
    doubled anchor coords."""
    boxes = _boxes(_t(spark, sf_dir, "lineitem"))
    a_ymin = (F.col("ymin") / 2.0) + 3.0
    a_ymax = a_ymin + 10.0 + (F.col("l_linenumber") % 5).cast("double") * 7.0
    vc, vh = encode_box(F.col("ymin"), F.col("ymax"), a_ymin, a_ymax)
    dec_lo, dec_hi = decode_box(vc, vh, a_ymin, a_ymax)
    box_rows = boxes.select(
        F.lit("box").alias("kind"),
        F.col("l_orderkey").alias("k1"),
        F.col("l_linenumber").cast("long").alias("k2"),
        _micro(vc).alias("v1"),
        _micro(vh).alias("v2"),
        _micro(dec_lo - F.col("ymin")).alias("v3"),
        _micro(dec_hi - F.col("ymax")).alias("v4"),
    )
    grid = anchor_grid(spark, feat_h=8, feat_w=12)
    grid_rows = grid.select(
        F.lit("grid").alias("kind"),
        F.col("anchor_id").cast("long").alias("k1"),
        F.lit(0).cast("long").alias("k2"),
        (F.col("xmin") * 2).cast("long").alias("v1"),
        (F.col("ymin") * 2).cast("long").alias("v2"),
        (F.col("xmax") * 2).cast("long").alias("v3"),
        (F.col("ymax") * 2).cast("long").alias("v4"),
    )
    return box_rows.unionByName(grid_rows).orderBy("kind", "k1", "k2")


SQL_BOX_ENCODE_DECODE = f"""
WITH boxes AS ({_BOXES_SQL}),
prep AS (
  SELECT l_orderkey, l_linenumber, ymin, ymax,
         ymin/2.0 + 3.0 AS aymin,
         ymin/2.0 + 3.0 + 10.0 + CAST(l_linenumber % 5 AS DOUBLE)*7.0 AS aymax
  FROM boxes
), enc AS (
  SELECT *, (ymax-ymin+1.0) AS h, (aymax-aymin+1.0) AS ha,
         (ymin+ymax)/2.0 AS cy, (aymin+aymax)/2.0 AS cya
  FROM prep
), v AS (
  SELECT *, (cy-cya)/ha AS vc, ln(h/ha) AS vh FROM enc
),
hs(hi, h) AS (VALUES (0,11.0),(1,15.0),(2,22.0),(3,32.0),(4,45.0),
                     (5,65.0),(6,93.0),(7,133.0),(8,190.0),(9,273.0)),
agrid AS (
  SELECT fy, fx, hi, h FROM generate_series(0,7) g1(fy)
  CROSS JOIN generate_series(0,11) g2(fx) CROSS JOIN hs
)
SELECT 'box' AS kind, l_orderkey AS k1, CAST(l_linenumber AS BIGINT) AS k2,
  CAST(floor(vc*1e6+0.5) AS BIGINT) AS v1,
  CAST(floor(vh*1e6+0.5) AS BIGINT) AS v2,
  CAST(floor(((vc*ha+cya) - exp(vh)*ha/2.0 - ymin)*1e6+0.5) AS BIGINT) AS v3,
  CAST(floor(((vc*ha+cya) + exp(vh)*ha/2.0 - ymax)*1e6+0.5) AS BIGINT) AS v4
FROM v
UNION ALL
SELECT 'grid' AS kind, CAST((fy*12 + fx)*10 + hi AS BIGINT) AS k1,
  CAST(0 AS BIGINT) AS k2,
  CAST((fx*16 + 7.5 - 8.0) * 2 AS BIGINT) AS v1,
  CAST((fy*16 + 7.5 - h/2) * 2 AS BIGINT) AS v2,
  CAST((fx*16 + 7.5 + 8.0) * 2 AS BIGINT) AS v3,
  CAST((fy*16 + 7.5 + h/2) * 2 AS BIGINT) AS v4
FROM agrid
ORDER BY kind, k1, k2
"""

# ---------------------------------------------------------------------------
# F2 clip + X16 strip split
# ---------------------------------------------------------------------------


def q_clip_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    boxes = _boxes(_t(spark, sf_dir, "lineitem"))
    img_w, img_h = 640.0, 480.0
    cx0 = clip_expr(F.col("xmin"), F.lit(img_w))
    cx1 = clip_expr(F.col("xmax"), F.lit(img_w))
    cy0 = clip_expr(F.col("ymin"), F.lit(img_h))
    cy1 = clip_expr(F.col("ymax"), F.lit(img_h))
    strips = split_strips(cx0, cx1 + 1.0)
    return (
        boxes.select(
            "l_orderkey", "l_linenumber",
            cx0.alias("cx0"), cy0.alias("cy0"),
            cx1.alias("cx1"), cy1.alias("cy1"),
            F.posexplode(strips).alias("strip_pos", "strip_id"),
        )
        .select(
            "l_orderkey", "l_linenumber", "strip_pos",
            F.col("strip_id").cast("long").alias("strip_id"),
            (F.col("strip_id") * 16).cast("long").alias("strip_x0"),
            _micro(F.col("cx0")).alias("cx0_micro"),
            _micro(F.col("cy0")).alias("cy0_micro"),
            _micro(F.col("cx1")).alias("cx1_micro"),
            _micro(F.col("cy1")).alias("cy1_micro"),
        )
        .orderBy("l_orderkey", "l_linenumber", "strip_pos")
    )


SQL_CLIP_SPLIT = f"""
WITH boxes AS ({_BOXES_SQL}),
clipped AS (
  SELECT l_orderkey, l_linenumber,
    greatest(0.0, least(xmin, 639.0)) AS cx0,
    greatest(0.0, least(ymin, 479.0)) AS cy0,
    greatest(0.0, least(xmax, 639.0)) AS cx1,
    greatest(0.0, least(ymax, 479.0)) AS cy1
  FROM boxes
),
strips AS (
  SELECT *, unnest([s for s in generate_series(
              CAST(floor(cx0/16) AS BIGINT),
              CAST(ceil((cx1+1.0)/16) AS BIGINT) - 1)]) AS strip_id,
         generate_subscripts([s for s in generate_series(
              CAST(floor(cx0/16) AS BIGINT),
              CAST(ceil((cx1+1.0)/16) AS BIGINT) - 1)], 1) - 1 AS strip_pos
  FROM clipped
)
SELECT l_orderkey, l_linenumber, CAST(strip_pos AS INT) AS strip_pos,
  strip_id, strip_id*16 AS strip_x0,
  CAST(floor(cx0*1e6+0.5) AS BIGINT) AS cx0_micro,
  CAST(floor(cy0*1e6+0.5) AS BIGINT) AS cy0_micro,
  CAST(floor(cx1*1e6+0.5) AS BIGINT) AS cx1_micro,
  CAST(floor(cy1*1e6+0.5) AS BIGINT) AS cy1_micro
FROM strips ORDER BY l_orderkey, l_linenumber, strip_pos
"""

# ---------------------------------------------------------------------------
# W4 total-lookback rule over event-derived receipt lines
# ---------------------------------------------------------------------------


def q_total_lookback(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    amt = F.concat(
        (F.col("event_id") % 90 + 1).cast("string"), F.lit("."),
        F.lpad((F.col("event_id") % 100).cast("string"), 2, "0"),
    )
    line = (
        F.when(F.col("event_type") == "click", F.concat(F.lit("TOTAL RM"), amt))
        .when(F.col("event_type") == "view", F.concat(F.lit("SUBTOTAL "), amt))
        .when(F.col("event_type") == "purchase", F.concat(F.lit("AMOUNT DUE "), amt))
        .when(F.col("event_type") == "signup", F.concat(F.lit("ITEM A4 "), amt))
        .otherwise(F.lit("THANK YOU"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lined = events.select("user_id", "event_id", "ts", line.alias("line")) \
        .withColumn("rn", F.row_number().over(w))
    total = F.trim(F.regexp_extract(F.trim(F.col("line")), TOTAL_PATTERN, 0))
    ctx = (
        F.trim(F.col("line")).rlike(TOTAL_INFER_CONTEXT_PATTERN)
        & ~F.trim(F.col("line")).rlike(TOTAL_INFER_BLOCK_PATTERN)
    )
    flagged = lined.select(
        "user_id", "rn", total.alias("total"), ctx.cast("int").alias("ctx")
    )
    per_user = Window.partitionBy("user_id")
    p0 = F.min(F.when((F.col("ctx") == 1) & (F.col("rn") >= 2), F.col("rn"))).over(per_user)
    with_p0 = flagged.withColumn("p0", p0)
    i_star = F.min(
        F.when((F.col("total") != "") & (F.col("rn") >= F.col("p0")), F.col("rn"))
    ).over(per_user)
    resolved = with_p0.withColumn("i_star", i_star)
    return (
        resolved.filter(F.col("rn") == F.col("i_star"))
        .select("user_id", F.col("total").alias("accepted_total"),
                F.col("i_star").alias("at_rn"))
        .orderBy("user_id")
    )


SQL_TOTAL_LOOKBACK = f"""
WITH lined AS (
  SELECT user_id, event_id, ts,
    CASE event_type
      WHEN 'click' THEN 'TOTAL RM' || (event_id % 90 + 1) || '.' || lpad(CAST(event_id % 100 AS VARCHAR),2,'0')
      WHEN 'view' THEN 'SUBTOTAL ' || (event_id % 90 + 1) || '.' || lpad(CAST(event_id % 100 AS VARCHAR),2,'0')
      WHEN 'purchase' THEN 'AMOUNT DUE ' || (event_id % 90 + 1) || '.' || lpad(CAST(event_id % 100 AS VARCHAR),2,'0')
      WHEN 'signup' THEN 'ITEM A4 ' || (event_id % 90 + 1) || '.' || lpad(CAST(event_id % 100 AS VARCHAR),2,'0')
      ELSE 'THANK YOU' END AS line,
    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS rn
  FROM events
), flagged AS (
  SELECT user_id, rn,
    trim(regexp_extract(trim(line), '{TOTAL_PATTERN}', 0)) AS total,
    CASE WHEN regexp_matches(trim(line), '{TOTAL_INFER_CONTEXT_PATTERN}')
              AND NOT regexp_matches(trim(line), '{TOTAL_INFER_BLOCK_PATTERN}')
         THEN 1 ELSE 0 END AS ctx
  FROM lined
), resolved AS (
  SELECT *, min(CASE WHEN ctx = 1 AND rn >= 2 THEN rn END) OVER (PARTITION BY user_id) AS p0
  FROM flagged
), final AS (
  SELECT *, min(CASE WHEN total <> '' AND rn >= p0 THEN rn END)
              OVER (PARTITION BY user_id) AS i_star
  FROM resolved
)
SELECT user_id, total AS accepted_total, i_star AS at_rn
FROM final WHERE rn = i_star ORDER BY user_id
"""

# ---------------------------------------------------------------------------
# A7 running average meter + A10 best-run argmax
# ---------------------------------------------------------------------------


def q_avg_meter(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    # exact rational representation of the running mean: values are
    # quantized per-row (exact), the running sum/count are integers
    micros = F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id") \
        .rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("v_micro", micros)
        .withColumn("running_sum_micro", F.sum("v_micro").over(w))
        .withColumn("running_n", F.count(F.lit(1)).over(w).cast("long"))
        .withColumn("rn", F.row_number().over(wn))
        .filter(F.col("rn") == 1)
        .select("user_id", "running_sum_micro", "running_n")
        .orderBy("user_id")
    )


SQL_AVG_METER = """
WITH r AS (
  SELECT user_id,
    CAST(SUM(CAST(floor(value*1e6+0.5) AS BIGINT)) OVER w AS BIGINT) AS running_sum_micro,
    CAST(COUNT(*) OVER w AS BIGINT) AS running_n,
    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
)
SELECT user_id, running_sum_micro, running_n
FROM r WHERE rn = 1 ORDER BY user_id
"""


def q_best_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: per user, the contiguous same-type run with max value;
    earliest run wins ties (strictly-greater update rule)."""
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    change = (
        F.lag("event_type").over(w).isNull()
        | (F.col("event_type") != F.lag("event_type").over(w))
    ).cast("int")
    runs = events.withColumn(
        "run_id", F.sum(change).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int")
    )
    agg = runs.groupBy("user_id", "run_id").agg(
        F.max("value").alias("run_max"),
        F.first("event_type").alias("event_type"),
        F.count(F.lit(1)).cast("long").alias("run_len"),
    )
    wr = Window.partitionBy("user_id").orderBy(F.desc("run_max"), F.asc("run_id"))
    return (
        agg.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select("user_id", "run_id", "event_type", "run_len",
                _micro(F.col("run_max")).alias("run_max_micro"))
        .orderBy("user_id")
    )


def q_event_meters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 + A10 merged into one driver row (round 3, to free window
    slots): per user the final running-average meter state joined with
    the best contiguous same-type run. Both operators unchanged."""
    meter = q_avg_meter(spark, sf_dir)
    span = q_best_span(spark, sf_dir)
    return meter.join(span, "user_id").orderBy("user_id")


SQL_BEST_SPAN = """
WITH flagged AS (
  SELECT user_id, event_id, event_type, ts, value,
    CASE WHEN lag(event_type) OVER w IS NULL
              OR event_type <> lag(event_type) OVER w THEN 1 ELSE 0 END AS chg
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), runs AS (
  SELECT user_id, event_type, value,
    CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS UNBOUNDED PRECEDING) AS INT) AS run_id
  FROM flagged
), agg AS (
  SELECT user_id, run_id, max(value) AS run_max,
         min(event_type) AS event_type, CAST(COUNT(*) AS BIGINT) AS run_len
  FROM runs GROUP BY user_id, run_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
              ORDER BY run_max DESC, run_id ASC) AS rk
  FROM agg
)
SELECT user_id, run_id, event_type, run_len,
       CAST(floor(run_max*1e6+0.5) AS BIGINT) AS run_max_micro
FROM ranked WHERE rk = 1 ORDER BY user_id
"""


def _without_order(sql: str, clause: str = "ORDER BY user_id") -> str:
    """Strip the single trailing ORDER BY when embedding a standalone
    oracle as a CTE — fails loudly if the clause count ever changes."""
    assert sql.count(clause) == 1, f"expected exactly one {clause!r}"
    return sql.replace(clause, "")


SQL_EVENT_METERS = f"""
WITH meter AS ({_without_order(SQL_AVG_METER)}),
span AS ({_without_order(SQL_BEST_SPAN)})
SELECT meter.user_id, running_sum_micro, running_n,
       run_id, event_type, run_len, run_max_micro
FROM meter JOIN span ON meter.user_id = span.user_id
ORDER BY meter.user_id
"""

# ---------------------------------------------------------------------------
# A4/A5 confusion matrix + per-class P/R/F1
# ---------------------------------------------------------------------------


def q_confusion_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    pred = F.when(F.col("value") > 0.5, F.col("event_type")).otherwise(F.lit("none"))
    labeled = events.select(F.col("event_type").alias("gt"), pred.alias("pred"))
    cm = labeled.groupBy("gt", "pred").agg(F.count(F.lit(1)).alias("n"))
    tp = F.sum(F.when(F.col("gt") == F.col("pred"), F.col("n")).otherwise(0))
    per_gt = cm.groupBy("gt").agg(
        tp.alias("tp"), F.sum("n").alias("support"))
    per_pred = cm.groupBy("pred").agg(F.sum("n").alias("predicted"))
    joined = per_gt.join(per_pred, per_gt.gt == per_pred.pred, "left").select(
        "gt", "tp", "support", F.coalesce("predicted", F.lit(0)).alias("predicted")
    )
    precision = F.col("tp") / F.col("predicted")
    recall = F.col("tp") / F.col("support")
    f1 = F.when(
        (F.col("tp") > 0), 2 * precision * recall / (precision + recall)
    ).otherwise(F.lit(0.0))
    return joined.select(
        "gt", F.col("tp").cast("long").alias("tp"),
        F.col("support").cast("long").alias("support"),
        F.col("predicted").cast("long").alias("predicted"),
        _micro(precision).alias("precision_micro"),
        _micro(recall).alias("recall_micro"),
        _micro(f1).alias("f1_micro"),
    ).orderBy("gt")


SQL_CONFUSION_F1 = """
WITH labeled AS (
  SELECT event_type AS gt,
         CASE WHEN value > 0.5 THEN event_type ELSE 'none' END AS pred
  FROM events
), cm AS (
  SELECT gt, pred, COUNT(*) AS n FROM labeled GROUP BY gt, pred
), per_gt AS (
  SELECT gt, SUM(CASE WHEN gt = pred THEN n ELSE 0 END) AS tp,
         SUM(n) AS support
  FROM cm GROUP BY gt
), per_pred AS (
  SELECT pred, SUM(n) AS predicted FROM cm GROUP BY pred
)
SELECT g.gt, CAST(g.tp AS BIGINT) AS tp, CAST(g.support AS BIGINT) AS support,
  CAST(COALESCE(p.predicted, 0) AS BIGINT) AS predicted,
  CAST(floor(g.tp * 1.0 / p.predicted * 1e6 + 0.5) AS BIGINT) AS precision_micro,
  CAST(floor(g.tp * 1.0 / g.support * 1e6 + 0.5) AS BIGINT) AS recall_micro,
  CAST(CASE WHEN g.tp > 0 THEN floor(
    2.0 * (g.tp*1.0/p.predicted) * (g.tp*1.0/g.support)
      / ((g.tp*1.0/p.predicted) + (g.tp*1.0/g.support)) * 1e6 + 0.5)
    ELSE 0 END AS BIGINT) AS f1_micro
FROM per_gt g LEFT JOIN per_pred p ON g.gt = p.pred
ORDER BY g.gt
"""

# ---------------------------------------------------------------------------
# F10 char-index encoding
# ---------------------------------------------------------------------------


def q_charlm_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    enc = encode_chars(F.substring(F.col("text"), 1, 100))
    # array<int> serialized with to_json so the driver canonicalizer can
    # hash the column (lists are unhashable in pandas); Spark and DuckDB
    # both render int arrays as '[1,2,3]'.
    return docs.select(
        "doc_id",
        F.to_json(enc).alias("enc"),
        F.aggregate(enc, F.lit(0), lambda a, x: a + x).alias("enc_sum"),
    ).orderBy("doc_id")


def _sql_charlm_encode() -> str:
    from .constants import VOCAB
    vocab_sql = VOCAB.replace("'", "''")
    return rf"""
WITH prep AS (
  SELECT doc_id, substr(upper(substr(text,1,100)), 1, 68) AS t FROM documents
), enc AS (
  SELECT doc_id,
    [CAST(strpos('{vocab_sql}', c) AS INT) for c in regexp_split_to_array(t, '')] AS idxs
  FROM prep
), padded AS (
  SELECT doc_id,
    list_concat(idxs, [CAST(0 AS INT) for _ in generate_series(1, 68 - len(idxs))]) AS enc
  FROM enc
)
SELECT doc_id, to_json(enc) AS enc,
       CAST(list_sum(enc) AS INT) AS enc_sum
FROM padded ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Detection-pipeline SQL-expressible prefix (X17 grid ⋈ X14 decode →
# F2 clip → F1 score filter): everything before the sequential NMS
# kernel is pure Catalyst, so it gets a full value oracle; the kernel
# tail stays rows-only in q_detection_pipeline. Mirrors
# plans/detection.py:detect_text_lines up to the nms_per_doc call.
# ---------------------------------------------------------------------------


def q_detection_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem") \
        .filter(F.col("l_orderkey") % 100 == 0) \
        .select("l_orderkey").distinct()
    anchors = anchor_grid(spark, feat_h=8, feat_w=16, heights=(11, 15, 22))
    # deterministic engine-portable prediction synthesis: two 32-bit
    # md5 slices drive (vc, vh, score) — xxhash64 (used by the
    # rows-only pipeline query) has no DuckDB equivalent
    key = F.concat(F.col("l_orderkey").cast("string"), F.lit("_"),
                   F.col("anchor_id").cast("string"))
    h1 = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5(key), 9, 8), 16, 10).cast("long")
    preds = li.crossJoin(F.broadcast(anchors)).select(
        "l_orderkey", "anchor_id",
        ((h1 % 21 - 10) / 20.0).alias("vc"),
        ((h2 % 13 - 6) / 10.0).alias("vh"),
        ((h1 % 1000) / 1000.0).alias("score"),
        "xmin", "ymin", "xmax", "ymax",
    )
    d_ymin, d_ymax = decode_box(
        F.col("vc"), F.col("vh"), F.col("ymin"), F.col("ymax"))
    img_w, img_h = 256.0, 128.0
    out = preds.select(
        "l_orderkey", "anchor_id",
        clip_expr(F.col("xmin"), F.lit(img_w)).alias("cxmin"),
        clip_expr(d_ymin, F.lit(img_h)).alias("cymin"),
        clip_expr(F.col("xmax"), F.lit(img_w)).alias("cxmax"),
        clip_expr(d_ymax, F.lit(img_h)).alias("cymax"),
        "score",
    ).filter(F.col("score") > 0.7)
    return out.select(
        "l_orderkey", "anchor_id",
        _micro(F.col("cxmin")).alias("xmin_micro"),
        _micro(F.col("cymin")).alias("ymin_micro"),
        _micro(F.col("cxmax")).alias("xmax_micro"),
        _micro(F.col("cymax")).alias("ymax_micro"),
        _micro(F.col("score")).alias("score_micro"),
    ).orderBy("l_orderkey", "anchor_id")


# The 16x8x3 anchor grid as a CTE pair — shared by every oracle that
# replays the synthetic detection fixture (queries_pipeline composes it
# into detection_boxes / detection_sink).
SQL_GRID_CTES = """hs(hi, h) AS (VALUES (0,11.0),(1,15.0),(2,22.0)),
grid AS (
  SELECT (fy*16 + fx)*3 + hi AS anchor_id,
         fx*16 + 7.5 - 8.0 AS xmin, fy*16 + 7.5 - h/2 AS ymin,
         fx*16 + 7.5 + 8.0 AS xmax, fy*16 + 7.5 + h/2 AS ymax
  FROM generate_series(0,7) g1(fy)
  CROSS JOIN generate_series(0,15) g2(fx) CROSS JOIN hs
)"""


def sql_md5_boxes_ctes(keys_sql: str, key_col: str, prefix: str = "",
                       thr: float = 0.7) -> str:
    """CTE chain replaying the md5-driven synthetic prediction fixture
    (q_detection_prefix's Spark side): key set x anchor ``grid`` (from
    :data:`SQL_GRID_CTES`, which must precede this fragment) → h1/h2
    digests → vertical-coordinate decode → clip to the 256x128 page →
    score filter. Emits ``{prefix}keys/{prefix}preds/{prefix}decoded/
    {prefix}clipped``; the terminal ``{prefix}clipped`` has columns
    (``key_col``, anchor_id, cxmin, cymin, cxmax, cymax, score).
    Parameterized so the detection_boxes oracle replays the chain TWICE
    (prefix half keyed l_orderkey at thr 0.7, lines half keyed doc at
    thr 0.9) without duplicating the decode algebra (round-5 review:
    three hand-kept copies had already drifted into dead code)."""
    p = prefix
    return f"""{p}keys AS (
  {keys_sql}
), {p}preds AS (
  SELECT {key_col}, anchor_id, xmin, ymin, xmax, ymax,
    CAST('0x' || substr(md5(CAST({key_col} AS VARCHAR) || '_' ||
         CAST(anchor_id AS VARCHAR)), 1, 8) AS BIGINT) AS h1,
    CAST('0x' || substr(md5(CAST({key_col} AS VARCHAR) || '_' ||
         CAST(anchor_id AS VARCHAR)), 9, 8) AS BIGINT) AS h2
  FROM {p}keys CROSS JOIN grid
), {p}decoded AS (
  SELECT {key_col}, anchor_id,
    (h1 % 1000) / 1000.0 AS score,
    xmin, xmax,
    ((h1 % 21 - 10) / 20.0) * (ymax - ymin + 1.0)
      + (ymin + ymax) / 2.0 AS vcy,
    exp((h2 % 13 - 6) / 10.0) * (ymax - ymin + 1.0) AS vhx
  FROM {p}preds
), {p}clipped AS (
  SELECT {key_col}, anchor_id,
    greatest(0.0, least(xmin, 255.0)) AS cxmin,
    greatest(0.0, least(vcy - vhx/2.0, 127.0)) AS cymin,
    greatest(0.0, least(xmax, 255.0)) AS cxmax,
    greatest(0.0, least(vcy + vhx/2.0, 127.0)) AS cymax,
    score
  FROM {p}decoded WHERE score > {thr}
)"""


SQL_QUERIES_GEO = {
    # "iou_pairs" folded into queries_pipeline's box_matching (round 5).
    # "detection_prefix" folded into queries_pipeline's detection_boxes
    # (round 5) together with the formerly rows-only NMS kernel; the
    # prefix half is still fully value-checked there via the composed
    # sql_md5_boxes_ctes chain (single source, no copies).
    "box_encode_decode": (q_box_encode_decode, SQL_BOX_ENCODE_DECODE),
    "clip_split": (q_clip_split, SQL_CLIP_SPLIT),
    "total_lookback": (q_total_lookback, SQL_TOTAL_LOOKBACK),
    "event_meters": (q_event_meters, SQL_EVENT_METERS),
    "confusion_f1": (q_confusion_f1, SQL_CONFUSION_F1),
    "charlm_encode": (q_charlm_encode, _sql_charlm_encode()),
}
