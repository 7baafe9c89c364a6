"""Query battery, batch 5: annotation parsing (S3/S4) and the
boilerplate/DOM strip stage, both DuckDB-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.boilerplate import main_content, strip_tags
from .operators.geometry import parse_annotation_line


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_annotation_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize SROIE-format annotation lines (8 coords + transcript
    that may contain commas), parse them, project xyxy extents."""
    li = _t(spark, sf_dir, "lineitem")
    x0 = (F.col("l_partkey") % 40) * 16
    y0 = (F.col("l_suppkey") % 30) * 16
    x1 = x0 + 90
    y1 = y0 + 20
    line = F.concat_ws(
        ",",
        x0, y0, x1, y0, x1, y1, x0, y1,
        F.concat(F.lit("ITEM "), F.col("l_returnflag"),
                 F.lit(", QTY "), F.col("l_quantity").cast("int")),
    )
    parsed = li.select(
        "l_orderkey", "l_linenumber",
        parse_annotation_line(line).alias("p"),
    )
    coords = F.col("p.coords")
    xs = F.filter(coords, lambda _, i: i % 2 == 0)
    ys = F.filter(coords, lambda _, i: i % 2 == 1)
    return parsed.select(
        "l_orderkey", "l_linenumber",
        F.array_min(xs).cast("long").alias("xmin"),
        F.array_min(ys).cast("long").alias("ymin"),
        F.array_max(xs).cast("long").alias("xmax"),
        F.array_max(ys).cast("long").alias("ymax"),
        F.col("p.transcript").alias("transcript"),
    ).orderBy("l_orderkey", "l_linenumber")


SQL_ANNOTATION_PARSE = """
WITH built AS (
  SELECT l_orderkey, l_linenumber,
    (l_partkey % 40) * 16 AS x0, (l_suppkey % 30) * 16 AS y0,
    (l_partkey % 40) * 16 + 90 AS x1, (l_suppkey % 30) * 16 + 20 AS y1,
    'ITEM ' || l_returnflag || ', QTY ' || CAST(l_quantity AS INT) AS transcript
  FROM lineitem
), lines AS (
  SELECT l_orderkey, l_linenumber,
    x0 || ',' || y0 || ',' || x1 || ',' || y0 || ',' || x1 || ',' || y1
       || ',' || x0 || ',' || y1 || ',' || transcript AS line
  FROM built
), parsed AS (
  SELECT l_orderkey, l_linenumber, string_split(trim(line), ',') AS parts
  FROM lines
)
SELECT l_orderkey, l_linenumber,
  CAST(least(CAST(parts[1] AS DOUBLE), CAST(parts[3] AS DOUBLE),
             CAST(parts[5] AS DOUBLE), CAST(parts[7] AS DOUBLE)) AS BIGINT) AS xmin,
  CAST(least(CAST(parts[2] AS DOUBLE), CAST(parts[4] AS DOUBLE),
             CAST(parts[6] AS DOUBLE), CAST(parts[8] AS DOUBLE)) AS BIGINT) AS ymin,
  CAST(greatest(CAST(parts[1] AS DOUBLE), CAST(parts[3] AS DOUBLE),
             CAST(parts[5] AS DOUBLE), CAST(parts[7] AS DOUBLE)) AS BIGINT) AS xmax,
  CAST(greatest(CAST(parts[2] AS DOUBLE), CAST(parts[4] AS DOUBLE),
             CAST(parts[6] AS DOUBLE), CAST(parts[8] AS DOUBLE)) AS BIGINT) AS ymax,
  array_to_string(list_slice(parts, 9, len(parts)), ',') AS transcript
FROM parsed ORDER BY l_orderkey, l_linenumber
"""


def q_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap documents in HTML-ish boilerplate (nav bar + social footer,
    both link-dense, PLUS two planted short blocks), then run all
    THREE extraction stages: the DOM main-content + tag-strip +
    line-filter path, the round-3 JusText-style context-free block
    classifier, and the round-5 CONTEXT-SENSITIVE pass
    (operators/boilerplate.py:contextual_block_table). The planted
    'Fig. 1' caption sits next to the good content block (must be
    recovered by the context rule) while 'ok then' sits between the
    link-dense social block and the short footer chrome (must stay
    dropped) — so n_recovered and the reassembled-main md5 genuinely
    value-check the neighbor-inheritance rule."""
    from .operators.boilerplate import (
        classify_blocks,
        contextual_block_table,
        contextual_main_expr,
    )

    docs = _t(spark, sf_dir, "documents")
    wrapped = F.concat(
        F.lit('<html><head><title>viewer</title></head><body>\n'
              '<nav><a href="/">Home</a> <a href="/d">Docs</a> '
              '<a href="/s">Search</a></nav>\n'
              '== HEADER doc '),
        F.col("doc_id"),
        F.lit(' ==\n<div class="content">\n   '),
        F.substring("text", 1, 200),
        F.lit('  \n</div>\n<p>Fig. 1</p>\n'
              '<p>Share on <a href="#">social</a></p>\n'
              '<p>ok then</p>\n'
              '== FOOTER ==\n</body></html>'),
    )
    content = main_content(wrapped)
    no_tags = strip_tags(content)
    lines = F.filter(
        F.transform(F.split(no_tags, "\n"), lambda l: F.trim(l)),
        lambda l: (F.length(l) > 0) & (~l.rlike(r"^==.*==$")),
    )
    blocks = classify_blocks(wrapped)
    good = F.filter(blocks, lambda b: b["is_good"])
    link_chars = F.aggregate(blocks, F.lit(0),
                             lambda acc, b: acc + b["link_chars"])
    good_len = F.aggregate(good, F.lit(0),
                           lambda acc, b: acc + b["n_chars"])
    ctx = contextual_block_table(
        docs.select("doc_id", wrapped.alias("_w")), text_col="_w")
    cb = F.col("ctx_blocks")
    n_short = F.size(F.filter(cb, lambda b: b["cls"] == "short"))
    n_recovered = F.size(F.filter(
        cb, lambda b: (b["cls"] == "short") & b["ctx_good"]))
    ctx_cols = ctx.select(
        "doc_id",
        n_short.alias("n_short"),
        n_recovered.alias("n_recovered"),
        F.md5(contextual_main_expr(cb)).alias("ctx_main_md5"))
    base = docs.select(
        "doc_id",
        F.size(lines).alias("n_lines"),
        F.length(F.array_join(lines, "\n")).cast("long").alias("clean_len"),
        F.element_at(lines, 1).alias("first_line"),
        F.size(blocks).alias("n_blocks"),
        F.size(good).alias("n_good_blocks"),
        link_chars.cast("long").alias("link_chars"),
        good_len.cast("long").alias("good_len"),
    )
    return base.join(ctx_cols, "doc_id").orderBy("doc_id")


SQL_BOILERPLATE_STRIP = r"""
WITH wrapped AS (
  SELECT doc_id,
    '<html><head><title>viewer</title></head><body>' || chr(10) ||
    '<nav><a href="/">Home</a> <a href="/d">Docs</a> <a href="/s">Search</a></nav>' || chr(10) ||
    '== HEADER doc ' || doc_id || ' ==' || chr(10) ||
    '<div class="content">' || chr(10) || '   ' ||
    substr(text, 1, 200) || '  ' || chr(10) ||
    '</div>' || chr(10) || '<p>Fig. 1</p>' || chr(10) ||
    '<p>Share on <a href="#">social</a></p>' || chr(10) ||
    '<p>ok then</p>' || chr(10) ||
    '== FOOTER ==' || chr(10) || '</body></html>' AS w
  FROM documents
), blocks AS (
  SELECT doc_id,
    list_filter(list_transform(
      regexp_split_to_array(w,
        '(?i)</?(?:div|p|table|ul|ol|li|h[1-6]|section|article|header|footer|nav|aside|blockquote|tr|td|th)[^>]*>|(?i)<br ?/?>'),
      b -> trim(b)), b -> length(b) > 0) AS bs
  FROM wrapped
), feats AS (
  SELECT doc_id,
    list_transform(bs, b -> struct_pack(
      txt := trim(regexp_replace(b, '<[^>]*>', '', 'g')),
      n_chars := length(trim(regexp_replace(b, '<[^>]*>', '', 'g'))),
      n_words := CASE WHEN length(trim(regexp_replace(b, '<[^>]*>', '', 'g'))) > 0
                      THEN len(regexp_split_to_array(trim(regexp_replace(b, '<[^>]*>', '', 'g')), '\s+'))
                      ELSE 0 END,
      link_chars := coalesce(list_sum(list_transform(
        regexp_extract_all(b, '(?is)<a[^>]*>(.*?)</a>', 1),
        s -> length(trim(s)))), 0)
    )) AS fs
  FROM blocks
), classified AS (
  SELECT doc_id, fs,
    list_filter(fs, f -> f.n_words >= 5 AND
      (CASE WHEN f.n_chars > 0
            THEN CAST(f.link_chars AS DOUBLE) / f.n_chars
            ELSE 1.0 END) <= 0.3) AS good
  FROM feats
), clslist AS (
  -- context-free class per block, then the jusText context rule:
  -- a short block is finally good iff its nearest non-short
  -- neighbor on either side is good (NULL-safe like eqNullSafe)
  SELECT doc_id, fs,
    list_transform(fs, f -> CASE
      WHEN (CASE WHEN f.n_chars > 0
                 THEN CAST(f.link_chars AS DOUBLE) / f.n_chars
                 ELSE 1.0 END) > 0.3 THEN 'bad'
      WHEN f.n_words >= 5 THEN 'good'
      ELSE 'short' END) AS cl
  FROM feats
), ctx AS (
  SELECT doc_id, fs, cl,
    [CASE WHEN cl[i] = 'good' THEN true
          WHEN cl[i] = 'bad' THEN false
          ELSE coalesce(
            list_filter(list_slice(cl, 1, i - 1),
                        c -> c != 'short')[-1] = 'good', false)
            OR coalesce(
            list_filter(list_slice(cl, i + 1, len(cl)),
                        c -> c != 'short')[1] = 'good', false)
     END for i in generate_series(1, len(cl))] AS ctxg
  FROM clslist
), ctxstats AS (
  SELECT doc_id,
    CAST(len(list_filter(cl, c -> c = 'short')) AS INT) AS n_short,
    CAST(len([i for i in generate_series(1, len(cl))
              if cl[i] = 'short' AND ctxg[i]]) AS INT) AS n_recovered,
    md5(array_to_string(
      [fs[i].txt for i in generate_series(1, len(cl)) if ctxg[i]],
      chr(10))) AS ctx_main_md5
  FROM ctx
), blockstats AS (
  SELECT doc_id,
    CAST(len(fs) AS INT) AS n_blocks,
    CAST(len(good) AS INT) AS n_good_blocks,
    CAST(coalesce(list_sum(list_transform(fs, f -> f.link_chars)), 0) AS BIGINT) AS link_chars,
    CAST(coalesce(list_sum(list_transform(good, f -> f.n_chars)), 0) AS BIGINT) AS good_len
  FROM classified
), content AS (
  SELECT doc_id,
    CASE WHEN regexp_extract(w, '(?is)<div class="content">(.*?)</div>', 1) <> ''
         THEN regexp_extract(w, '(?is)<div class="content">(.*?)</div>', 1)
         ELSE w END AS c
  FROM wrapped
), stripped AS (
  SELECT doc_id,
    regexp_replace(
      regexp_replace(c, '(?is)<(head|script|style)[^>]*>.*?</(head|script|style)>', '', 'g'),
      '<[^>]*>', '', 'g') AS s
  FROM content
), lined AS (
  SELECT doc_id,
    list_filter(list_transform(string_split(s, chr(10)), l -> trim(l)),
                l -> length(l) > 0 AND NOT regexp_matches(l, '^==.*==$')) AS lines
  FROM stripped
)
SELECT l.doc_id, CAST(len(l.lines) AS INT) AS n_lines,
  CAST(length(array_to_string(l.lines, chr(10))) AS BIGINT) AS clean_len,
  l.lines[1] AS first_line,
  b.n_blocks, b.n_good_blocks, b.link_chars, b.good_len,
  c.n_short, c.n_recovered, c.ctx_main_md5
FROM lined l
JOIN blockstats b ON l.doc_id = b.doc_id
JOIN ctxstats c ON l.doc_id = c.doc_id
ORDER BY l.doc_id
"""


SQL_QUERIES_PARSE = {
    "annotation_parse": (q_annotation_parse, SQL_ANNOTATION_PARSE),
    "boilerplate_strip": (q_boilerplate_strip, SQL_BOILERPLATE_STRIP),
}
