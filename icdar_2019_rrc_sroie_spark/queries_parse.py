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
    both link-dense), then run BOTH extraction stages: the DOM
    main-content + tag-strip + line-filter path, and the round-3
    JusText-style block classifier (link-density / word-count over
    block-level splits — operators/boilerplate.py:classify_blocks)."""
    from .operators.boilerplate import classify_blocks

    docs = _t(spark, sf_dir, "documents")
    wrapped = F.concat(
        F.lit('<html><head><title>viewer</title></head><body>\n'
              '<nav><a href="/">Home</a> <a href="/d">Docs</a> '
              '<a href="/s">Search</a></nav>\n'
              '== HEADER doc '),
        F.col("doc_id"),
        F.lit(' ==\n<div class="content">\n   '),
        F.substring("text", 1, 200),
        F.lit('  \n</div>\n<p>Share on <a href="#">social</a></p>\n'
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
    return docs.select(
        "doc_id",
        F.size(lines).alias("n_lines"),
        F.length(F.array_join(lines, "\n")).cast("long").alias("clean_len"),
        F.element_at(lines, 1).alias("first_line"),
        F.size(blocks).alias("n_blocks"),
        F.size(good).alias("n_good_blocks"),
        link_chars.cast("long").alias("link_chars"),
        good_len.cast("long").alias("good_len"),
    ).orderBy("doc_id")


SQL_BOILERPLATE_STRIP = r"""
WITH wrapped AS (
  SELECT doc_id,
    '<html><head><title>viewer</title></head><body>' || chr(10) ||
    '<nav><a href="/">Home</a> <a href="/d">Docs</a> <a href="/s">Search</a></nav>' || chr(10) ||
    '== HEADER doc ' || doc_id || ' ==' || chr(10) ||
    '<div class="content">' || chr(10) || '   ' ||
    substr(text, 1, 200) || '  ' || chr(10) ||
    '</div>' || chr(10) || '<p>Share on <a href="#">social</a></p>' || chr(10) ||
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
  b.n_blocks, b.n_good_blocks, b.link_chars, b.good_len
FROM lined l JOIN blockstats b ON l.doc_id = b.doc_id
ORDER BY l.doc_id
"""


SQL_QUERIES_PARSE = {
    "annotation_parse": (q_annotation_parse, SQL_ANNOTATION_PARSE),
    "boilerplate_strip": (q_boilerplate_strip, SQL_BOILERPLATE_STRIP),
}
