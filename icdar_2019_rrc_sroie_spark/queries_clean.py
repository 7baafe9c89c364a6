"""Query battery, batch 6: X4/X5 cleanup expressions and the S11 JSON
sink, all DuckDB-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.entities import clean_address_expr, clean_company_expr

_COMPANY_CASES = [
    "GOLDEN KEY MAKER",
    "99 SPEED MART S/B",
    "MR. D.I.Y. (M) SDN BHD",
    "SYARIKAT ABC (A123456-X) BRANCH 7",
    "SANYU TRADING (MALAYSIA",
    "TAX SERVICES CENTER",
    "  PADDED NAME CO  ",
    "12 STORE FRONT9X",
]

_ADDRESS_CASES = [
    "NO 5, JALAN X, 81750 MASAI TEL 03-1234567",
    "LOT 1, TAMAN Y 012-345678-",
    "PLAIN ADDRESS LINE",
    "STREET 9 TEL",
    "ROAD 55 99-",
    "JALAN 3-",
]


def _without_order(sql: str, clause: str = "ORDER BY doc_id") -> str:
    """Strip the single trailing ORDER BY when embedding a standalone
    oracle as a CTE — fails loudly if the clause count ever changes
    (silent replace-all surgery on SQL text invites drift)."""
    assert sql.count(clause) == 1, f"expected exactly one {clause!r}"
    return sql.replace(clause, "")


def _cases_sql(cases: list[str]) -> str:
    quoted = ", ".join("'" + c.replace("'", "''") + "'" for c in cases)
    return f"[{quoted}]"


def q_company_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    arr = F.array(*[F.lit(c) for c in _COMPANY_CASES])
    line = F.element_at(arr, (F.col("doc_id") % len(_COMPANY_CASES) + 1).cast("int"))
    return docs.select(
        "doc_id", line.alias("line"),
        clean_company_expr(line).alias("cleaned"),
    ).orderBy("doc_id")


SQL_COMPANY_CLEAN = rf"""
WITH src AS (
  SELECT doc_id,
    ({_cases_sql(_COMPANY_CASES)})[CAST(doc_id % {len(_COMPANY_CASES)} + 1 AS INT)] AS line
  FROM documents
), prep AS (
  SELECT doc_id, line, trim(line) AS t,
    regexp_extract(trim(line), '^(\d+[^0-9]*[A-Z]+)$', 0) AS m1,
    regexp_extract(trim(line), '\([A-Z]*\d+[^0-9]*[A-Z]+\).*$', 0) AS m2,
    regexp_extract(trim(line), '\([A-Z\s]+[\)]*$', 0) AS m3
  FROM src
)
SELECT doc_id, line,
  CASE WHEN regexp_matches(t, 'TAX|RECEIPT|INVOICE') THEN ''
       WHEN m1 <> '' THEN trim(substr(t, 1, strpos(t, trim(m1)) - 1))
       WHEN m2 <> '' THEN trim(substr(t, 1, strpos(t, trim(m2)) - 1))
       WHEN m3 <> '' THEN trim(substr(t, 1, strpos(t, trim(m3)) - 1))
       ELSE t END AS cleaned
FROM prep ORDER BY doc_id
"""


def q_address_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    arr = F.array(*[F.lit(c) for c in _ADDRESS_CASES])
    line = F.element_at(arr, (F.col("doc_id") % len(_ADDRESS_CASES) + 1).cast("int"))
    return docs.select(
        "doc_id", line.alias("line"),
        clean_address_expr(line).alias("cleaned"),
    ).orderBy("doc_id")


SQL_ADDRESS_CLEAN = rf"""
WITH src AS (
  SELECT doc_id,
    ({_cases_sql(_ADDRESS_CASES)})[CAST(doc_id % {len(_ADDRESS_CASES)} + 1 AS INT)] AS line
  FROM documents
), cut AS (
  SELECT doc_id, line,
    CASE WHEN strpos(line, 'TEL') > 0
         THEN substr(line, 1, strpos(line, 'TEL') - 1) ELSE line END AS c
  FROM src
)
SELECT doc_id, line,
  trim(regexp_replace(trim(c), '(\d+\-[^a-zA-Z]*)$', '')) AS cleaned
FROM cut ORDER BY doc_id
"""


def q_entity_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3/X4 + X5 merged into one driver row (round 3, to free a
    window slot): per doc the synthesized company line + clean_company
    AND the synthesized address line + clean_address. Operators
    unchanged."""
    comp = q_company_clean(spark, sf_dir).select(
        "doc_id", F.col("line").alias("company_line"),
        F.col("cleaned").alias("company_cleaned"))
    addr = q_address_clean(spark, sf_dir).select(
        "doc_id", F.col("line").alias("address_line"),
        F.col("cleaned").alias("address_cleaned"))
    return comp.join(addr, "doc_id").orderBy("doc_id")


SQL_ENTITY_CLEAN = f"""
WITH comp AS ({_without_order(SQL_COMPANY_CLEAN)}),
addr AS ({_without_order(SQL_ADDRESS_CLEAN)})
SELECT comp.doc_id,
  comp.line AS company_line, comp.cleaned AS company_cleaned,
  addr.line AS address_line, addr.cleaned AS address_cleaned
FROM comp JOIN addr ON comp.doc_id = addr.doc_id
ORDER BY comp.doc_id
"""


def q_entity_sink_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11: per-doc entity JSON payload (fixed key order), engine-
    portable serialization checked value-for-value."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    day = F.col("doc_id") % 28 + 1
    company = F.concat(F.lit("STORE "), (F.col("doc_id") % 40).cast("string"))
    date = F.concat(F.lpad(day.cast("string"), 2, "0"), F.lit("/03/2018"))
    total = F.concat(F.lit("RM"), (F.col("doc_id") % 90 + 1).cast("string"),
                     F.lit(".50"))
    payload = F.to_json(
        F.create_map(
            F.lit("company"), company,
            F.lit("date"), date,
            F.lit("total"), total,
        )
    )
    return docs.select("doc_id", payload.alias("submission")).orderBy("doc_id")


SQL_ENTITY_SINK_JSON = """
SELECT doc_id,
  CAST(to_json(map_from_entries([
    {'k': 'company', 'v': 'STORE ' || (doc_id % 40)},
    {'k': 'date', 'v': lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || '/03/2018'},
    {'k': 'total', 'v': 'RM' || (doc_id % 90 + 1) || '.50'}
  ])) AS VARCHAR) AS submission
FROM documents ORDER BY doc_id
"""


def q_entity_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11 + S5 merged (round 3, one driver row): serialize the per-doc
    entity JSON payload, then parse it back into typed fields
    (misc.py:82-112 read_json_file analog) — the full sink/source
    round-trip checked value-for-value."""
    payloads = q_entity_sink_json(spark, sf_dir)
    parsed = F.from_json(F.col("submission"), "map<string,string>")
    return payloads.select(
        "doc_id",
        "submission",
        F.element_at(parsed, "company").alias("company"),
        F.element_at(parsed, "date").alias("date"),
        F.element_at(parsed, "total").alias("total"),
    ).orderBy("doc_id")


SQL_ENTITY_JSON_ROUNDTRIP = f"""
WITH payloads AS ({_without_order(SQL_ENTITY_SINK_JSON)})
SELECT doc_id,
  submission,
  submission->>'company' AS company,
  submission->>'date' AS date,
  submission->>'total' AS total
FROM payloads ORDER BY doc_id
"""


def q_page_header_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-line page-chrome removal (PDF/layout parse, north
    rule): synthesize a 3-page doc per row with a running header +
    footer and per-page content slices, strip lines repeating on ≥60%
    of pages, emit chrome/content stats. Per-doc array algebra — no
    shuffle (operators/boilerplate.py:strip_repeated_page_lines)."""
    from .operators.boilerplate import (
        repeated_page_lines,
        strip_repeated_page_lines,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    header = F.concat(F.lit("DOC "), F.col("doc_id").cast("string"),
                      F.lit(" INTERNAL"))
    pages = [
        F.concat(header, F.lit("\n"),
                 F.substring("text", 1 + i * 40, 40),
                 F.lit("\nCONFIDENTIAL DRAFT"))
        for i in range(3)
    ]
    paged = F.concat_ws("\f", *pages)
    chrome = repeated_page_lines(paged)
    stripped = strip_repeated_page_lines(paged)
    return docs.select(
        "doc_id",
        F.size(chrome).alias("n_chrome"),
        F.length(stripped).cast("long").alias("stripped_len"),
        F.length(paged).cast("long").alias("paged_len"),
        F.element_at(F.split(stripped, "\n"), 1).alias("first_content"),
    ).orderBy("doc_id")


SQL_PAGE_HEADER_STRIP = r"""
WITH paged AS (
  SELECT doc_id,
    ['DOC ' || doc_id || ' INTERNAL' || chr(10) || substr(text, 1 + p*40, 40)
       || chr(10) || 'CONFIDENTIAL DRAFT'
     FOR p IN [0, 1, 2]] AS pages
  FROM documents
), pl AS (
  SELECT doc_id,
    array_to_string(pages, chr(12)) AS paged,
    [list_filter([trim(l) FOR l IN string_split(p, chr(10))],
                 l -> length(l) > 0) FOR p IN pages] AS pls
  FROM paged
), chrome AS (
  SELECT doc_id, paged, pls,
    list_filter(list_distinct(flatten(pls)),
      line -> len(list_filter(pls, ps -> list_contains(ps, line)))
              >= greatest(2, CAST(ceil(len(pls) * 0.6) AS INT))) AS ch
  FROM pl
), kept AS (
  SELECT doc_id, paged, ch,
    -- coalesce: DuckDB's array_to_string([]) is NULL (Spark: ''), and
    -- the outer join would silently skip it, dropping the page break
    array_to_string(
      [coalesce(array_to_string(
         list_filter(ps, l -> NOT list_contains(ch, l)), chr(10)), '')
       FOR ps IN pls],
      chr(12)) AS stripped
  FROM chrome
)
SELECT doc_id,
  CAST(len(ch) AS INT) AS n_chrome,
  CAST(length(stripped) AS BIGINT) AS stripped_len,
  CAST(length(paged) AS BIGINT) AS paged_len,
  string_split(stripped, chr(10))[1] AS first_content
FROM kept ORDER BY doc_id
"""


def q_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 set operations + A11 anti-join merged into one driver row
    (round 3, to free window slots): intersect/except/union counts over
    key sets AND the orders-without-lineitems anti-join ids, unioned as
    (op, k) rows. Both operators unchanged."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    big = orders.filter(F.col("o_totalprice") > 150000) \
        .select("o_custkey").distinct()
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT") \
        .select("o_custkey").distinct()

    def tagged_count(df, tag):
        return df.agg(F.count(F.lit(1)).cast("long").alias("k")) \
            .select(F.lit(tag).alias("op"), "k")

    counts = (
        tagged_count(big.intersect(urgent), "n_intersect")
        .unionAll(tagged_count(big.subtract(urgent), "n_except"))
        .unionAll(tagged_count(big.union(urgent).distinct(), "n_union"))
    )
    anti = orders.join(
        li, orders.o_orderkey == li.l_orderkey, "left_anti"
    ).select(F.lit("anti_orderkey").alias("op"),
             F.col("o_orderkey").cast("long").alias("k"))
    return counts.unionAll(anti).orderBy("op", "k")


SQL_SET_ALGEBRA = """
WITH big AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 150000),
urgent AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
SELECT 'n_intersect' AS op,
  CAST((SELECT COUNT(*) FROM (SELECT * FROM big INTERSECT SELECT * FROM urgent)) AS BIGINT) AS k
UNION ALL
SELECT 'n_except',
  CAST((SELECT COUNT(*) FROM (SELECT * FROM big EXCEPT SELECT * FROM urgent)) AS BIGINT)
UNION ALL
SELECT 'n_union',
  CAST((SELECT COUNT(*) FROM (SELECT * FROM big UNION SELECT * FROM urgent)) AS BIGINT)
UNION ALL
SELECT 'anti_orderkey', CAST(o_orderkey AS BIGINT) FROM orders
WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
ORDER BY op, k
"""


SQL_QUERIES_CLEAN = {
    "entity_clean": (q_entity_clean, SQL_ENTITY_CLEAN),
    "entity_json_roundtrip": (q_entity_json_roundtrip,
                              SQL_ENTITY_JSON_ROUNDTRIP),
    "page_header_strip": (q_page_header_strip, SQL_PAGE_HEADER_STRIP),
    "set_algebra": (q_set_algebra, SQL_SET_ALGEBRA),
}
