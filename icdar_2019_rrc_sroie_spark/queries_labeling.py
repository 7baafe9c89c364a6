"""Queries for the J6/X7/U4 entity→line labeler (operators/labeling.py).

``entity_line_labels`` runs the REAL cogrouped kernel over receipt lines
synthesized deterministically from the ``documents`` table with
expressions that DuckDB reproduces verbatim; the input is constructed
conflict-free (each entity text contains a doc-unique prefix, so it can
match exactly one line), which makes the reference's greedy sequential
assignment equal to the windowed-join formulation the SQL oracle uses.
The adversarial cases the join formulation cannot express — claim-order
conflicts, fuzzy OCR noise, multi-line word groups — are pinned by
pytest parity against a direct port of the reference labeler
(tests/test_labeling.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.labeling import label_lines


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _amt(cents):
    """Integer-built '<units>.<cc>' string — avoids any float-format
    divergence between Spark and DuckDB."""
    return F.concat(
        (cents / 100).cast("long").cast("string"),
        F.lit("."),
        F.lpad((cents % 100).cast("string"), 2, "0"),
    )


def _receipt_parts(docs: DataFrame) -> DataFrame:
    alpha = F.upper(F.substring("text", 1, 60))
    did = F.col("doc_id").cast("string")
    cents = F.col("doc_id") % 9000 + 100
    return docs.select(
        did.alias("doc_id"),
        F.trim(F.concat(F.lit("C"), did, F.lit(" "),
                        F.trim(F.substring(alpha, 1, 16)))).alias("company"),
        F.trim(F.concat(F.lit("A"), did, F.lit(" "),
                        F.trim(F.substring(alpha, 17, 16)))).alias("address"),
        F.concat(
            F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0"),
            F.lit("/"),
            F.lpad((F.col("doc_id") % 12 + 1).cast("string"), 2, "0"),
            F.lit("/2018"),
        ).alias("date_s"),
        _amt(cents).alias("amt"),
        _amt(cents + 1000).alias("amt2"),
    )


def _lines_entities(parts: DataFrame,
                    corrupt_company: bool = False):
    company_line = (
        F.concat(F.substring("company", 1, 2),
                 F.expr("substring(company, 4, 100000)"))
        if corrupt_company else F.col("company")
    )
    lines = parts.select(
        "doc_id",
        F.posexplode(
            F.array(
                company_line,
                F.col("address"),
                F.concat(F.lit("DATE: "), "date_s"),
                F.concat(F.lit("1 X ITEM "), "amt"),
                F.concat(F.lit("TOTAL RM"), "amt"),
                F.concat(F.lit("CASH "), "amt2"),
                F.lit("THANK YOU"),
            )
        ).alias("line_idx", "text"),
    )
    entities = parts.select(
        "doc_id",
        F.explode(
            F.map_from_arrays(
                F.array(F.lit("company"), F.lit("date"),
                        F.lit("address"), F.lit("total")),
                F.array("company", "date_s", "address",
                        F.concat(F.lit("RM"), "amt")),
            )
        ).alias("entity", "entity_text"),
    )
    return lines, entities


def q_entity_line_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 exact-containment path through the real cogrouped kernel."""
    parts = _receipt_parts(_t(spark, sf_dir, "documents"))
    lines, entities = _lines_entities(parts)
    return label_lines(lines, entities).orderBy("doc_id", "line_idx")


def q_entity_line_labels_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 fuzzy path: the company line is OCR-corrupted (3rd character
    dropped) so exact containment fails and the kernel must recover the
    noisy variant via the growing-error fuzzy search before labeling."""
    parts = _receipt_parts(
        _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300))
    lines, entities = _lines_entities(parts, corrupt_company=True)
    return label_lines(lines, entities).orderBy("doc_id", "line_idx")


# Structural oracle: the input is conflict-free by construction, so the
# expected assignment is known without running fuzzy matching — line 0
# (the OCR-corrupted company) must still be labeled company by the
# {e<=n} recovery, the rest follow the exact path. DuckDB rebuilds the
# same lines (with the 3rd character of the company line dropped) and
# emits the expected labels positionally.
SQL_ENTITY_LINE_LABELS_FUZZY = """
WITH parts AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
    trim('C' || CAST(doc_id AS VARCHAR) || ' ' ||
         trim(substr(upper(substr(text,1,60)), 1, 16))) AS company,
    trim('A' || CAST(doc_id AS VARCHAR) || ' ' ||
         trim(substr(upper(substr(text,1,60)), 17, 16))) AS address,
    lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || '/' ||
      lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') || '/2018' AS date_s,
    CAST((doc_id % 9000 + 100) // 100 AS VARCHAR) || '.' ||
      lpad(CAST((doc_id % 9000 + 100) % 100 AS VARCHAR), 2, '0') AS amt,
    CAST((doc_id % 9000 + 1100) // 100 AS VARCHAR) || '.' ||
      lpad(CAST((doc_id % 9000 + 1100) % 100 AS VARCHAR), 2, '0') AS amt2
  FROM documents WHERE doc_id < 300
)
SELECT doc_id, line_idx, text, label, CAST(klass AS INT) AS "class"
FROM (
  SELECT doc_id, 0 AS line_idx,
    substr(company, 1, 2) || substr(company, 4) AS text,
    'company' AS label, 1 AS klass FROM parts
  UNION ALL SELECT doc_id, 1, address, 'address', 3 FROM parts
  UNION ALL SELECT doc_id, 2, 'DATE: ' || date_s, 'date', 2 FROM parts
  UNION ALL SELECT doc_id, 3, '1 X ITEM ' || amt, 'none', 0 FROM parts
  UNION ALL SELECT doc_id, 4, 'TOTAL RM' || amt, 'total', 4 FROM parts
  UNION ALL SELECT doc_id, 5, 'CASH ' || amt2, 'none', 0 FROM parts
  UNION ALL SELECT doc_id, 6, 'THANK YOU', 'none', 0 FROM parts
) ORDER BY doc_id, line_idx
"""


_KW = "TOTAL|AMOUNT|DUE|AMT|ROUND|RND|RM|GST"
_STOP = "CASH|QTY|TAX|INVOICE"

SQL_ENTITY_LINE_LABELS = f"""
WITH parts AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
    trim('C' || CAST(doc_id AS VARCHAR) || ' ' ||
         trim(substr(upper(substr(text,1,60)), 1, 16))) AS company,
    trim('A' || CAST(doc_id AS VARCHAR) || ' ' ||
         trim(substr(upper(substr(text,1,60)), 17, 16))) AS address,
    lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || '/' ||
      lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') || '/2018' AS date_s,
    CAST((doc_id % 9000 + 100) // 100 AS VARCHAR) || '.' ||
      lpad(CAST((doc_id % 9000 + 100) % 100 AS VARCHAR), 2, '0') AS amt,
    CAST((doc_id % 9000 + 1100) // 100 AS VARCHAR) || '.' ||
      lpad(CAST((doc_id % 9000 + 1100) % 100 AS VARCHAR), 2, '0') AS amt2
  FROM documents
), lines AS (
  SELECT doc_id, 0 AS line_idx, company AS text FROM parts UNION ALL
  SELECT doc_id, 1, address FROM parts UNION ALL
  SELECT doc_id, 2, 'DATE: ' || date_s FROM parts UNION ALL
  SELECT doc_id, 3, '1 X ITEM ' || amt FROM parts UNION ALL
  SELECT doc_id, 4, 'TOTAL RM' || amt FROM parts UNION ALL
  SELECT doc_id, 5, 'CASH ' || amt2 FROM parts UNION ALL
  SELECT doc_id, 6, 'THANK YOU' FROM parts
), ents AS (
  SELECT doc_id, 1 AS klass, 'company' AS entity, company AS etext FROM parts
  UNION ALL SELECT doc_id, 2, 'date', date_s FROM parts
  UNION ALL SELECT doc_id, 3, 'address', address FROM parts
  UNION ALL SELECT doc_id, 4, 'total', 'RM' || amt FROM parts
), cand AS (
  SELECT l.doc_id, l.line_idx, e.entity, e.klass,
    row_number() OVER (PARTITION BY l.doc_id, e.entity
                       ORDER BY l.line_idx) AS rn
  FROM lines l JOIN ents e ON l.doc_id = e.doc_id
  WHERE length(trim(e.etext)) > 0
    AND contains(trim(l.text), trim(e.etext))
), claimed AS (
  SELECT doc_id, line_idx, min(klass) AS klass
  FROM cand WHERE entity = 'total' OR rn = 1
  GROUP BY doc_id, line_idx
), labeled AS (
  SELECT l.doc_id, l.line_idx, l.text, COALESCE(c.klass, 0) AS klass
  FROM lines l LEFT JOIN claimed c
    ON l.doc_id = c.doc_id AND l.line_idx = c.line_idx
), ctx AS (
  SELECT doc_id, line_idx, text, klass,
    regexp_matches(trim(text), '{_KW}') AS kw,
    COALESCE(lag(regexp_matches(trim(text), '{_KW}'), 1)
      OVER (PARTITION BY doc_id ORDER BY line_idx), false) AS kw1,
    COALESCE(lag(regexp_matches(trim(text), '{_KW}'), 2)
      OVER (PARTITION BY doc_id ORDER BY line_idx), false) AS kw2,
    COALESCE(lag(regexp_matches(trim(text), '{_STOP}'), 1)
      OVER (PARTITION BY doc_id ORDER BY line_idx), false) AS stop1,
    COALESCE(lag(regexp_matches(trim(text), '{_STOP}'), 2)
      OVER (PARTITION BY doc_id ORDER BY line_idx), false) AS stop2
  FROM labeled
), final AS (
  -- lookback survives iff: not stopped at j=i-1, and (keyword at i-1,
  -- or not stopped at i-2 and keyword at i-2) — generate_data.py:135-152
  SELECT doc_id, line_idx, text,
    CASE WHEN klass = 4 AND NOT kw
              AND NOT (NOT stop1 AND (kw1 OR (NOT stop2 AND kw2)))
         THEN 0 ELSE klass END AS klass
  FROM ctx
)
SELECT doc_id, CAST(line_idx AS INT) AS line_idx, text,
  CASE klass WHEN 1 THEN 'company' WHEN 2 THEN 'date'
             WHEN 3 THEN 'address' WHEN 4 THEN 'total'
             ELSE 'none' END AS label,
  CAST(klass AS INT) AS "class"
FROM final ORDER BY doc_id, line_idx
"""


def q_training_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 training-CSV rows: fixture transcripts → boilerplate strip →
    line explode → REAL labeler against the ground-truth entity table
    (the reference's generate_csv_for_training path, generate_data.py:
    156-205, with (conv_id, turn_idx) standing in for the filename)."""
    from .fixtures import gt_entities_df, transcripts_df
    from .plans.extraction import receipt_prefilter, turn_lines

    transcripts = transcripts_df(spark, n_convs=40, seed=42)
    gt = gt_entities_df(spark, n_convs=40, seed=42)

    doc = F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string"))
    lines = turn_lines(receipt_prefilter(transcripts)).select(
        doc.alias("doc_id"), "line_idx", "text")
    entities = gt.select(
        doc.alias("doc_id"),
        F.explode(
            F.map_from_arrays(
                F.array(F.lit("company"), F.lit("date"),
                        F.lit("address"), F.lit("total")),
                F.array("company", "date", "address", "total"),
            )
        ).alias("entity", "entity_text"),
    )
    out = label_lines(lines, entities)
    return out.select(
        F.col("doc_id").alias("filename"), "text", "label", "class"
    ).orderBy("filename", "text")


SQL_QUERIES_LABELING = {
    "entity_line_labels": (q_entity_line_labels, SQL_ENTITY_LINE_LABELS),
}

SQL_QUERIES_LABELING["entity_line_labels_fuzzy"] = (
    q_entity_line_labels_fuzzy, SQL_ENTITY_LINE_LABELS_FUZZY)

ROWS_ONLY_LABELING = {
    "training_labels": (q_training_labels, None),
}
