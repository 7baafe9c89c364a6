"""Reading-order restoration (W1/W2).

The reference sorts OCR boxes with a pairwise comparator: boxes on the
same visual row (|Δy| ≤ 14) order by x, otherwise by y
(keyword_information_extraction/utils/misc.py:115-132). That comparator
is not transitive, so it has no exact relational equivalent; the engine
offers:

* ``reading_order`` — DEFAULT (since round 2): the EXACT reference
  comparator via the per-doc Arrow kernel (``reading_order_exact``).
  Documents are layout-bounded, so the kernel scales like the window;
  callers that want the pure-Catalyst approximation pass
  ``exact=False``.
* ``reading_order_bucketed`` — tolerance-bucketed ``(floor(y/14), x)``
  window ordering, pure Catalyst; identical except for boxes straddling
  a bucket edge within the tolerance.
* ``reading_order_exact`` — the per-doc ``applyInPandas`` kernel
  (stable ``sorted`` with ``cmp_to_key``), callable directly.

Turn-order restore (W2) is a plain window over ``turn_idx``.
"""

from __future__ import annotations

from functools import cmp_to_key

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..constants import READING_ORDER_TOLERANCE


def reading_order(boxes: DataFrame, doc_col: str = "doc_id",
                  tolerance: int = READING_ORDER_TOLERANCE,
                  exact: bool = True) -> DataFrame:
    """Reading order per document.

    Default is the EXACT reference comparator (per-doc Arrow kernel —
    documents are layout-bounded, so the kernel is as scalable as the
    window and parity-true on rows straddling the tolerance). Pass
    ``exact=False`` for the pure-Catalyst bucketed approximation when
    boundary-row order is immaterial."""
    if exact:
        return reading_order_exact(boxes, doc_col, tolerance)
    return reading_order_bucketed(boxes, doc_col, tolerance)


def reading_order_bucketed(boxes: DataFrame, doc_col: str = "doc_id",
                           tolerance: int = READING_ORDER_TOLERANCE
                           ) -> DataFrame:
    """Bucketed (floor(y/tol), x) window ordering — the relational
    approximation of the reference comparator; identical on layouts
    whose rows are separated by more than the tolerance, may differ for
    boxes with |Δy| ≤ tolerance across a bucket edge."""
    w = Window.partitionBy(doc_col).orderBy(
        F.floor(F.col("y") / tolerance), F.col("x"), F.col("box_id")
    )
    return boxes.withColumn("reading_pos", F.row_number().over(w))


def reading_order_exact(boxes: DataFrame,
                        doc_col: str = "doc_id",
                        tolerance: int = READING_ORDER_TOLERANCE) -> DataFrame:
    """Exact comparator semantics per document (misc.py:115-132)."""
    schema = T.StructType(
        boxes.schema.fields
        + [T.StructField("reading_pos", T.IntegerType())]
    )

    def cmp(a, b):
        if abs(a[1] - b[1]) <= tolerance:
            return a[0] - b[0]
        return a[1] - b[1]

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("box_id").reset_index(drop=True)
        # plain-list access: .iloc inside the comparator is ~50× slower
        xs = pdf["x"].tolist()
        ys = pdf["y"].tolist()
        order = sorted(
            range(len(xs)),
            key=cmp_to_key(lambda i, j: cmp((xs[i], ys[i]), (xs[j], ys[j]))),
        )
        pos = [0] * len(xs)
        for rank, idx in enumerate(order):
            pos[idx] = rank + 1
        pdf["reading_pos"] = pos
        return pdf

    # Explicit doc-keyed repartition at full core count: the kernel is
    # CPU-bound Python, and AQE's size-based coalescing would otherwise
    # shrink the (tiny-byte, expensive-row) shuffle to a few tasks.
    n = boxes.sparkSession.sparkContext.defaultParallelism
    return boxes.repartition(n, doc_col).groupBy(doc_col) \
        .applyInPandas(kernel, schema)


def restore_turn_order(df: DataFrame) -> DataFrame:
    """W2: stable per-conversation ordering over turn_idx."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return df.withColumn("turn_pos", F.row_number().over(w))
