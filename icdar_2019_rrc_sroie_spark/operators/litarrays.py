"""Single-call literal-array construction (round 7).

``F.array(*[F.lit(v) for v in vals])`` crosses the py4j bridge once per
element — a 1024-weight vector costs ~0.3-0.4 s of DRIVER time every
time the expression is built, and the k×dim centroid matrix twice that
(measured: building ``q_semdedup``'s DataFrame alone took ~1.3 s warm,
almost all py4j literal churn; guide §1.2 "per-task work" applies to
the driver too). These helpers render the whole array as ONE SQL
expression string parsed JVM-side.

Bit-exactness: ``repr(float)`` is the shortest decimal that round-trips
to the same IEEE-754 double, and the SQL parser's ``...D`` literal goes
through ``Double.parseDouble`` — the identical value, so plans built
this way are expression-equal to the per-element form (pinned by the
oracle battery: every consumer's query is value-hashed against DuckDB).
Only finite values are legal (a NaN/Infinity would not round-trip
through the SQL literal syntax); callers here never produce them.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(v: float) -> str:
    v = float(v)
    if not math.isfinite(v):
        raise ValueError(f"non-finite literal {v!r}")
    return f"{v!r}D"


def lit_double_array(vals) -> Column:
    """``array<double>`` literal in one py4j call."""
    return F.expr("array(" + ",".join(_d(v) for v in vals) + ")")


def lit_double_matrix(rows) -> Column:
    """``array<array<double>>`` literal in one py4j call."""
    return F.expr("array(" + ",".join(
        "array(" + ",".join(_d(v) for v in row) + ")" for row in rows) + ")")


def lit_long_array(vals) -> Column:
    """``array<bigint>`` literal in one py4j call."""
    return F.expr("array(" + ",".join(
        f"{int(v)}L" for v in vals) + ")")
