"""Reading order (W1), clockwise point ordering (X12), annotation
parsing (S3/S4) vs independent oracles."""

import numpy as np
from pyspark.sql import functions as F

from icdar_2019_rrc_sroie_spark.operators.geometry import (
    order_clockwise,
    parse_annotation_line,
)
from icdar_2019_rrc_sroie_spark.operators.ordering import (
    reading_order,
    reading_order_exact,
    restore_turn_order,
)


def _boxes_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, box_id int, x long, y long")


def test_reading_order_bucketed_vs_exact_on_separated_rows(spark):
    # rows separated by more than the tolerance -> both paths agree
    rows = [
        ("d", 0, 50, 100), ("d", 1, 10, 103), ("d", 2, 200, 95),
        ("d", 3, 30, 160), ("d", 4, 5, 158),
    ]
    df = _boxes_df(spark, rows)
    exact = {r["box_id"]: r["reading_pos"]
             for r in reading_order_exact(df).collect()}
    # exact comparator: row1 = {1:(10),0:(50),2:(200)}, row2 = {4,3}
    assert [k for k, _ in sorted(exact.items(), key=lambda kv: kv[1])] == \
        [1, 0, 2, 4, 3]


def test_reading_order_bucketed(spark):
    from icdar_2019_rrc_sroie_spark.operators.ordering import (
        reading_order_bucketed,
    )

    rows = [("d", 0, 50, 10), ("d", 1, 10, 12), ("d", 2, 30, 40)]
    got = {r["box_id"]: r["reading_pos"]
           for r in reading_order_bucketed(_boxes_df(spark, rows)).collect()}
    assert got == {1: 1, 0: 2, 2: 3}


def _ref_order(rows, tolerance=14):
    """Literal port of the reference sort: Python sorted with the
    pairwise comparator misc.py:115-132 over annotation-order boxes."""
    from functools import cmp_to_key

    def precedence(a, b):
        # (box_id, x, y); comparator uses x/y only
        if abs(a[2] - b[2]) <= tolerance:
            return a[1] - b[1]
        return a[2] - b[2]

    ordered = sorted(rows, key=cmp_to_key(precedence))
    return [b[0] for b in ordered]


def test_reading_order_exact_matches_reference_port_on_boundaries(spark):
    """Randomized parity incl. |Δy| == 14 boundary rows, where the
    bucketed approximation is allowed to diverge but the exact kernel
    must reproduce the reference's non-transitive sort exactly."""
    import random

    rng = random.Random(7)
    ys = [0, 7, 13, 14, 15, 27, 28, 29, 42, 56]  # dense around k*14 edges
    all_rows = []
    for d in range(25):
        n = rng.randint(2, 12)
        rows = [(i, rng.randrange(0, 300), rng.choice(ys))
                for i in range(n)]
        all_rows.extend((f"doc{d:02d}", i, x, y) for i, x, y in rows)
    df = _boxes_df(spark, all_rows)
    got = {}
    for r in reading_order(df).collect():  # exact by default
        got.setdefault(r["doc_id"], {})[r["box_id"]] = r["reading_pos"]
    diverged = 0
    for d in sorted(got):
        rows = [(b, x, y) for (doc, b, x, y) in all_rows if doc == d]
        want = _ref_order(rows)
        have = [b for b, _ in sorted(got[d].items(), key=lambda kv: kv[1])]
        assert have == want, d
        bucketed = sorted(rows, key=lambda r: (r[2] // 14, r[1], r[0]))
        if [b for b, _, _ in bucketed] != want:
            diverged += 1
    # the dataset must actually exercise the divergence zone
    assert diverged > 0


def test_restore_turn_order(spark):
    df = spark.createDataFrame(
        [("c", 5), ("c", 1), ("c", 3)], "conv_id string, turn_idx int")
    got = [r["turn_idx"] for r in
           restore_turn_order(df).orderBy("turn_pos").collect()]
    assert got == [1, 3, 5]


def order_clockwise_oracle(pts):
    pts = np.array(pts, dtype=float)
    by_x = pts[np.argsort(pts[:, 0], kind="stable")]
    left = by_x[:2][np.argsort(by_x[:2, 1], kind="stable")]
    right = by_x[2:][np.argsort(by_x[2:, 1], kind="stable")]
    return [tuple(left[0]), tuple(right[0]), tuple(right[1]), tuple(left[1])]


def test_order_clockwise(spark):
    quads = [
        [(60.4, 10.6), (30.2, 25.1), (30.2, 10.6), (60.4, 25.1)],
        [(0.0, 0.0), (10.0, 0.0), (10.0, 5.0), (0.0, 5.0)],
        [(5.0, 9.0), (1.0, 2.0), (7.0, 1.0), (2.0, 8.0)],
    ]
    for quad in quads:
        df = spark.createDataFrame([(quad,)], "pts array<struct<x:double,y:double>>")
        got = df.select(order_clockwise(F.col("pts")).alias("o")).collect()[0]["o"]
        got_tuples = [(p["x"], p["y"]) for p in got]
        assert got_tuples == order_clockwise_oracle(quad)


def test_parse_annotation_line(spark):
    line = "12,84,140,84,140,212,12,212,GOLDEN KEY, MAKER"
    df = spark.createDataFrame([(line,)], "line string")
    got = df.select(parse_annotation_line(F.col("line")).alias("p")) \
        .collect()[0]["p"]
    assert got["coords"] == [12.0, 84.0, 140.0, 84.0, 140.0, 212.0, 12.0, 212.0]
    assert got["transcript"] == "GOLDEN KEY, MAKER"

    # blank transcript / short line
    df2 = spark.createDataFrame([("1,2,3,4,5,6,7,8",)], "line string")
    got2 = df2.select(parse_annotation_line(F.col("line")).alias("p")) \
        .collect()[0]["p"]
    assert got2["transcript"] == ""
