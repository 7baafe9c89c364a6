"""DetEval matcher micro-fixtures (FIXTURES.md §4): one-to-one,
one-to-many, many-to-one and don't-care cases with hand-computed
expectations from the harness semantics (script.py:245-345)."""

import numpy as np
import pytest

from icdar_2019_rrc_sroie_spark.eval.deteval import (
    deteval_corpus,
    deteval_doc,
    deteval_per_doc,
)


def _doc(gts, dontcare, dets):
    return deteval_doc(np.array(gts, float), np.array(dontcare, bool),
                       np.array(dets, float))


def test_one_to_one():
    res = _doc([(0, 0, 99, 19)], [False], [(0, 0, 99, 19)])
    assert res["recall"] == 1.0 and res["precision"] == 1.0
    assert res["hmean"] == 1.0


def test_one_to_one_shifted_within_tolerance():
    res = _doc([(0, 0, 99, 19)], [False], [(2, 1, 101, 20)])
    assert res["recall"] == 1.0 and res["precision"] == 1.0


def test_one_to_many():
    res = _doc([(0, 0, 199, 19)], [False],
               [(0, 0, 99, 19), (100, 0, 199, 19)])
    assert res["recall_accum"] == pytest.approx(0.8)
    assert res["precision_accum"] == pytest.approx(1.6)
    assert res["recall"] == pytest.approx(0.8)
    assert res["precision"] == pytest.approx(0.8)


def test_many_to_one():
    res = _doc([(0, 0, 99, 19), (100, 0, 199, 19)], [False, False],
               [(0, 0, 199, 19)])
    assert res["recall_accum"] == pytest.approx(2.0)
    assert res["precision_accum"] == pytest.approx(1.0)
    assert res["recall"] == 1.0 and res["precision"] == 1.0


def test_dontcare_excluded():
    res = _doc([(0, 0, 99, 19)], [True], [(0, 0, 99, 19)])
    assert res["num_gt_care"] == 0 and res["num_det_care"] == 0
    assert res["recall"] == 1.0 and res["precision"] == 0.0


def test_miss_and_false_positive():
    res = _doc([(0, 0, 99, 19)], [False], [(500, 500, 599, 519)])
    assert res["recall_accum"] == 0.0
    assert res["recall"] == 0.0 and res["precision"] == 0.0


def test_corpus_rollup(spark):
    gt_rows = [
        ("oo", 0, 0.0, 0.0, 99.0, 19.0, False),
        ("om", 0, 0.0, 0.0, 199.0, 19.0, False),
        ("mo", 0, 0.0, 0.0, 99.0, 19.0, False),
        ("mo", 1, 100.0, 0.0, 199.0, 19.0, False),
    ]
    det_rows = [
        ("oo", 0, 0.0, 0.0, 99.0, 19.0),
        ("om", 0, 0.0, 0.0, 99.0, 19.0),
        ("om", 1, 100.0, 0.0, 199.0, 19.0),
        ("mo", 0, 0.0, 0.0, 199.0, 19.0),
    ]
    gt = spark.createDataFrame(
        gt_rows, "doc_id string, gt_id int, xmin double, ymin double,"
        " xmax double, ymax double, dontcare boolean")
    det = spark.createDataFrame(
        det_rows, "doc_id string, det_id int, xmin double, ymin double,"
        " xmax double, ymax double")
    per_doc = deteval_per_doc(gt, det)
    rows = {r["doc_id"]: r for r in per_doc.collect()}
    assert rows["oo"]["hmean"] == 1.0
    assert rows["om"]["recall"] == pytest.approx(0.8)
    assert rows["mo"]["precision"] == 1.0

    corpus = deteval_corpus(per_doc).collect()[0]
    # recall = (1 + 0.8 + 2) / 4 gt; precision = (1 + 1.6 + 1) / 4 det
    assert corpus["recall"] == pytest.approx(3.8 / 4)
    assert corpus["precision"] == pytest.approx(3.6 / 4)
    r, p = 3.8 / 4, 3.6 / 4
    assert corpus["hmean"] == pytest.approx(2 * r * p / (r + p))
