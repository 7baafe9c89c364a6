"""A4/A5 multilabel confusion matrix vs a fresh NumPy oracle mirroring
the reference's bincount semantics (misc.py:171-230)."""

import numpy as np

from icdar_2019_rrc_sroie_spark.eval.confusion import (
    multilabel_confusion,
    per_class_prf,
)
from icdar_2019_rrc_sroie_spark.operators.multimodal import (
    filter_empty_regions,
)


def mcm_oracle(preds, targets, n_classes):
    preds, targets = np.array(preds), np.array(targets)
    mask = (targets >= 0) & (targets < n_classes)
    t, p = targets[mask], preds[mask]
    out = {}
    labels = np.unique(np.concatenate([p, t]))
    for c in labels:
        tp = int(np.sum((p == t) & (t == c)))
        fp = int(np.sum(p == c)) - tp
        fn = int(np.sum(t == c)) - tp
        tn = len(t) - tp - fp - fn
        out[int(c)] = (tn, fp, fn, tp)
    return out


def test_multilabel_confusion(spark):
    rng = np.random.RandomState(3)
    targets = rng.randint(-1, 5, 400)  # includes ignored -1 labels
    preds = np.where(rng.rand(400) < 0.7, targets, rng.randint(0, 5, 400))
    df = spark.createDataFrame(
        [(int(p), int(t)) for p, t in zip(preds, targets)],
        "pred int, target int")
    got = {r["cls"]: (r["tn"], r["fp"], r["fn"], r["tp"])
           for r in multilabel_confusion(df, 5).collect()}
    assert got == mcm_oracle(preds, targets, 5)

    prf = {r["cls"]: r for r in
           per_class_prf(multilabel_confusion(df, 5)).collect()}
    for c, (tn, fp, fn, tp) in mcm_oracle(preds, targets, 5).items():
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        assert abs(prf[c]["precision"] - prec) < 1e-12
        assert abs(prf[c]["recall"] - rec) < 1e-12


def test_filter_empty_regions(spark):
    rows = [("a", "image", 10, 100.0, [0.1]), ("b", "image", 10, 251.0, [0.9])]
    df = spark.createDataFrame(
        rows, "media_id string, kind string, decoded_bytes long,"
        " mean_intensity double, feature array<float>")
    kept = [r["media_id"] for r in filter_empty_regions(df).collect()]
    assert kept == ["a"]
