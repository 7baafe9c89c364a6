"""Extraction-F1 job on the golden fixtures (expect exact 1.0) and the
CTC greedy-decode contract."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from icdar_2019_rrc_sroie_spark.constants import VOCAB
from icdar_2019_rrc_sroie_spark.eval.extraction_f1 import extraction_scores
from icdar_2019_rrc_sroie_spark.fixtures import gt_entities_df, transcripts_df
from icdar_2019_rrc_sroie_spark.operators.recognize import ctc_greedy_decode
from icdar_2019_rrc_sroie_spark.plans.extraction import extract_spans


def test_extraction_f1_perfect_on_fixtures(spark):
    t = transcripts_df(spark, n_convs=25)
    gt = gt_entities_df(spark, n_convs=25)
    scores = {r["label"]: r
              for r in extraction_scores(extract_spans(t), gt).collect()}
    for label in ("company", "date", "address", "total", "__all__"):
        assert scores[label]["hmean"] == pytest.approx(1.0), scores[label]
    assert scores["__all__"]["tp"] == scores["__all__"]["expected"]


def test_extraction_f1_detects_errors(spark):
    t = transcripts_df(spark, n_convs=10)
    gt = gt_entities_df(spark, n_convs=10)
    spans = extract_spans(t)
    # corrupt every extracted date
    broken = spans.withColumn(
        "text",
        F.when(F.col("label") == "date", F.lit("01/01/1900"))
        .otherwise(F.col("text")),
    )
    scores = {r["label"]: r
              for r in extraction_scores(broken, gt).collect()}
    assert scores["date"]["hmean"] == 0.0
    assert scores["company"]["hmean"] == pytest.approx(1.0)
    assert 0.0 < scores["__all__"]["hmean"] < 1.0


def _logits_for(text: str, t_per_char: int = 2) -> list[list[float]]:
    """Time-major logits whose greedy path spells `text` with blanks
    between repeated chars."""
    frames = []
    blank = [1.0] + [0.0] * len(VOCAB)
    prev_idx = None
    for ch in text:
        idx = VOCAB.index(ch) + 1
        if prev_idx == idx:
            frames.append(blank)  # separator so the repeat survives
        frame = [0.0] * (len(VOCAB) + 1)
        frame[idx] = 1.0
        frames.extend([frame] * t_per_char)
        prev_idx = idx
    frames.append(blank)
    return frames


@pytest.mark.parametrize("text", ["TOTAL RM12.34", "AA BB", "GOLDEN KEY"])
def test_ctc_greedy_decode(spark, text):
    df = spark.createDataFrame([( _logits_for(text),)],
                               "logits array<array<double>>")
    got = df.select(ctc_greedy_decode(F.col("logits")).alias("t")) \
        .collect()[0]["t"]
    assert got == text


def test_ctc_collapses_repeats_and_blanks(spark):
    # path: blank, c, c, blank, c  → "cc" collapses to two chars only
    # when separated by a blank; adjacent repeats merge
    c = VOCAB.index("A") + 1
    frame_c = [0.0] * (len(VOCAB) + 1)
    frame_c[c] = 1.0
    blank = [1.0] + [0.0] * len(VOCAB)
    df = spark.createDataFrame(
        [([blank, frame_c, frame_c, blank, frame_c],)],
        "logits array<array<double>>")
    got = df.select(ctc_greedy_decode(F.col("logits")).alias("t")) \
        .collect()[0]["t"]
    assert got == "AA"
