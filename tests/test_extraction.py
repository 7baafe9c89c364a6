"""Golden end-to-end test: per-turn text equality of extracted spans
(north rule) against the embedded ground truth of the deterministic
fixture corpus."""

from pyspark.sql import functions as F

from icdar_2019_rrc_sroie_spark.fixtures import gt_entities_df, transcripts_df
from icdar_2019_rrc_sroie_spark.plans.extraction import extract_spans

N_CONVS = 40
SEED = 42


def _spans_map(rows):
    out = {}
    for r in rows:
        out.setdefault((r["conv_id"], r["turn_idx"]), {})[r["label"]] = r["text"]
    return out


def test_per_turn_equality(spark):
    transcripts = transcripts_df(spark, n_convs=N_CONVS, seed=SEED)
    spans = extract_spans(transcripts).collect()
    gt = gt_entities_df(spark, n_convs=N_CONVS, seed=SEED).collect()

    got = _spans_map(spans)
    mismatches = []
    for row in gt:
        key = (row["conv_id"], row["turn_idx"])
        expected = {
            "company": row["company"],
            "date": row["date"],
            "address": row["address"],
            "total": row["total"],
        }
        if got.get(key) != expected:
            mismatches.append((key, expected, got.get(key)))
    assert not mismatches, f"{len(mismatches)} turns differ; first: {mismatches[:3]}"
    # no spurious spans on non-receipt turns
    gt_keys = {(r["conv_id"], r["turn_idx"]) for r in gt}
    spurious = set(got) - gt_keys
    assert not spurious, f"spans on non-receipt turns: {sorted(spurious)[:5]}"


def test_determinism(spark):
    transcripts = transcripts_df(spark, n_convs=10, seed=SEED)
    a = sorted(map(tuple, extract_spans(transcripts).collect()))
    b = sorted(map(tuple, extract_spans(transcripts).collect()))
    assert a == b


def test_stable_ordering(spark):
    from icdar_2019_rrc_sroie_spark.plans.extraction import ordered_spans

    transcripts = transcripts_df(spark, n_convs=10, seed=SEED)
    rows = ordered_spans(extract_spans(transcripts)).collect()
    keys = [(r["conv_id"], r["turn_idx"], r["label"]) for r in rows]
    # ordering must be reproducible partition-by-partition
    assert keys == sorted(keys)
