"""Property-style parity: the Spark span assembly must agree with the
pure-Python oracle (tests/oracle_rules.py) on seeded randomized line
sets covering rule edge cases (m1/m2/m3 company cleanups, TEL
addresses, context-gated totals, RND rounding, fallback ordering)."""

import random

from pyspark.sql import functions as F

from icdar_2019_rrc_sroie_spark.plans.extraction import extract_spans
from tests.oracle_rules import extract_turn

COMPANIES = [
    "GOLDEN KEY MAKER",
    "99 SPEED MART S/B",                    # m1: digits…LETTERS full match
    "MR. D.I.Y. (M) SDN BHD",
    "SYARIKAT PERNIAGAAN (A123456-X) OLD",  # m2: parenthesised reg code
    "SANYU TRADING (MALAYSIA",              # m3: trailing (LETTERS
    "TAX SERVICES CENTER",                  # unwanted word
    "12345",                                # pure number
]
ADDRESSES = [
    "NO 5, JALAN PERMAS 10/5, 81750 MASAI, JOHOR",
    "LOT 1851-A, JALAN KPB 6, 43300 SERI KEMBANGAN, SELANGOR TEL 03-89457133",
    "G-33, JALAN MERU, 41050 KLANG, SELANGOR TEL 012-3456789",
]
DATES = ["DATE: 06/04/18", "2018-03-23", "INV 22 MAR 18 02:11", "NO DATE HERE"]
TOTALS = ["TOTAL RM85.20", "AMOUNT DUE 30.25", "TOTAL 46.89",
          "SUBTOTAL 40.00", "CASH 100.00", "GST @6% 2.55"]
NOISE = ["THANK YOU PLEASE COME AGAIN", "ITEM 2 X PEN 4.50",
         "RND ADJ 0.02", "WWW.EXAMPLE.COM", "OPERATOR 7", "-----------"]


def _random_turn(rng: random.Random) -> list[str]:
    lines = [rng.choice(COMPANIES)]
    if rng.random() < 0.8:
        lines.append(rng.choice(ADDRESSES))
    lines.append(rng.choice(DATES))
    for _ in range(rng.randrange(0, 4)):
        lines.append(rng.choice(NOISE))
    lines.append(rng.choice(TOTALS))
    if rng.random() < 0.3:
        lines.append(rng.choice(TOTALS))
    if rng.random() < 0.3:
        lines.append(rng.choice(NOISE))
    return [ln for ln in lines if ln.strip()]


def test_spark_matches_python_oracle(spark):
    rng = random.Random(1234)
    turns = [_random_turn(rng) for _ in range(200)]
    rows = [(f"c{i:04d}", 0, "\n".join(t)) for i, t in enumerate(turns)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got: dict = {}
    for r in extract_spans(df).collect():
        got.setdefault(r["conv_id"], {})[r["label"]] = r["text"]

    mismatches = []
    for i, lines in enumerate(turns):
        clean = [ln.strip() for ln in lines
                 if ln.strip() and not (ln.startswith("==") and ln.endswith("=="))]
        expected = extract_turn(clean)
        actual = got.get(f"c{i:04d}", {})
        if expected != actual:
            mismatches.append((i, clean, expected, actual))
    assert not mismatches, \
        f"{len(mismatches)} turns differ; first: {mismatches[:2]}"
