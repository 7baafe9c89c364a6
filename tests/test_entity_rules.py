"""Unit battery for the entity cleaning/fallback expressions (X1-X6,
W4/W5) against the pure-Python oracle, including the rounding
adjustment path that the gated flagship rarely reaches."""

from pyspark.sql import functions as F

from icdar_2019_rrc_sroie_spark.operators.entities import (
    clean_address_expr,
    clean_company_expr,
    company_fallback_expr,
    date_fallback_expr,
    extract_date_expr,
    extract_total_expr,
    total_fallback_expr,
)
from tests import oracle_rules as O

COMPANY_CASES = [
    "GOLDEN KEY MAKER",
    "99 SPEED MART S/B",
    "MR. D.I.Y. (M) SDN BHD",
    "SYARIKAT ABC (A123456-X) BRANCH 7",
    "SANYU TRADING (MALAYSIA",
    "SANYU TRADING (MALAYSIA)",
    "TAX SERVICES CENTER",
    "THE RECEIPT SHOP",
    "  PADDED NAME  ",
    "POPULAR BOOK CO. (M) SDN BHD",
    "12 STORE FRONT9X",
]

ADDRESS_CASES = [
    "NO 5, JALAN X, 81750 MASAI TEL 03-1234567",
    "LOT 1, TAMAN Y 012-345678-",
    "PLAIN ADDRESS LINE",
    "STREET 9 TEL",
    "ROAD 55 99-",
]

TOTAL_CASES = ["- 75.00", "RM85.00", "$8.55", "RM 65.00", "85.00SR",
               "46.89", "AMOUNT DUE 30.25", "1.0", "NO MONEY",
               "1,234.56 GRAND"]

DATE_CASES = ["DATE: 2018-03-23", ": 2018-04-06", "06/04/18",
              "3004 STORED 22 MAR 18 02:1", "NO DATE", "9.9.99"]


def _eval_scalar(spark, expr_fn, cases):
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    return [r["o"] for r in
            df.select(expr_fn(F.col("t")).alias("o")).collect()]


def test_clean_company_matches_oracle(spark):
    got = _eval_scalar(spark, clean_company_expr, COMPANY_CASES)
    assert got == [O.clean_company(c) for c in COMPANY_CASES]


def test_clean_address_matches_oracle(spark):
    got = _eval_scalar(spark, clean_address_expr, ADDRESS_CASES)
    assert got == [O.clean_address(c) for c in ADDRESS_CASES]


def test_extract_total_matches_oracle(spark):
    got = _eval_scalar(spark, extract_total_expr, TOTAL_CASES)
    assert got == [O.extract_total(c) for c in TOTAL_CASES]


def test_extract_date_matches_oracle(spark):
    got = _eval_scalar(spark, extract_date_expr, DATE_CASES)
    assert got == [O.extract_date(c) for c in DATE_CASES]


def _eval_lines(spark, expr_fn, line_sets):
    df = spark.createDataFrame([(ls,) for ls in line_sets],
                               "lines array<string>")
    return [r["o"] for r in
            df.select(expr_fn(F.col("lines")).alias("o")).collect()]


TOTAL_FALLBACK_SETS = [
    # context on the total line itself (i>0)
    ["SHOP", "TOTAL 46.89", "CASH 50.00"],
    # context earlier, amount later
    ["SHOP", "AMOUNT PAYABLE", "46.89"],
    # blocked context (SUBTOTAL has SUB)
    ["SHOP", "SUBTOTAL 40.00", "CASH 50.00"],
    # amount before any context line -> earlier amount not eligible,
    # accepted at the context line
    ["SHOP", "2 X PEN 4.50", "TOTAL 46.89"],
    # line 0 never counts as context
    ["TOTAL STORE", "46.89"],
    # rounding adjustment without RM
    ["SHOP", "TOTAL 46.89", "RND ADJ 0.01"],
    # rounding NOT applied when result contains RM
    ["SHOP", "TOTAL RM46.89", "ROUNDING 0.02"],
    # no amounts at all
    ["SHOP", "TOTAL DUE", "THANKS"],
]


def _total_fallback_oracle(lines):
    ctx_idx = [j for j in range(1, len(lines))
               if O.CTX.search(lines[j].strip())
               and not O.BLOCK.search(lines[j].strip())]
    p0 = ctx_idx[0] if ctx_idx else None
    accepted = ""
    if p0 is not None:
        for i in range(len(lines)):
            tot = O.extract_total(lines[i])
            if tot and i >= p0:
                accepted = tot
                break
    if accepted:
        import re
        text_space = "".join(lines).strip()
        m = re.search(r"(RND|ROUNDING).*(\d+.\d+)", text_space)
        if m:
            rv = O.extract_total(m.group())
            if rv and "RM" not in accepted:
                try:
                    accepted = str(float(accepted) + float(rv))
                except ValueError:
                    pass
    return accepted


def test_total_fallback_matches_oracle(spark):
    got = _eval_lines(spark, total_fallback_expr, TOTAL_FALLBACK_SETS)
    expected = [_total_fallback_oracle(ls) for ls in TOTAL_FALLBACK_SETS]
    assert got == expected
    # sanity: the rounding case actually rounds
    idx = TOTAL_FALLBACK_SETS.index(["SHOP", "TOTAL 46.89", "RND ADJ 0.01"])
    assert got[idx] == "46.9"


def test_company_and_date_fallbacks(spark):
    sets = [
        ["99 SPEED MART S/B", "SECOND LINE"],
        ["TAX OFFICE", "REAL COMPANY NAME"],
        ["12345", "67890"],
        ["NO DATES HERE", "STILL NONE", "06/04/18 FINALLY"],
    ]
    got_company = _eval_lines(spark, company_fallback_expr, sets)
    assert got_company[0] == "99 SPEED MART S/B"
    assert got_company[1] == "REAL COMPANY NAME"
    assert got_company[2] == ""
    got_date = _eval_lines(spark, date_fallback_expr, sets)
    assert got_date[3] == "06/04/18"
    assert got_date[0] == ""
