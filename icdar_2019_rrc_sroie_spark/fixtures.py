"""Deterministic synthetic transcripts (FIXTURES.md §1-3).

Generates the ``input_hint`` table
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp)`` as a *pure function of (seed, n_convs)* — no external data,
no RNG state. A deterministic subset of turns embeds SROIE-style receipt
lines (company / address / date / total — the reference's task-3 entities,
cf. /root/reference/keyword_information_extraction/utils/misc.py:82-112)
wrapped in HTML-ish boilerplate the pipeline must strip.

Generation is distributed: ``spark.range(n_convs)`` → ``mapInPandas`` with
one pure-Python row expansion per conversation. Conversation lengths are
skewed (a few convs are 10-100× longer) to exercise salting.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

GT_ENTITIES_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("company", T.StringType(), True),
        T.StructField("date", T.StringType(), True),
        T.StructField("address", T.StringType(), True),
        T.StructField("total", T.StringType(), True),
    ]
)

_BASE_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)

#: (raw printed line, entity the reference rules recover). Includes the
#: clean_company edge paths: m2 registration-code cut, m1 digits-full-
#: match rescued by the first-two-lines fallback (entity_matching.py:
#: 29-42, 192-201).
_COMPANIES = (
    ("GOLDEN KEY MAKER", "GOLDEN KEY MAKER"),
    ("MR. D.I.Y. (M) SDN BHD", "MR. D.I.Y. (M) SDN BHD"),
    ("AEON CO. (M) BHD", "AEON CO. (M) BHD"),
    ("POPULAR BOOK CO. (M) SDN BHD", "POPULAR BOOK CO. (M) SDN BHD"),
    ("SANYU STATIONERY SHOP", "SANYU STATIONERY SHOP"),
    ("GERBANG ALAF RESTAURANTS SDN BHD", "GERBANG ALAF RESTAURANTS SDN BHD"),
    ("99 SPEED MART S/B", "99 SPEED MART S/B"),
    ("WATSON'S PERSONAL CARE STORES", "WATSON'S PERSONAL CARE STORES"),
    ("SYARIKAT MAJU (B987654-A) HOLDINGS", "SYARIKAT MAJU"),
    ("TEO HENG STATIONERY & BOOKS", "TEO HENG STATIONERY & BOOKS"),
    ("PERNIAGAAN JAYA (K123456-M) ENTERPRISE", "PERNIAGAAN JAYA"),
    ("KEDAI PAPAN YEW CHUAN", "KEDAI PAPAN YEW CHUAN"),
)

_STREETS = (
    "NO 5, JALAN PERMAS 10/5",
    "LOT 1851-A & 1851-B, JALAN KPB 6",
    "NO 17, JALAN SS15/4D",
    "G-33, JALAN MERU BESTARI",
    "NO 290, JALAN AIR PANAS",
)

_CITIES = (
    "81750 MASAI, JOHOR",
    "43300 SERI KEMBANGAN, SELANGOR",
    "47500 SUBANG JAYA, SELANGOR",
    "68000 AMPANG, KUALA LUMPUR",
    "41050 KLANG, SELANGOR",
)

_ITEMS = (
    "A4 PAPER 80GSM",
    "BALL PEN 0.5MM BLACK",
    "PHOTOCOPY SERVICE",
    "STAPLER HD-10",
    "CORRECTION TAPE",
    "FILE A4 25MM",
    "MARKER PEN RED",
    "NOTEBOOK 120PG",
)

_CHAT_SNIPPETS = (
    "Could you pull up the last receipt for me?",
    "Sure, fetching the scanned document now.",
    "The scan quality looks fine, proceeding with extraction.",
    "Please double-check the totals on that one.",
    "Uploading the next batch of receipts.",
    "Acknowledged. Parsing the attachment.",
    "That vendor shows up a lot this month.",
    "Let me know if any fields are missing.",
)

_MONTHS = ("JAN", "FEB", "MAR", "APR", "MAY", "JUN",
           "JUL", "AUG", "SEP", "OCT", "NOV", "DEC")


def _h(*keys) -> int:
    """Stable 64-bit hash of the key tuple (pure, process-independent)."""
    raw = "\x1f".join(str(k) for k in keys).encode()
    return int.from_bytes(hashlib.md5(raw).digest()[:8], "big")


def _receipt_lines(seed: int, conv: int, turn: int) -> tuple[list[str], dict]:
    """One synthetic receipt: its visible lines + ground-truth entities.

    Lines are crafted so the reference's rule path (entity_matching.py:187-244,
    generate_data.py:128-152) recovers the entities exactly.
    """
    k = _h(seed, conv, turn)
    company_raw, company_gt = _COMPANIES[k % len(_COMPANIES)]
    street = _STREETS[(k >> 8) % len(_STREETS)]
    city = _CITIES[(k >> 16) % len(_CITIES)]
    address = f"{street}, {city}"
    two_line_addr = (k >> 20) % 3 == 0

    day = 1 + (k >> 24) % 28
    month = 1 + (k >> 32) % 12
    year = 2016 + (k >> 40) % 4
    date_style = (k >> 44) % 3
    if date_style == 0:
        date = f"{day:02d}/{month:02d}/{year}"
    elif date_style == 1:
        date = f"{year}-{month:02d}-{day:02d}"
    else:
        date = f"{day:02d} {_MONTHS[month - 1]} {year % 100:02d}"

    n_items = 2 + (k >> 48) % 4
    total_cents = 0
    item_lines = []
    for i in range(n_items):
        ki = _h(seed, conv, turn, "item", i)
        item = _ITEMS[ki % len(_ITEMS)]
        qty = 1 + ki % 3
        cents = 100 + (ki >> 8) % 2000
        total_cents += qty * cents
        item_lines.append(f"{qty} X {item} {qty * cents / 100:.2f}")
    total = f"{total_cents / 100:.2f}"

    has_tel = (k >> 52) % 2 == 0
    tel_suffix = f" TEL 03-{1000000 + (k >> 33) % 9000000}" if has_tel else ""

    if two_line_addr:
        # split across two printed lines; run-joining with ' ' restores
        # the exact single-line ground truth (entity_matching.py:161-163)
        address_lines = [f"{street},", f"{city}{tel_suffix}"]
    else:
        address_lines = [f"{address}{tel_suffix}"]

    rounding_noise = (k >> 56) % 4 == 0

    lines = [
        company_raw,
        *address_lines,
        f"DATE: {date}",
        "-" * 24,
        *item_lines,
        "-" * 24,
        f"TOTAL RM{total}",
        *(["ROUNDING ADJ 0.02"] if rounding_noise else []),
        f"CASH {total_cents / 100 + 10:.2f}",
        "THANK YOU PLEASE COME AGAIN",
    ]
    gt = {"company": company_gt, "date": date, "address": address,
          "total": f"RM{total}"}
    return lines, gt


def _wrap_boilerplate(conv_id: str, turn: int, body_lines: list[str]) -> str:
    """HTML-ish boilerplate the extractor must strip (north_rule)."""
    header = [
        "<html><head><title>agent transcript viewer</title></head>",
        "<body>",
        f"== SESSION {conv_id} TURN {turn} ==",
        '<div class="content">',
    ]
    footer = [
        "</div>",
        "== FOOTER: rendered by transcript-ui v1.3 ==",
        "</body></html>",
    ]
    padded = ["   " + ln + "  " for ln in body_lines]
    return "\n".join(header + padded + footer)


def n_turns_for(seed: int, conv: int) -> int:
    """Skewed conversation length: ~1% of convs are 10-100× longer."""
    k = _h(seed, conv, "len")
    if conv % 97 == 0:
        return 48 + k % 400
    return 4 + k % 12


def is_receipt_turn(seed: int, conv: int, turn: int) -> bool:
    return _h(seed, conv, turn, "kind") % 3 == 0


def conv_rows(seed: int, conv: int) -> tuple[list[dict], list[dict]]:
    """All transcript rows + gt entity rows of one conversation (pure)."""
    conv_id = f"conv_{conv:06d}"
    n = n_turns_for(seed, conv)
    rows, gt_rows = [], []
    t0 = _BASE_TS + timedelta(minutes=conv % 10_000)
    for turn in range(n):
        role = ("user", "assistant", "tool")[turn % 3]
        tool = "receipt_scanner" if role == "tool" else None
        if is_receipt_turn(seed, conv, turn):
            body, gt = _receipt_lines(seed, conv, turn)
            text = _wrap_boilerplate(conv_id, turn, body)
            gt_rows.append({"conv_id": conv_id, "turn_idx": turn, **gt})
        else:
            k = _h(seed, conv, turn, "chat")
            body = [_CHAT_SNIPPETS[k % len(_CHAT_SNIPPETS)]]
            text = _wrap_boilerplate(conv_id, turn, body)
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": turn,
                "role": role,
                "text": text,
                "tool": tool,
                "ts": t0 + timedelta(seconds=17 * turn),
            }
        )
    return rows, gt_rows


def transcripts_df(spark: SparkSession, n_convs: int = 200,
                   seed: int = 42) -> DataFrame:
    """Distributed deterministic transcripts table."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for conv in batch["id"]:
                rows, _ = conv_rows(seed, int(conv))
                out.extend(rows)
            if out:
                yield pd.DataFrame(out)

    n_parts = min(max(n_convs // 8, 1), 256)
    return (
        spark.range(n_convs)
        .repartition(n_parts)
        .mapInPandas(gen, schema=TRANSCRIPTS_SCHEMA)
    )


def gt_entities_df(spark: SparkSession, n_convs: int = 200,
                   seed: int = 42) -> DataFrame:
    """Distributed ground-truth entity table matching ``transcripts_df``."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for conv in batch["id"]:
                _, gt_rows = conv_rows(seed, int(conv))
                out.extend(gt_rows)
            if out:
                yield pd.DataFrame(out)

    n_parts = min(max(n_convs // 8, 1), 256)
    return (
        spark.range(n_convs)
        .repartition(n_parts)
        .mapInPandas(gen, schema=GT_ENTITIES_SCHEMA)
    )
