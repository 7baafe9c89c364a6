"""Pure-Python oracle of the engine's extraction semantics.

Written from the reference's documented behavior (entity_matching.py,
generate_data.py — cited per function in the engine modules), NOT
copied: it mirrors classifier + run assembly + cleaning + fallback
rules so the Spark pipeline can be property-tested on arbitrary line
sets."""

from __future__ import annotations

import re

DATE_1 = re.compile(r"(\d{4}|\d{2}|\d)[-/.](\d{2}|\d)[-/.](\d{4}|\d{2}|\d)")
DATE_2 = re.compile(
    r"(\d{4}|\d{2}|\d)[-/.]*\s*(JAN|FEB|MAR|APR|MAY|JUN|JUL|AUG|SEP|OCT|NOV|DEC)"
    r"[-/.]*\s*(\d{4}|\d{2}|\d)")
TOTAL = re.compile(
    r"(^[^\+\-]|([$\+\-]|[RM\s]))*((\d{3}|\d{2}|\d|\d\,\d{3})\.(\d{2}|\d))")
UNWANTED = re.compile(r"TAX|RECEIPT|INVOICE")
CTX = re.compile(r"TOTAL|AMOUNT")
BLOCK = re.compile(r"EX|SUB")
TOTAL_CONTEXT = re.compile(r"TOTAL|AMOUNT|DUE|AMT|ROUND|RND|RM|GST")


def extract_date(t: str) -> str:
    t = t.strip()
    m = DATE_1.search(t) or DATE_2.search(t)
    return m.group().strip() if m else ""


def extract_total(t: str) -> str:
    m = TOTAL.search(t.strip())
    return m.group().strip() if m else ""


def clean_company(t: str) -> str:
    t = t.strip()
    if UNWANTED.search(t):
        return ""
    m = re.match(r"(\d+[^0-9]*[A-Z]+)$", t)
    if m is None:
        m = re.search(r"\([A-Z]*\d+[^0-9]*[A-Z]+\).*$", t)
    if m is None:
        m = re.search(r"\([A-Z\s]+[\)]*$", t)
    if m is None:
        return t
    idx = t.find(m.group().strip())
    return t[:idx].strip()


def clean_address(t: str) -> str:
    idx = t.find("TEL")
    if idx != -1:
        t = t[:idx]
    return re.sub(r"(\d+\-[^a-zA-Z]*)$", "", t.strip()).strip()


def classify(lines: list[str]) -> list[tuple[int, float]]:
    """Deterministic classifier spec (operators/classify.py)."""
    out = []
    for i, raw in enumerate(lines):
        t = raw.strip()
        date_ex = extract_date(t)
        total_ex = extract_total(t)
        marker = re.search(r"JALAN|JLN|LRG|LOT |NO ?\.? ?\d", t)
        postcode = re.search(r"\d{5}", t)
        state = re.search(
            r"SELANGOR|JOHOR|MELAKA|PULAU|PERAK|KEDAH|KUALA", t)
        venue = re.search(r"FLR|FLOOR|MALL|PLAZA|LEVEL", t)
        is_address = (
            (marker and ("," in t or postcode))
            or ("," in t and postcode)
            or ("," in t and venue)
            or re.search(r"(LOT |NO ?\.? ?\d).*(JALAN|JLN)", t)
            or (postcode and state)
        )
        if is_address:
            out.append((3, 0.75))
        elif date_ex:
            out.append((2, 0.95))
        elif total_ex and TOTAL_CONTEXT.search(t):
            out.append((4, 0.90))
        elif i == 0 and not UNWANTED.search(t) \
                and not all(c.isdigit() for c in t):
            out.append((1, 0.85))
        else:
            out.append((0, 0.99))
    return out


def absorb_continuations(lines, classes):
    """Mirror of operators/spans.py::absorb_continuations (left fold,
    cascading)."""
    out = []
    for i, c in enumerate(classes):
        t = lines[i].strip()
        if (c == 0 and out and out[-1] == 3 and t
                and not extract_date(t) and not extract_total(t)):
            out.append(3)
        else:
            out.append(c)
    return out


def extract_turn(lines: list[str]) -> dict[str, str]:
    """Full turn extraction: classifier + reference assembly rules."""
    cls_prob = classify(lines)
    classes = absorb_continuations(lines, [c for c, _ in cls_prob])
    # prob is a pure function of the FINAL class (absorbed lines carry
    # the address prob), matching classify.py::prob_expr
    _probs_by_class = {0: 0.99, 1: 0.85, 2: 0.95, 3: 0.75, 4: 0.90}
    probs = [_probs_by_class[c] for c in classes]

    if 2 not in classes or 4 not in classes:
        return {}

    # runs
    runs = []
    start = 0
    for i in range(1, len(classes) + 1):
        if i == len(classes) or classes[i] != classes[i - 1]:
            runs.append((classes[start], start, i - 1))
            start = i
    best: dict[int, tuple[float, int, int]] = {}
    for cls, s, e in runs:
        if cls == 0:
            continue
        run_max = max(probs[s:e + 1])
        if cls not in best or run_max > best[cls][0]:
            best[cls] = (run_max, s, e)

    results: dict[str, str] = {}
    # primary
    for cls, name in ((1, "company"), (2, "date"), (3, "address"), (4, "total")):
        if cls not in best:
            results[name] = ""
            continue
        run_max, s, e = best[cls]
        if cls in (2, 4):
            idx = next(i for i in range(s, e + 1) if probs[i] == run_max)
            src = extract_date(lines[idx]) if cls == 2 else extract_total(lines[idx])
            results[name] = src
        else:
            joined = " ".join(lines[s:e + 1])
            results[name] = (clean_company(joined) if cls == 1
                             else clean_address(joined))

    # fallbacks
    if not results["company"]:
        for k in range(min(2, len(lines))):
            t = lines[k].strip()
            if not UNWANTED.search(t) and not all(c.isdigit() for c in t):
                results["company"] = t if re.match(r"^\d+", t) else clean_company(t)
                break
    if not results["date"]:
        for t in lines:
            d = extract_date(t)
            if d:
                results["date"] = d
                break
    if not results["total"]:
        ctx_idx = [j for j in range(1, len(lines))
                   if CTX.search(lines[j].strip())
                   and not BLOCK.search(lines[j].strip())]
        p0 = ctx_idx[0] if ctx_idx else None
        accepted = ""
        if p0 is not None:
            for i in range(len(lines)):
                tot = extract_total(lines[i])
                if tot and i >= p0:
                    accepted = tot
                    break
        if accepted:
            text_space = "".join(lines).strip()
            m = re.search(r"(RND|ROUNDING).*(\d+.\d+)", text_space)
            if m:
                rv = extract_total(m.group())
                if rv and "RM" not in accepted:
                    try:
                        accepted = str(float(accepted) + float(rv))
                    except ValueError:
                        pass
        results["total"] = accepted

    return {k: v for k, v in results.items() if v}
