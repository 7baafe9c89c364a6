"""Parity tests for the J6/X7/U4 entity→line labeler.

The oracle here is a direct port of the reference's label generator
(keyword_information_extraction/data/preprocessing/generate_data.py:
20-154) run per document in plain Python; the engine's cogrouped kernel
must reproduce it exactly — including greedy claim-order conflicts,
fuzzy OCR-noise recovery, multi-line word groups and the TOTAL-context
lookback."""

from __future__ import annotations

import random

import pandas as pd
import pytest
import regex

from icdar_2019_rrc_sroie_spark.constants import CLASSES_LABELS, LABELS_CLASSES
from icdar_2019_rrc_sroie_spark.operators.labeling import (
    assign_labels_py,
    label_lines,
)

TOTAL_PATTERN = r"^(.*(TOTAL|AMOUNT|DUE|AMT|ROUND|RND|RM|GST)).*"


# --- reference port (generate_data.py:20-87) -------------------------------

def ref_compute_entity_classes(entities, text_space, n_errors=11):
    none_class = entities["none"][0]
    text_lines = text_space.split("\n")
    entity_classes = [none_class] * len(text_lines)
    for entity in entities.keys():
        if entity == "none":
            continue
        klass, entity_text = entities[entity]
        entity_text = entity_text.strip()
        if len(entity_text) == 0:
            continue
        if entity_text not in text_space:
            e, matched = 0, None
            while matched is None and e <= n_errors:
                pat = "(?e)(" + entity_text + "){e<=" + str(e) + "}"
                try:
                    matched = regex.search(pat, text_space)
                except regex.error:
                    matched = regex.search(
                        "(?e)(" + regex.escape(entity_text)
                        + "){e<=" + str(e) + "}", text_space)
                e += 1
            if matched is None:  # reference raises AttributeError here
                continue
            entity_text = matched.group().strip()
        for word_group in entity_text.split("\n"):
            for k, text_line in enumerate(text_lines):
                if entity_classes[k] == none_class:
                    line = text_line.strip()
                    wg = word_group.strip()
                    if len(wg) != 0 and wg in line:
                        entity_classes[k] = klass
                        if entity != "total":
                            break
    return entity_classes


# --- reference port (generate_data.py:90-154) -------------------------------

def ref_assign_labels(texts, entities):
    text_space = ""
    for t in texts:
        text_space += t + "\n"
    text_space = text_space.strip()
    classes = ref_compute_entity_classes(entities, text_space)
    out = []
    for i in range(len(texts)):
        klass = classes[i] if i < len(classes) else 0
        label = CLASSES_LABELS[klass]
        if label == "total":
            if regex.search(TOTAL_PATTERN, texts[i].strip()) is None:
                n, j, found = 1, i - 1, False
                while j >= 0 and n < 3:
                    jt = texts[j].strip()
                    if regex.search(
                            r"^(?!.*(CASH|QTY|TAX|INVOICE)).*", jt) is None:
                        break
                    if regex.search(TOTAL_PATTERN, jt) is not None:
                        found = True
                    j -= 1
                    n += 1
                if not found:
                    label, klass = "none", 0
        out.append((label, klass))
    return out


def ref_entities_dict(items):
    """Entities in the reference's class-sorted dict form."""
    d = {"none": (0, "")}
    for name in ("company", "date", "address", "total"):
        d[name] = (LABELS_CLASSES[name], dict(items).get(name) or "")
    return d


# --- randomized adversarial receipts ----------------------------------------

_TOKENS = ["KOPITIAM", "SDN", "BHD", "JALAN", "TAMAN", "RM", "TOTAL",
           "12.50", "CASH", "GST", "MART", "NO", "5", "AA", "AMOUNT"]


def random_receipt(rng: random.Random):
    n_lines = rng.randint(3, 12)
    texts = [
        " ".join(rng.choices(_TOKENS, k=rng.randint(1, 5)))
        for _ in range(n_lines)
    ]
    items = []
    for name in ("company", "date", "address", "total"):
        mode = rng.random()
        if mode < 0.15:
            items.append((name, ""))
            continue
        if mode < 0.35:  # random token soup, may or may not appear
            val = " ".join(rng.choices(_TOKENS, k=rng.randint(1, 3)))
        elif mode < 0.55 and name == "address":  # multi-line word groups
            val = "\n".join(rng.choice(texts) for _ in range(2))
        else:  # substring of an existing line
            line = rng.choice(texts)
            a = rng.randrange(max(len(line) - 3, 1))
            val = line[a:a + rng.randint(3, 15)]
        if rng.random() < 0.3 and len(val) > 4:  # OCR noise → fuzzy path
            p = rng.randrange(1, len(val) - 1)
            val = (val[:p] + val[p + 1:] if rng.random() < 0.5
                   else val[:p] + "#" + val[p + 1:])
        items.append((name, val))
    return texts, items


def test_kernel_matches_reference_port_randomized():
    rng = random.Random(1234)
    for _ in range(300):
        texts, items = random_receipt(rng)
        got = assign_labels_py(texts, items)
        want = ref_assign_labels(texts, ref_entities_dict(items))
        assert got == want, (texts, items)


def test_total_labels_every_matching_line():
    texts = ["TOTAL RM12.50", "RM12.50", "SUBTOTAL RM12.50 X"]
    items = [("total", "RM12.50")]
    got = assign_labels_py(texts, items)
    # total claims all three; every line has a keyword so lookback keeps all
    assert [c for _, c in got] == [4, 4, 4]


def test_nontotal_claims_first_line_only():
    texts = ["ACME MART", "ACME MART BRANCH 2"]
    items = [("company", "ACME MART")]
    got = assign_labels_py(texts, items)
    assert [c for _, c in got] == [1, 0]


def test_claim_order_conflict_company_wins():
    # company (class 1) is processed before address (class 3); address
    # must move on to the NEXT still-unlabeled containing line.
    texts = ["JALAN AA", "JALAN AA X"]
    items = [("company", "JALAN AA"), ("address", "JALAN")]
    got = assign_labels_py(texts, items)
    assert [c for _, c in got] == [1, 3]
    assert got == ref_assign_labels(
        texts, ref_entities_dict(items))


def test_fuzzy_recovers_ocr_noise():
    texts = ["KQPITIAM SDN BHD", "TOTAL RM9.99"]
    items = [("company", "KOPITIAM SDN BHD"), ("total", "RM9.99")]
    got = assign_labels_py(texts, items)
    assert [c for _, c in got] == [1, 4]


def test_fuzzy_smoke_vector():
    # generate_data.py:354-357 — (?e)(dok){e<=1} on 'cat and dog' → 'dog'
    m = regex.search("(?e)(dok){e<=1}", "cat and dog")
    assert m is not None and m.group() == "dog"


def test_total_lookback_relabels_bare_amount():
    # amount-only line labeled total, no keyword in it or 2 lines above
    texts = ["ITEM A", "ITEM B", "ITEM C", "12.50"]
    items = [("total", "12.50")]
    got = assign_labels_py(texts, items)
    assert got[3] == ("none", 0)
    # with a keyword within 2 lines above, the label survives
    texts2 = ["ITEM A", "TOTAL DUE", "ITEM C", "12.50"]
    got2 = assign_labels_py(texts2, items)
    assert got2[3] == ("total", 4)
    for t, i in ((texts, items), (texts2, items)):
        assert assign_labels_py(t, i) == ref_assign_labels(
            t, ref_entities_dict(i))


def test_raw_regex_metacharacters_are_live():
    # '.' in the entity text is a live wildcard in the fuzzy path, as in
    # the reference (pattern is interpolated unescaped)
    texts = ["PRICE 1X50"]
    items = [("total", "1.50")]
    got = assign_labels_py(texts, items)
    want = ref_assign_labels(texts, ref_entities_dict(items))
    assert got == want


def test_distributed_kernel_matches_local(spark):
    rng = random.Random(99)
    docs = {}
    line_rows, ent_rows = [], []
    for d in range(40):
        texts, items = random_receipt(rng)
        docs[f"d{d:03d}"] = (texts, items)
        for i, t in enumerate(texts):
            line_rows.append({"doc_id": f"d{d:03d}", "line_idx": i,
                              "text": t})
        for name, val in items:
            ent_rows.append({"doc_id": f"d{d:03d}", "entity": name,
                             "entity_text": val})
    lines = spark.createDataFrame(pd.DataFrame(line_rows))
    ents = spark.createDataFrame(pd.DataFrame(ent_rows))
    out = label_lines(lines, ents).orderBy("doc_id", "line_idx").collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.line_idx, r.label, r["class"]))
    assert set(by_doc) == set(docs)
    for doc_id, (texts, items) in docs.items():
        want = ref_assign_labels(texts, ref_entities_dict(items))
        got = [(lab, c) for _, lab, c in sorted(by_doc[doc_id])]
        assert got == want, doc_id
