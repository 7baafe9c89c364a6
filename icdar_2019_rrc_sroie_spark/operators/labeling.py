"""Entity→line fuzzy labeling (J6/X7/U4): the reference's training-label
generator re-expressed as a cogrouped Arrow kernel.

Reference semantics (keyword_information_extraction/data/preprocessing/
generate_data.py):

* ``compute_entity_classes`` (:20-87): per receipt, concatenate all OCR
  lines into one ``text_space``; for each ground-truth entity (class
  order company→date→address→total), if the entity text is not an exact
  substring of the text space, retry a fuzzy regex search
  ``(?e)(<text>){e<=e}`` with the error budget e growing 0..n_errors
  until it matches, and adopt the matched (OCR-noisy) variant. Split
  the adopted text on newlines into word groups, then greedily assign
  each word group to the FIRST still-unlabeled line that contains it —
  breaking after one line per word group except for ``total``, which
  labels every still-unlabeled containing line.
* ``assign_labels`` (:90-154): materialize per-line labels and apply the
  TOTAL-context lookback: a total-labeled line that does not itself
  contain a total keyword keeps the label only if one of the two
  previous lines does (generate_data.py:128-152).

Spark plan: the greedy claim loop is inherently sequential *within* one
document but documents are independent, so the whole labeler is ONE
``cogroup(...).applyInPandas`` over ``doc_id`` — one hash exchange per
input, Arrow-batched, no driver participation, linear in corpus size at
any scale. Inside the kernel the exact-substring fast path (`in`) skips
the regex engine entirely; the fuzzy search only runs for entities the
OCR actually corrupted (a small fraction of a real corpus), and its
cost is bounded by ``n_errors`` × text-space length per corrupted
entity.

Divergences from the reference (both crash paths upstream): if the
fuzzy search exhausts ``n_errors`` without a match the entity is left
unassigned (reference raises AttributeError), and if the raw entity
text is an invalid regex pattern we retry it escaped (reference
propagates the regex compile error). The raw-pattern behavior — entity
text is interpolated into the pattern unescaped, so metacharacters are
live — is otherwise preserved.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..constants import CLASSES_LABELS, LABELS_CLASSES

try:  # the fuzzy engine; gate so exact-path labeling works without it
    import regex as _regex
except ImportError:  # pragma: no cover
    _regex = None

_NONE_CLASS = LABELS_CLASSES["none"]
_TOTAL_CLASS = LABELS_CLASSES["total"]
# generate_data.py:128 — anchored-search pattern is equivalent to a
# keyword containment test; keep the alternation verbatim.
_TOTAL_KEYWORDS = ("TOTAL", "AMOUNT", "DUE", "AMT", "ROUND", "RND", "RM", "GST")

LABELED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("line_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("class", T.IntegerType(), False),
    ]
)


def _fuzzy_find(entity_text: str, text_space: str, n_errors: int) -> str | None:
    """Minimal-error fuzzy occurrence of ``entity_text`` in ``text_space``
    (generate_data.py:56-70). Returns the matched text or None."""
    if _regex is None:
        return None
    for e in range(n_errors + 1):
        pat = "(?e)(" + entity_text + "){e<=" + str(e) + "}"
        try:
            m = _regex.search(pat, text_space)
        except _regex.error:
            m = _regex.search(
                "(?e)(" + _regex.escape(entity_text) + "){e<=" + str(e) + "}",
                text_space,
            )
        if m is not None:
            return m.group()
    return None


def compute_entity_classes(
    entity_items: Iterable[tuple[str, str]],
    text_space: str,
    n_errors: int = 11,
) -> list[int]:
    """Per-line class indices for one document (generate_data.py:20-87).

    ``entity_items`` is (entity, entity_text) pairs; they are processed
    in class order regardless of input order, matching the reference's
    class-sorted entity dict.
    """
    text_lines = text_space.split("\n")
    classes = [_NONE_CLASS] * len(text_lines)

    ordered = sorted(
        ((LABELS_CLASSES[name], name, txt) for name, txt in entity_items
         if name in LABELS_CLASSES and name != "none"),
    )
    for klass, name, raw_text in ordered:
        entity_text = (raw_text or "").strip()
        if not entity_text:
            continue
        if entity_text not in text_space:
            found = _fuzzy_find(entity_text, text_space, n_errors)
            if found is None:
                continue  # reference would crash here (AttributeError)
            entity_text = found.strip()
        for word_group in entity_text.split("\n"):
            wg = word_group.strip()
            if not wg:
                continue
            for k, line in enumerate(text_lines):
                if classes[k] == _NONE_CLASS and wg in line.strip():
                    classes[k] = klass
                    if name != "total":
                        break
    return classes


def _has_total_keyword(text: str) -> bool:
    return any(kw in text for kw in _TOTAL_KEYWORDS)


# generate_data.py:141 — anchored negative lookahead: the lookback
# aborts as soon as a previous line contains one of these words.
_STOP_KEYWORDS = ("CASH", "QTY", "TAX", "INVOICE")


def apply_total_lookback(texts: list[str], classes: list[int]) -> list[int]:
    """TOTAL-context lookback (generate_data.py:128-152): a total line
    without a keyword survives only if one of the 2 previous lines has
    one; the scan breaks early on a CASH/QTY/TAX/INVOICE line (the
    reference's ``^(?!...)`` guard is start-anchored, so ``search``
    fails exactly when the line contains a stop word)."""
    out = list(classes)
    for i, klass in enumerate(classes):
        if klass != _TOTAL_CLASS:
            continue
        if _has_total_keyword(texts[i].strip()):
            continue
        found = False
        for j in range(i - 1, max(i - 3, -1), -1):
            jt = texts[j].strip()
            if any(kw in jt for kw in _STOP_KEYWORDS):
                break
            if _has_total_keyword(jt):
                found = True
        if not found:
            out[i] = _NONE_CLASS
    return out


def assign_labels_py(
    texts: list[str],
    entity_items: Iterable[tuple[str, str]],
    n_errors: int = 11,
) -> list[tuple[str, int]]:
    """(label, class) per line — the full generate_data.py:90-154 chain.

    Mirrors the reference's text-space construction literally, including
    the trailing/leading strip of the joined space (generate_data.py:
    103-106): the classes are computed against the *stripped* space's
    line split, then reported per original line index.
    """
    text_space = "\n".join(texts).strip()
    classes = compute_entity_classes(entity_items, text_space, n_errors)
    # The reference indexes entity_classes by the original line index; a
    # stripped leading blank line shifts the split (latent reference
    # IndexError for 2+ blanks). Mirror by truncating/padding with none.
    classes = classes[: len(texts)]
    classes += [_NONE_CLASS] * (len(texts) - len(classes))
    classes = apply_total_lookback(texts, classes)
    return [(CLASSES_LABELS[c], c) for c in classes]


def label_lines(lines: DataFrame, entities: DataFrame,
                n_errors: int = 11) -> DataFrame:
    """Distributed labeler: ``lines(doc_id, line_idx, text)`` ×
    ``entities(doc_id, entity, entity_text)`` → labeled line rows.

    One cogrouped Arrow exchange on ``doc_id``; everything else is
    per-document kernel work. Skew-safe: document size is bounded by
    layout (receipts/turns are tens of lines), so no key can straggle.
    """

    from pyspark.sql import functions as F

    # r7 (guide §4.1/§4.2): the former per-doc ``cogroup.applyInPandas``
    # kernel paid ~0.5 ms of pandas-DataFrame construction PER DOCUMENT
    # (one kernel invocation per group — 5k invocations ≈ 2.5 s at
    # sf0.1 against ~0.3 s of actual labeling work). The per-doc arrays
    # are now assembled JVM-side (sort_array(collect_list) per doc, one
    # hash aggregate each side + one equi-join) and the Python kernel
    # is ONE batched mapInPandas whose per-doc cost is a plain function
    # call. Semantics are unchanged: line order is (line_idx) exactly
    # as the kernel's sort_values; entity order never mattered —
    # ``compute_entity_classes`` fully sorts its items by
    # (class, name, text) — and docs with entities but no lines emit
    # nothing (left join from the lines side), as the cogroup did.
    lines_agg = lines.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("line_idx", "text")))
        .alias("_lines"))
    ents_agg = entities.groupBy("doc_id").agg(
        F.collect_list(F.struct("entity", "entity_text")).alias("_ents"))
    joined = lines_agg.join(ents_agg, "doc_id", "left")

    def kernel(batches):
        for pdf in batches:
            doc_out: list = []
            idx_out: list = []
            txt_out: list = []
            lab_out: list = []
            cls_out: list = []
            for doc_id, lrows, erows in zip(
                    pdf["doc_id"], pdf["_lines"], pdf["_ents"]):
                texts = [(r["text"] if r["text"] is not None else "")
                         for r in lrows]
                items = ([(r["entity"], r["entity_text"]) for r in erows]
                         if erows is not None else [])
                labeled = assign_labels_py(texts, items, n_errors=n_errors)
                doc_out.extend([doc_id] * len(texts))
                idx_out.extend(int(r["line_idx"]) for r in lrows)
                txt_out.extend(texts)
                lab_out.extend(lab for lab, _ in labeled)
                cls_out.extend(c for _, c in labeled)
            yield pd.DataFrame({
                "doc_id": doc_out,
                "line_idx": pd.array(idx_out, dtype="int32"),
                "text": txt_out,
                "label": lab_out,
                "class": pd.array(cls_out, dtype="int32"),
            })

    # Explicit round-robin repartition at full core count: the doc-row
    # table is tiny in bytes but CPU-expensive per row (fuzzy regex),
    # and AQE's size-based coalescing would otherwise run the kernel on
    # one or two tasks.
    n = lines.sparkSession.sparkContext.defaultParallelism
    return joined.repartition(n).mapInPandas(kernel, LABELED_SCHEMA)
