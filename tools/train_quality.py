"""Offline trainer for the fastText-style quality classifier (round 5,
VERDICT r4 'Next round' #9).

Binary logistic regression over hashed unigram+bigram features
(d buckets, md5-substring hash — the exact featurization
``operators/quality_clf.py`` serves in Catalyst). Positives are the
sf0.01 ``documents`` texts; each document's negative is its
token-SORTED corruption — the unigram multiset is identical by
construction, so separating the classes requires word-ORDER (bigram)
statistics, which is what a quality classifier actually distinguishes
between fluent text and word salad. EVEN doc_ids train, ODD doc_ids
are held out (accuracy gated in tests/test_quality_clf.py).

Deterministic: fixed corpus order, zero-init weights, fixed step/
epochs — rerunning reproduces models/quality_clf.json byte-exactly.

Usage: python tools/train_quality.py [out.json]
"""

from __future__ import annotations

import hashlib
import json
import re
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from icdar_2019_rrc_sroie_spark.operators.quality_clf import (  # noqa: E402
    default_weights_path,
)

CORPUS = "/root/testdata/sf0.01/documents.parquet"
D = 1024
EPOCHS = 80
LR = 2.0


def norm_tokens(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text.strip().lower()).split(" ")


def grams(tokens: list[str]) -> list[str]:
    return tokens + [a + " " + b for a, b in zip(tokens, tokens[1:])]


def bucket(g: str) -> int:
    return int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16) % D


def featurize(tokens: list[str]) -> np.ndarray:
    x = np.zeros(D)
    gs = grams(tokens)
    for g in gs:
        x[bucket(g)] += 1.0
    if gs:
        x /= len(gs)
    return x


def main() -> None:
    import duckdb

    out = sys.argv[1] if len(sys.argv) > 1 else default_weights_path()
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{CORPUS}' ORDER BY doc_id").fetchall()
    xs, ys, held = [], [], []
    for doc_id, text in rows:
        toks = norm_tokens(text)
        pos, neg = featurize(toks), featurize(sorted(toks))
        if doc_id % 2 == 0:
            xs += [pos, neg]
            ys += [1.0, 0.0]
        else:
            held += [(pos, 1), (neg, 0)]
    x = np.array(xs)
    y = np.array(ys)
    w = np.zeros(D)
    b = 0.0
    for _ in range(EPOCHS):
        p = 1.0 / (1.0 + np.exp(-(x @ w + b)))
        g = p - y
        w -= LR * (x.T @ g) / len(y)
        b -= LR * float(g.mean())
    hx = np.array([h[0] for h in held])
    hy = np.array([h[1] for h in held])
    acc = float(((hx @ w + b > 0).astype(int) == hy).mean())
    payload = {
        "d": D,
        "b_micro": int(np.floor(b * 1e6 + 0.5)),
        "w_micro": [int(v) for v in np.floor(w * 1e6 + 0.5)],
        "holdout_acc": acc,
        "n_train": len(ys),
        "n_holdout": len(held),
    }
    with open(out, "w") as f:
        json.dump(payload, f, separators=(",", ":"))
    print(f"{out}: holdout acc {acc:.4f} on {len(held)} examples")


if __name__ == "__main__":
    main()
