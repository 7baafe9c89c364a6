"""Persisted-index bookkeeping.

Several candidate-generation operators (`minhash_candidates`,
`simhash_near_dups`, `embedding_near_dups`) persist a small index table
before self-joining it — the persist is load-bearing (both join sides
would otherwise re-evaluate the full shingle/signature pipeline) but the
operator returns a *lazy* DataFrame, so it cannot unpersist before the
caller's action runs. Every such persist is registered here;
long-lived sessions call :func:`release_indexes` after consuming the
results (bench.py does this between queries). One-shot jobs can ignore
it — executor storage dies with the session.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

_TRACKED: list[weakref.ReferenceType] = []


def track_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for later release."""
    df = df.persist()
    _TRACKED.append(weakref.ref(df))
    return df


def release_indexes() -> int:
    """Unpersist every still-alive tracked index table; returns the
    number released. Safe to call repeatedly."""
    released = 0
    while _TRACKED:
        ref = _TRACKED.pop()
        df = ref()
        if df is not None:
            try:
                df.unpersist()
                released += 1
            except Exception:  # session already stopped
                pass
    return released
