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

import contextlib
import weakref

from pyspark.sql import DataFrame, SparkSession

_TRACKED: list[weakref.ReferenceType] = []
_TRACKED_PATHS: list[tuple[SparkSession, str]] = []


def track_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for later release."""
    df = df.persist()
    _TRACKED.append(weakref.ref(df))
    return df


def track_scratch_dir(spark: SparkSession, path: str) -> None:
    """Register a scratch directory (e.g. a connected-components
    checkpoint label table under the session checkpoint dir) for
    deletion at the next :func:`release_indexes`. DataFrames backed by
    the path become invalid once released — same contract as persisted
    indexes: release only after consuming results."""
    _TRACKED_PATHS.append((spark, path))


def _delete_path(spark: SparkSession, path: str) -> None:
    # Hadoop FS API — works on local/HDFS/S3 alike, unlike shutil
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    hpath.getFileSystem(spark._jsc.hadoopConfiguration()) \
        .delete(hpath, True)


@contextlib.contextmanager
def index_scope():
    """Scope-local release: indexes/scratch dirs tracked INSIDE the
    ``with`` block are released on exit; entries tracked before it are
    left alone (a global :func:`release_indexes` would also drop
    indexes the caller is still consuming). For composed steps whose
    actions all complete inside them — e.g. ``ingest_snapshot``, which
    otherwise leaks one persisted band table per micro-batch when run
    from a ``foreachBatch`` sink (round-5 review)."""
    marks = (len(_TRACKED), len(_TRACKED_PATHS))
    try:
        yield
    finally:
        release_indexes(_marks=marks)


def release_indexes(_marks: tuple[int, int] = (0, 0)) -> int:
    """Unpersist every still-alive tracked index table and delete every
    tracked scratch dir; returns the number of items released. Safe to
    call repeatedly. ``_marks`` (internal, see :func:`index_scope`)
    stops the sweep at a snapshot of the two registries, releasing only
    entries tracked after it."""
    released = 0
    while len(_TRACKED) > _marks[0]:
        ref = _TRACKED.pop()
        df = ref()
        if df is not None:
            try:
                df.unpersist()
                released += 1
            except Exception:  # session already stopped
                pass
    while len(_TRACKED_PATHS) > _marks[1]:
        spark, path = _TRACKED_PATHS.pop()
        try:
            _delete_path(spark, path)
            released += 1
        except Exception:  # session already stopped
            pass
    return released
