"""Deterministic cache lifecycle for registered queries.

Several operators persist plan-shared intermediates (shingle sets, MinHash
signatures, TF tables, k-means centroids) because their DataFrame feeds two
or more plan branches. A bare ``persist()`` pins those blocks until the
session dies or the LRU evicts them — correct, but a long-lived session
sweeping the full query registry accumulates storage from every query it
has ever run and its memory behavior becomes timing-dependent.

Operators therefore route persists through :func:`persist_tracked`, and
query *consumers* (bench.py, tools/sweep.py, services embedding the
registry) call :func:`release_tracked` once a query's output has been fully
consumed. Releasing is always safe: an unpersisted DataFrame silently
recomputes if some straggler plan still references it.

This is intentionally a module-level registry, not a context manager bolted
onto every operator: operators return LAZY DataFrames, so the persist
handles must outlive the operator call and die with the *consumption* of
the query, which only the caller can see.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """``df.persist()`` plus registration for later bulk release.

    Default storage level (MEMORY_AND_DISK): spills rather than OOMs when a
    persisted intermediate outgrows executor storage at scale.
    """
    df.persist()
    _TRACKED.append(df)
    return df


def tracked_count() -> int:
    """Number of persist handles currently registered (for tests/metrics)."""
    return len(_TRACKED)


def release_tracked(blocking: bool = False) -> int:
    """Unpersist every tracked DataFrame; returns how many were released.

    ``blocking=True`` waits for the executors to actually drop the blocks —
    use in tests that assert on ``getPersistentRDDs``; the async default is
    right for production sweeps (release is a hint, not a barrier).
    """
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking=blocking)
        except Exception:  # noqa: BLE001 — a dead session's handles are moot
            pass
        n += 1
    return n
