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

Concurrency: the registry is shared session-wide and is touched from more
than one thread (streaming ``foreachBatch`` micro-batch threads register
persists while a notebook thread may be sweeping queries), so all access
is behind a lock, and consumers that share the session should release only
*their own* epoch of handles:

    tok = cache.scope_token()
    ...run query, consume output...
    cache.release_tracked(since=tok)

``release_tracked()`` with no token keeps the old drop-everything behavior
for single-consumer processes (bench.py, tests).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
# (epoch, df) pairs; epoch is a monotone counter so a consumer can release
# exactly the handles registered after it took its scope token.
_TRACKED: list[tuple[int, DataFrame]] = []
_EPOCH = 0


def persist_tracked(df: DataFrame) -> DataFrame:
    """``df.persist()`` plus registration for later bulk release.

    Default storage level (MEMORY_AND_DISK): spills rather than OOMs when a
    persisted intermediate outgrows executor storage at scale.
    """
    global _EPOCH
    df.persist()
    with _LOCK:
        _EPOCH += 1
        _TRACKED.append((_EPOCH, df))
    return df


def scope_token() -> int:
    """Epoch marker: pass to ``release_tracked(since=...)`` to release only
    handles registered after this call — safe when several consumers share
    one SparkSession (each releases its own persists, not its neighbors')."""
    with _LOCK:
        return _EPOCH


def tracked_count() -> int:
    """Number of persist handles currently registered (for tests/metrics)."""
    with _LOCK:
        return len(_TRACKED)


def release_tracked(blocking: bool = False, since: int | None = None) -> int:
    """Unpersist tracked DataFrames; returns how many were released.

    ``since=token`` releases only handles registered after the token (scoped
    release for shared sessions); ``since=None`` releases everything.
    ``blocking=True`` waits for the executors to actually drop the blocks —
    use in tests that assert on ``getPersistentRDDs``; the async default is
    right for production sweeps (release is a hint, not a barrier).
    """
    with _LOCK:
        if since is None:
            to_release = [df for _, df in _TRACKED]
            _TRACKED.clear()
        else:
            to_release = [df for ep, df in _TRACKED if ep > since]
            _TRACKED[:] = [(ep, df) for ep, df in _TRACKED if ep <= since]
    n = 0
    for df in to_release:
        try:
            df.unpersist(blocking=blocking)
        except Exception:  # noqa: BLE001 — a dead session's handles are moot
            pass
        n += 1
    return n
