"""I/O retry with exponential backoff (SURVEY §2.12 orchestration surface).

The reference wraps every DB call in retry decorators — fixed 3×5 s at
dags/ssg_gl_etl.py:65-93, exponential ×2 from 5 s at
scripts/base_model.py:48-72, with connection-error keyword triage at
dags/ssg_gl_etl.py:543-605. In the engine this wraps *job-level* I/O
actions (a write, a JDBC read), never per-row work — Spark already retries
tasks internally.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from functools import wraps
from typing import TypeVar

R = TypeVar("R")

# Reference triage keywords (dags/ssg_gl_etl.py:584-597): these indicate a
# transient connectivity problem worth retrying; anything else re-raises.
TRANSIENT_MARKERS = (
    "connection reset",
    "connection refused",
    "timeout",
    "timed out",
    "broken pipe",
    "temporarily unavailable",
)


def is_transient(exc: BaseException) -> bool:
    msg = str(exc).lower()
    return any(m in msg for m in TRANSIENT_MARKERS)


def with_retry(
    retries: int = 3,
    base_delay: float = 5.0,
    backoff: float = 2.0,
    only_transient: bool = True,
    sleep: Callable[[float], None] = time.sleep,
):
    """Decorator: retry a callable with exponential backoff.

    ``retries`` counts RETRIES, not attempts: the function always runs once,
    plus up to ``retries`` more times on transient failure (``retries=0``
    → single attempt, never re-run). ``only_transient`` replicates the
    reference's error triage — permanent errors (bad SQL, auth) fail fast;
    connectivity blips retry.
    """

    def deco(fn: Callable[..., R]) -> Callable[..., R]:
        @wraps(fn)
        def wrapped(*args, **kwargs) -> R:
            delay = base_delay
            for attempt in range(retries + 1):
                try:
                    return fn(*args, **kwargs)
                except Exception as exc:
                    last = attempt == retries
                    if last or (only_transient and not is_transient(exc)):
                        raise
                    sleep(delay)
                    delay *= backoff
            raise AssertionError("unreachable")

        return wrapped

    return deco
