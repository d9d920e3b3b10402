"""Shared Spark status-REST helpers for the measurement tools
(shuffle_audit, skew_sweep): one place for the API shape, the
completed-stage snapshot/diff pattern, and the listener-bus settle —
the next REST quirk (attemptId handling, proxy base URL) gets fixed
once, not per tool."""

from __future__ import annotations

import json
import time
import urllib.request

# The status API is eventually consistent with the listener bus; give
# final stages a moment to land before diffing.
SETTLE_S = 0.4


def api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/{path}") as r:
        return json.loads(r.read())


def completed_stages(spark) -> dict:
    """(stageId, attemptId) → stage record, completed stages only."""
    return {
        (st["stageId"], st["attemptId"]): st
        for st in api(spark, "stages?status=complete")
    }


def new_stages_since(spark, before: set, retries: int = 5) -> dict:
    """Stages completed since the ``before`` key-set. Retries the settle
    wait when nothing has landed yet (loaded-box listener lag) instead of
    returning empty."""
    for _ in range(retries):
        time.sleep(SETTLE_S)
        now = completed_stages(spark)
        new = {k: v for k, v in now.items() if k not in before}
        if new:
            return new
    return {}


def task_summary(spark, stage_id: int, attempt: int, quantiles="0.5,1.0"):
    return api(
        spark, f"stages/{stage_id}/{attempt}/taskSummary?quantiles={quantiles}"
    )
