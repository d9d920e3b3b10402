"""End-to-end incremental pipeline composition (SURVEY §3.1/§3.2 lifecycle,
re-expressed Spark-first).

One scheduled run of the reference's flagship DAG shape
(dags/ssg_gl_etl.py: watermark read → has-new-data gate → extract →
transform → load → watermark advance) as a single pure-ish function over
parquet state. The aggregation load is **additive**: per-key partial sums
from each batch are merged into the target by addition, which is exact for
decomposable aggregates (sum/count) and makes the pipeline's output equal
a from-scratch batch rollup after any sequence of runs — the invariant
`tests/test_pipeline.py` pins.

Scale: each run shuffles only the new batch (watermark-pruned scan); the
merge joins target×delta on the rollup key — both sides are aggregate-sized
(days × types), not fact-sized. State (log + target) is plain parquet,
rewritten atomically per run.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssg_etl_spark.operators import incremental as inc
from ssg_etl_spark.operators.rollups import rollup_date_type

SOURCE_NAME = "events_rollup"


def _read_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    if not os.path.exists(path):
        return None
    return spark.read.parquet(path)


def merge_additive(
    target: DataFrame | None,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Additive merge of per-key partial aggregates (M5 variant for
    decomposable aggregates): full-outer join on the key, summed columns
    add, missing side contributes zero."""
    if target is None:
        return delta
    t = target.alias("t")
    d = delta.alias("d")
    cond = [t[k].eqNullSafe(d[k]) for k in keys]
    merged = t.join(d, cond, "full_outer")
    key_cols = [F.coalesce(t[k], d[k]).alias(k) for k in keys]
    val_cols = [
        (
            F.coalesce(t[c], F.lit(0)) + F.coalesce(d[c], F.lit(0))
        ).alias(c)
        for c in sum_cols
    ]
    return merged.select(*key_cols, *val_cols)


def run_events_rollup_once(
    spark: SparkSession,
    events: DataFrame,
    state_dir: str,
    started_at: dt.datetime | None = None,
) -> dict:
    """One pipeline run. Returns run metrics (rows extracted, gate result).

    State layout: ``{state_dir}/log`` (ETL audit log, M1-M4) and
    ``{state_dir}/target`` (the rollup table the run maintains).
    """
    log_path = os.path.join(state_dir, "log")
    target_path = os.path.join(state_dir, "target")

    log = _read_or_none(spark, log_path)
    if log is None:
        log = inc.empty_log(spark)

    wm = inc.get_watermark(log, SOURCE_NAME)
    if wm is not None and not inc.has_new_data(events, "ts", wm):
        return {"extracted": 0, "skipped": True}  # M4 gate: nothing new

    batch, log_row = inc.run_incremental(
        spark, events, "ts", log, SOURCE_NAME, started_at
    )
    delta = rollup_date_type(batch)

    target = _read_or_none(spark, target_path)
    merged = merge_additive(
        target, delta, ["event_date", "event_type"], ["total_value", "n_events"]
    )

    # Materialize BEFORE overwriting the input it reads (target_path).
    staged = merged.localCheckpoint(eager=True)
    staged.write.mode("overwrite").parquet(target_path)
    # The audit log is append-only (M3): one row per run.
    log_row.write.mode("append").parquet(log_path)
    extracted = log_row.first()["rows_extracted"]
    return {"extracted": extracted, "skipped": False}
