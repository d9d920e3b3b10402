"""Watermark protocol: bootstrap, strictly-greater read, advance."""

from __future__ import annotations

import datetime as dt

from ssg_etl_spark.operators import incremental as inc
from ssg_etl_spark.sources.tables import load_table


def test_full_cycle(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    log = inc.empty_log(spark)

    # Run 1: bootstrap — everything is new.
    batch1, log_row1 = inc.run_incremental(spark, events, "ts", log, "events")
    assert batch1.count() == events.count()

    # Run 2 against the advanced log: nothing is new.
    log2 = log.unionByName(log_row1)
    wm = inc.get_watermark(log2, "events")
    assert wm == events.agg({"ts": "max"}).first()[0]
    assert not inc.has_new_data(events, "ts", wm)

    # Strictly-greater semantics: ties with the watermark are excluded.
    batch2 = inc.incremental_read(events, "ts", wm)
    assert batch2.count() == 0


def test_watermark_filter_is_pushed_down(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    wm = dt.datetime(2024, 1, 15)
    plan = inc.incremental_read(events, "ts", wm)._jdf.queryExecution().executedPlan().toString()
    # The filter must reach the scan (PushedFilters) — not evaluated post-scan only.
    assert "PushedFilters" in plan and "ts" in plan


def test_failed_run_does_not_advance(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    started = dt.datetime(2024, 2, 1)
    fail_row = inc.advance_watermark(
        spark, "events", events.limit(10), "ts", started, success=False, status="error",
        error_message="connection reset",
    )
    log = inc.empty_log(spark).unionByName(fail_row)
    assert inc.get_watermark(log, "events") is None  # failed rows ignored
