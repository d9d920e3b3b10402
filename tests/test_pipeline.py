"""End-to-end incremental pipeline: N runs over growing data == one batch
rollup of everything; the no-new-data gate skips; reruns don't double-count."""

from __future__ import annotations

from pyspark.sql import functions as F

from ssg_etl_spark.operators.rollups import rollup_date_type
from ssg_etl_spark.pipelines import run_events_rollup_once
from ssg_etl_spark.sources.tables import load_table


def _snapshot(spark, path):
    return {
        (r.event_date, r.event_type): (round(r.total_value, 6), r.n_events)
        for r in spark.read.parquet(path + "/target").collect()
    }


def test_incremental_runs_equal_batch(spark, sf_dir, tmp_path):
    state = str(tmp_path / "state")
    events = load_table(spark, sf_dir, "events")
    cut = events.selectExpr("percentile_approx(ts, 0.5) p").first().p

    # Run 1 sees only the first half; run 2 sees everything.
    m1 = run_events_rollup_once(spark, events.filter(F.col("ts") <= cut), state)
    assert m1["extracted"] > 0 and not m1["skipped"]
    m2 = run_events_rollup_once(spark, events, state)
    assert m2["extracted"] > 0 and not m2["skipped"]
    assert m1["extracted"] + m2["extracted"] == events.count()

    want = {
        (r.event_date, r.event_type): (round(r.total_value, 6), r.n_events)
        for r in rollup_date_type(events).collect()
    }
    assert _snapshot(spark, state) == want

    # Run 3: nothing new — the M4 gate skips, target unchanged.
    m3 = run_events_rollup_once(spark, events, state)
    assert m3 == {"extracted": 0, "skipped": True}
    assert _snapshot(spark, state) == want


def test_crash_after_commit_marker_recovers_exactly_once(spark, sf_dir, tmp_path):
    """Crash between commit marker and publish: the next run completes the
    swap + audit append instead of double-counting the batch."""
    import json
    import os

    from ssg_etl_spark import pipelines as P

    state = str(tmp_path / "state")
    events = load_table(spark, sf_dir, "events")
    cut = events.selectExpr("percentile_approx(ts, 0.5) p").first().p
    first_half = events.filter(F.col("ts") <= cut)
    run_events_rollup_once(spark, first_half, state)

    # Simulate run 2 crashing right after the marker write: stage the merged
    # result and write the marker, but never publish.
    p = P._paths(state)
    log = spark.read.parquet(p["log"])
    import datetime as dt
    wm = P.inc.get_watermark(log, P.SOURCE_NAME)
    batch = P.inc.incremental_read(events, "ts", wm)
    log_row = P.inc.advance_watermark(
        spark, P.SOURCE_NAME, batch, "ts", dt.datetime(2024, 6, 1)
    )
    delta = P.rollup_date_type(batch)
    target = spark.read.parquet(p["target"])
    P.merge_additive(
        target, delta, ["event_date", "event_type"], ["total_value", "n_events"]
    ).write.mode("overwrite").parquet(p["staging"])
    row = {
        k: (v.isoformat() if hasattr(v, "isoformat") else v)
        for k, v in log_row.first().asDict().items()
    }
    P._write_marker(p["marker"], {"run_id": row["process_log_id"], "log_row": row})
    # ---- crash here; next run must recover, then see nothing new ----
    m = run_events_rollup_once(spark, events, state)
    assert m == {"extracted": 0, "skipped": True}
    assert not os.path.exists(p["marker"]) and not os.path.exists(p["staging"])
    want = {
        (r.event_date, r.event_type): (round(r.total_value, 6), r.n_events)
        for r in rollup_date_type(events).collect()
    }
    assert _snapshot(spark, state) == want


def test_uncommitted_staging_is_discarded(spark, sf_dir, tmp_path):
    """Crash before the marker: staging is discarded and the batch replays
    cleanly (watermark never advanced)."""
    import os

    from ssg_etl_spark import pipelines as P

    state = str(tmp_path / "state")
    events = load_table(spark, sf_dir, "events")
    cut = events.selectExpr("percentile_approx(ts, 0.5) p").first().p
    run_events_rollup_once(spark, events.filter(F.col("ts") <= cut), state)
    p = P._paths(state)
    # Orphan staging dir, no marker (crash mid-stage).
    os.makedirs(p["staging"], exist_ok=True)
    m = run_events_rollup_once(spark, events, state)
    assert not m["skipped"] and m["extracted"] > 0
    want = {
        (r.event_date, r.event_type): (round(r.total_value, 6), r.n_events)
        for r in rollup_date_type(events).collect()
    }
    assert _snapshot(spark, state) == want
