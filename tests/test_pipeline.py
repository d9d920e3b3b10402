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
