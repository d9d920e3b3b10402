"""Bucketed range join: exact coverage (equals the naive theta join) and a
scale-safe plan (no BroadcastNestedLoopJoin)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ssg_etl_spark.operators.rangejoin import same_key_burst_pairs
from ssg_etl_spark.sources.tables import load_table


def test_burst_pairs_equal_naive_theta_join(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = {
        (r.user_id, r.event_a, r.event_b, r.delta_us)
        for r in same_key_burst_pairs(ev, tolerance_s=600).collect()
    }
    a, b = ev.alias("a"), ev.alias("b")
    # cast: parquet naive timestamps infer as TIMESTAMP_NTZ, which
    # unix_micros rejects (UTC session → the cast is exact).
    ua = F.unix_micros(F.col("a.ts").cast("timestamp"))
    ub = F.unix_micros(F.col("b.ts").cast("timestamp"))
    naive = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & ((ub > ua) | ((ub == ua) & (F.col("b.event_id") > F.col("a.event_id"))))
        & (ub - ua <= 600 * 1_000_000),
    ).select(
        F.col("a.user_id").alias("user_id"),
        F.col("a.event_id").alias("event_a"),
        F.col("b.event_id").alias("event_b"),
        (ub - ua).alias("delta_us"),
    )
    want = {(r.user_id, r.event_a, r.event_b, r.delta_us) for r in naive.collect()}
    assert got == want
    assert got, "fixture produced no pairs — tolerance too small to test"


def test_burst_pairs_boundary_coverage(spark):
    """Pairs exactly AT the tolerance and pairs crossing a bucket boundary
    are both found exactly once; ties on ts pair by id order."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, 10, t0),
        (1, 11, t0 + dt.timedelta(seconds=60)),   # exactly tol (bucket +1)
        (1, 12, t0 + dt.timedelta(seconds=61)),   # beyond tol from 10
        (1, 13, t0),                              # tie with 10
        (2, 20, t0 + dt.timedelta(seconds=59)),   # other key
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    got = sorted(
        (r.event_a, r.event_b, r.delta_us)
        for r in same_key_burst_pairs(ev, tolerance_s=60).collect()
    )
    assert got == [
        (10, 11, 60_000_000),
        (10, 13, 0),
        (11, 12, 1_000_000),
        (13, 11, 60_000_000),
    ]


def test_burst_pairs_plan_has_no_nested_loop(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plan = (
        same_key_burst_pairs(ev, tolerance_s=600)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
