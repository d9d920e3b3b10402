"""Event-stream query pack: time windows, JSON extraction, watermark
incremental reads, interval lookbacks (SURVEY §2.8-2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssg_etl_spark.operators import incremental
from ssg_etl_spark.operators.rollups import DEC
from ssg_etl_spark.plans.registry import register
from ssg_etl_spark.sources.tables import load_table

DEC_SQL = DEC  # one point of truth with the engine-side precision


@register(
    "events_10min_window",
    oracle=f"""
SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start, event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS {DEC_SQL})) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
""",
    tags=("streaming", "P6"),
)
def events_10min_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute window aggregate — batch twin of the streaming
    version (ssg_etl_spark/streaming). Reference does 10-min processing-time
    lookbacks (dags/hanger_lanes_to_pg_etl.py:117); tumbling event-time
    windows are the Spark-native form. Epoch-aligned in both engines
    (DuckDB time_bucket's origin 2000-01-03 is a multiple of 10 min).
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "10 minutes").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "json_extract_props",
    oracle="""
SELECT event_id, event_type,
  CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
""",
    tags=("F9",),
    extra=True,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction + predicate (F9: jsonb ops, json_normalize)."""
    events = load_table(spark, sf_dir, "events")
    prop_k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.select("event_id", "event_type", prop_k.alias("prop_k"))
        .filter(F.col("prop_k") > 50)
    )


@register(
    "interval_filter_last_day",
    oracle=f"""
SELECT event_id, ts, user_id, event_type, value
FROM events
WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 1 DAY
""",
    tags=("P6", "P7", "F6"),
)
def interval_filter_last_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding lookback: last day relative to the data's max timestamp
    (P7: NOW() - INTERVAL '1 day', anchored to data for determinism).
    """
    events = load_table(spark, sf_dir, "events")
    max_ts = events.agg(F.max("ts").alias("mx")).first()["mx"]
    return events.filter(
        F.col("ts") >= F.lit(max_ts) - F.expr("interval 1 day")
    ).select("event_id", "ts", "user_id", "event_type", "value")


@register(
    "watermark_incremental",
    oracle=f"""
WITH wm AS (SELECT MAX(ts) AS w FROM events WHERE event_id % 10 = 0),
batch AS (SELECT e.* FROM events e, wm WHERE e.ts > wm.w)
SELECT COUNT(*) AS n_rows, MIN(ts) AS min_ts, MAX(ts) AS max_ts,
  CAST(SUM(CAST(value AS {DEC_SQL})) AS DOUBLE) AS total_value,
  COUNT(*) AS rows_extracted, MAX(ts) AS wm_after,
  TRUE AS success, 'completed' AS status
FROM batch
""",
    tags=("M1", "M2", "M3", "M4", "P5"),
)
def watermark_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark protocol end-to-end: persisted max-event-time, strictly
    greater filter, audit aggregate, and the M3 advance record
    (dags/ssg_gl_etl.py:97-124, 127-181, 331-333).

    The 'previous run' is simulated as every 10th event; its max ts is the
    stored watermark. The incremental batch is summarized, then joined with
    the deterministic fields of the one-row M3 audit record produced by
    ``advance_watermark`` (rows_extracted, the advanced watermark, success,
    status) so the driver verifies the advance protocol too.
    """
    import datetime as dt

    events = load_table(spark, sf_dir, "events")
    prior = events.filter(F.col("event_id") % 10 == 0)
    wm = prior.agg(F.max("ts").alias("wm")).first()["wm"]
    batch = incremental.incremental_read(events, "ts", wm)
    summary = batch.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
    )
    audit = incremental.advance_watermark(
        spark, "events", batch, "ts", started_at=dt.datetime(2024, 1, 1)
    ).select(
        F.col("rows_extracted"),
        F.col("last_extract_ts").alias("wm_after"),
        "success",
        "status",
    )
    return summary.crossJoin(audit)


from ssg_etl_spark.streaming.stateful import sessionize_batch, sessionize_batch_oracle


@register(
    "user_sessions",
    oracle=sessionize_batch_oracle(30),
    tags=("streaming", "W5", "sessionization"),
    extra=True,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap), batch twin of the
    applyInPandasWithState streaming operator (streaming/stateful.py)."""
    return sessionize_batch(load_table(spark, sf_dir, "events"), 30)


@register(
    "user_sessions_native",
    oracle=sessionize_batch_oracle(30),
    tags=("streaming", "sessionization"),
    extra=True,
)
def user_sessions_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization via the built-in session_window aggregation —
    shares the lag-form oracle (boundary semantics verified identical:
    delta == gap merges in both). Extra registry: locally verified."""
    from ssg_etl_spark.streaming.stateful import sessionize_native

    return sessionize_native(load_table(spark, sf_dir, "events"), 30)


@register(
    "event_burst_pairs",
    oracle="""
SELECT a.user_id AS user_id, a.event_id AS event_a, b.event_id AS event_b,
  epoch_us(b.ts) - epoch_us(a.ts) AS delta_us
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND (epoch_us(b.ts) > epoch_us(a.ts)
      OR (epoch_us(b.ts) = epoch_us(a.ts) AND b.event_id > a.event_id))
 AND epoch_us(b.ts) - epoch_us(a.ts) <= 600000000
""",
    tags=("rangejoin", "events"),
    extra=True,
)
def event_burst_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join, scale-safe: same-user event pairs within 10 minutes via
    time-bucketed equi-join (operators/rangejoin.py) — the oracle states
    the plain non-equi theta join; the engine computes it without a
    BroadcastNestedLoopJoin. Extra registry: locally oracle-verified."""
    from ssg_etl_spark.operators.rangejoin import same_key_burst_pairs

    return same_key_burst_pairs(
        load_table(spark, sf_dir, "events"), tolerance_s=600
    )
