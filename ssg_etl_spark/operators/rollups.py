"""Aggregation rollups — the reference's one real Spark stage, generalized.

Re-expresses sparkFiles/sparkProcess.py:248-267: three groupBy-sum rollups
(date×operation, date×shift, date×employee) over the hanger-lane telemetry,
plus the CASE shift recode (dags/hanger_lane.py:291). Mapped onto the
``events`` table (FIXTURES.md §4): ts→created_at, user_id→employee,
value→quantity.

Scale notes: groupBy with map-side partial aggregation; the three rollups
share one scan. At 100 TB, partition the source by event date so the
groupBy keys align with partition pruning; AQE coalesces the post-shuffle
partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# Exact-decimal intermediate for order-independent double aggregation.
DEC = "decimal(28,6)"


def dec_sum(col: str | Column, alias: str) -> Column:
    """SUM through an exact decimal intermediate, surfaced as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def shift_recode(ts: Column) -> Column:
    """Day/Night shift from the event hour (reference: ODP_Shift=1→'Day').

    The hour is the UTC business hour (``ts`` is NTZ-UTC by the
    load_table contract), so the Day/Night split does not move with the
    ambient session timezone."""
    return F.when(F.hour(ts).between(6, 17), F.lit("Day")).otherwise(F.lit("Night"))


def rollup_by(events: DataFrame, *keys: Column | str) -> DataFrame:
    """Generic telemetry rollup: sum(value), count(*) by arbitrary keys."""
    return events.groupBy(*keys).agg(
        dec_sum("value", "total_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


def rollup_date_type(events: DataFrame) -> DataFrame:
    """A1: date × event-type rollup (sparkProcess.py:248-249)."""
    return rollup_by(
        events,
        F.col("ts").cast("date").alias("event_date"),
        F.col("event_type"),
    )


def rollup_date_shift(events: DataFrame) -> DataFrame:
    """A2: date × shift rollup with CASE recode (sparkProcess.py:257-258)."""
    return rollup_by(
        events,
        F.col("ts").cast("date").alias("event_date"),
        shift_recode(F.col("ts")).alias("shift"),
    )


def rollup_date_user(events: DataFrame) -> DataFrame:
    """A3: date × user × type rollup (sparkProcess.py:266-267, 6-key analog)."""
    return rollup_by(
        events,
        F.col("ts").cast("date").alias("event_date"),
        F.col("user_id"),
        F.col("event_type"),
    )


GROUPING_SETS_SQL = f"""
WITH e AS (
  SELECT CAST(ts AS DATE) AS event_date, event_type,
    CASE WHEN hour(ts) BETWEEN 6 AND 17 THEN 'Day' ELSE 'Night' END AS shift,
    user_id, value
  FROM {{table}})
SELECT event_date, event_type, shift, user_id,
  CAST(GROUPING(event_type)*4 + GROUPING(shift)*2 + GROUPING(user_id) AS INT) AS gid,
  CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS total_value,
  COUNT(*) AS n_events
FROM e
GROUP BY GROUPING SETS (
  (event_date, event_type),
  (event_date, shift),
  (event_date, user_id, event_type))
"""


def rollup_grouping_sets(events: DataFrame) -> DataFrame:
    """A1+A2+A3 in ONE pass via GROUPING SETS (the single-shuffle form
    SURVEY §2.4 flags as the moral equivalent of the reference's three
    separate groupBys over the same input, sparkProcess.py:248-267).

    Physically: one scan → Expand (3 replicas tagged by grouping id) → one
    hash aggregate/shuffle — at 100 TB this reads the fact once instead of
    three times. ``gid`` (bitmask of GROUPING() flags) tells the three
    rollups apart; identical semantics in DuckDB.
    """
    # Unique per-call view name: a shared fixed name would clobber a
    # caller's view and race under concurrent plan-building in one session.
    # spark.sql resolves the view during analysis, so dropping it right
    # after keeps the returned (lazy) DataFrame valid.
    import uuid

    view = f"events_gs_input_{uuid.uuid4().hex}"
    events.createOrReplaceTempView(view)
    try:
        return events.sparkSession.sql(GROUPING_SETS_SQL.format(table=view))
    finally:
        events.sparkSession.catalog.dropTempView(view)
