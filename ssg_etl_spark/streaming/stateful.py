"""Custom stateful streaming operator: gap-based sessionization
(SURVEY §2.10/§2.11 — the reference has no stateful streaming op; this is
the ``applyInPandasWithState`` pattern a Spark-native engine provides for
arbitrary cross-row streaming state, the streaming sibling of the batch
valuation recompute in operators/valuation.py).

Two twins, identical semantics:

* :func:`sessionize_batch` — pure DataFrame form (lag → gap flag → cumsum
  session id → groupBy), SQL-expressible, DuckDB-oracled via the
  ``user_sessions`` registry query.
* :func:`sessionize_stream` — ``applyInPandasWithState`` per user_id with
  event-time timeout: state carries the open session; a session emits when
  a later event arrives past the gap, or when the watermark passes the
  session end + gap (timeout).

Scale: state per user is O(1) (4 scalars); the stream shuffles once on
user_id; watermark bounds state lifetime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SESSION_OUT = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)
# ts in micros; the value accumulator is stored as a long count of 1e-6
# units (the quantum the batch twin's decimal(28,6) uses), NOT a double —
# a float64 round-trip would silently drop sub-ULP increments once a
# session's running total passes ~2^53 micro-units and drift from the
# decimal-summed batch result. Longs hold ±9.2e12 whole units exactly.
_STATE = "start bigint, end bigint, n bigint, v_micros bigint"
_US = 1_000_000


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap sessionization, batch form: a new session starts where the gap
    from the previous event of the same user exceeds ``gap_minutes``."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Zone-free wall→micros: casting NTZ to TIMESTAMP would reinterpret
    # the wall fields through the ambient session zone, shifting gap
    # boundaries across a DST transition (tz-robustness contract).
    from ssg_etl_spark.functions.scalar import ntz_epoch_micros

    us = ntz_epoch_micros("ts")
    gap = us - F.lag(us).over(w)
    flagged = events.withColumn(
        "_new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * _US), 1).otherwise(0),
    )
    sessions = flagged.withColumn(
        "_session_no",
        F.sum("_new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    from ssg_etl_spark.operators.rollups import dec_sum

    return sessions.groupBy("user_id", "_session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        dec_sum("value", "total_value"),
    ).drop("_session_no")


def sessionize_native(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Third twin: Spark's built-in ``session_window`` aggregation.

    Catalyst-native gap sessionization — no window-function sort chain,
    just one aggregation whose grouping key merges overlapping
    [ts, ts+gap) intervals. Boundary semantics verified empirically:
    events exactly ``gap`` apart MERGE (delta ≤ gap ⇒ same session),
    identical to :func:`sessionize_batch`'s ``lag > gap`` rule, so all
    three forms (window-function batch, built-in batch, stateful stream)
    share one oracle. Prefer this form when the output needs no
    per-event session ids: the aggregation is map-side combinable, where
    the lag/cumsum form needs a full per-user sort first.
    """
    from ssg_etl_spark.operators.rollups import dec_sum

    return (
        events.groupBy(
            "user_id", F.session_window("ts", f"{gap_minutes} minutes")
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", "total_value"),
        )
        .drop("session_window")
    )


def sessionize_native_stream(
    stream: DataFrame, gap_minutes: int = 30, watermark: str = "30 minutes"
) -> DataFrame:
    """Fourth twin: ``session_window`` on a STREAM — the fully
    Catalyst-native stateful sessionization (no Python in the loop).

    Under append mode a session row emits once its window can no longer
    grow (watermark passed session_end + gap) — the same closure rule the
    ``applyInPandasWithState`` twin implements by event-time timeout, so
    the two streaming forms and the two batch forms all share one oracle.
    Prefer this form in production streams: state is managed by the
    streaming aggregation operator (RocksDB-spillable, merge-combinable),
    where the Python-state twin exists for session logic the built-in
    cannot express (e.g. value-dependent gaps, early partial emission).
    """
    from ssg_etl_spark.operators.rollups import dec_sum

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", f"{gap_minutes} minutes"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", "total_value"),
        )
        .drop("session_window")
    )


def sessionize_batch_oracle(gap_minutes: int = 30) -> str:
    """DuckDB twin of :func:`sessionize_batch` over the events table."""
    return f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap_minutes * 60 * _US}
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
numbered AS (
  SELECT user_id, ts, value,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM flagged)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
FROM numbered GROUP BY user_id, session_no
"""


def sessionize_stream(
    stream: DataFrame, gap_minutes: int = 30, watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming twin: per-user open-session state with event-time timeout.

    Emits exactly the closed sessions: closure happens either inline (a
    newer event of the same user beyond the gap) or by timeout (watermark
    moved past session_end + gap with no newer event).
    """
    import pandas as pd  # noqa: F401 — imported for the worker closure
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * _US

    def fn(key: tuple, pdfs, state: GroupState):
        from decimal import ROUND_HALF_UP, Decimal

        import pandas as pd

        (user_id,) = key
        q6 = Decimal("0.000001")

        def dec(v: float) -> Decimal:
            # Mirror the batch twin's cast(value as decimal(28,6)): quantize
            # each input once, then accumulate EXACTLY — float accumulation
            # would drift from the decimal-summed batch result on large or
            # cancelling magnitudes.
            return Decimal(repr(v)).quantize(q6, rounding=ROUND_HALF_UP)

        def emit(s):
            start, end, n, v = s
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(end, unit="us")],
                    "n_events": [n],
                    "total_value": [float(v)],
                }
            )

        def restore(s):
            # Lossless: v_micros long → exact 6-dp Decimal.
            return (s[0], s[1], s[2], Decimal(s[3]).scaleb(-6).quantize(q6))

        if state.hasTimedOut:
            cur = restore(state.get)
            state.remove()
            yield emit(cur)
            return

        ts_v: list[tuple[int, float]] = []
        for pdf in pdfs:
            ns = pdf["ts"].astype("int64")  # pandas datetime64[ns]
            ts_v.extend(zip((ns // 1000).tolist(), pdf["value"].astype(float).tolist()))
        ts_v.sort()

        cur = restore(state.get) if state.exists else None
        # Late-but-admitted events more than a gap BEFORE the open session
        # closed in event time already; they are sessionized among
        # THEMSELVES (two strays within one gap form ONE session, as the
        # batch twin would) and emitted closed. Sorted order makes the
        # strays a prefix, so one running chain suffices.
        stray = None
        for t, v in ts_v:
            if cur is None:
                cur = (t, t, 1, dec(v))
            elif t < cur[0] - gap_us:
                if stray is None:
                    stray = (t, t, 1, dec(v))
                elif t - stray[1] > gap_us:
                    yield emit(stray)
                    stray = (t, t, 1, dec(v))
                else:
                    stray = (stray[0], max(stray[1], t), stray[2] + 1, stray[3] + dec(v))
            elif t - cur[1] > gap_us:
                yield emit(cur)
                cur = (t, t, 1, dec(v))
            else:
                cur = (min(cur[0], t), max(cur[1], t), cur[2] + 1, cur[3] + dec(v))
        if stray is not None:
            yield emit(stray)
        if cur is not None:
            # cur[3] is quantized to 6 dp, so scaleb(6) is exactly integral.
            state.update((cur[0], cur[1], cur[2], int(cur[3].scaleb(6))))
            # Close via timeout once the watermark passes session_end + gap.
            state.setTimeoutTimestamp(cur[1] // 1000 + gap_minutes * 60 * 1000)

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, SESSION_OUT, _STATE, "append", GroupStateTimeout.EventTimeTimeout
        )
    )
