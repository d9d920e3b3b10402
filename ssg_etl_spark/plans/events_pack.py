"""Event-stream query pack: time windows, JSON extraction, watermark
incremental reads, interval lookbacks (SURVEY §2.8-2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssg_etl_spark.operators import incremental
from ssg_etl_spark.operators.rollups import DEC
from ssg_etl_spark.operators.sketches import logbucket_quantiles_oracle_sql
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
    extra=True,
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
    extra=True,
)
def interval_filter_last_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding lookback: last day relative to the data's max timestamp
    (P7: NOW() - INTERVAL '1 day', anchored to data for determinism).

    The collected max re-enters as an NTZ literal (``utc_ts_lit``) — a
    plain ``F.lit(datetime)`` builds a session-rendered TIMESTAMP whose
    comparison against the NTZ column shifts with the ambient zone (the
    round-8 tz sweep caught it here).
    """
    from ssg_etl_spark.functions.scalar import utc_ts_lit

    events = load_table(spark, sf_dir, "events")
    max_ts = events.agg(F.max("ts").alias("mx")).first()["mx"]
    return events.filter(
        F.col("ts") >= utc_ts_lit(max_ts) - F.expr("interval 1 day")
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
    extra=True,
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
    # Both sides are 1-row aggregates; broadcast-wrap per repo convention
    # (plan audit uniformity with the sibling scalar-join sites).
    return summary.crossJoin(F.broadcast(audit))


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
    delta == gap merges in both)."""
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
    BroadcastNestedLoopJoin."""
    from ssg_etl_spark.operators.rangejoin import same_key_burst_pairs

    return same_key_burst_pairs(
        load_table(spark, sf_dir, "events"), tolerance_s=600
    )


@register(
    "funnel_view_click_purchase",
    oracle="""
WITH s1 AS (
  SELECT user_id AS u, MIN(ts) AS step1_ts FROM events
  WHERE event_type = 'view' GROUP BY 1),
s2 AS (
  SELECT e.user_id AS u, MIN(e.ts) AS step2_ts
  FROM events e JOIN s1 ON e.user_id = s1.u
  WHERE e.event_type = 'click' AND e.ts > s1.step1_ts GROUP BY 1),
s3 AS (
  SELECT e.user_id AS u, MIN(e.ts) AS step3_ts
  FROM events e JOIN s2 ON e.user_id = s2.u
  WHERE e.event_type = 'purchase' AND e.ts > s2.step2_ts GROUP BY 1)
SELECT s1.u AS user_id, s1.step1_ts, s2.step2_ts, s3.step3_ts,
  CAST(1 + (CASE WHEN s2.u IS NULL THEN 0 ELSE 1 END)
         + (CASE WHEN s3.u IS NULL THEN 0 ELSE 1 END) AS BIGINT)
    AS steps_completed
FROM s1 LEFT JOIN s2 ON s1.u = s2.u LEFT JOIN s3 ON s1.u = s3.u
""",
    tags=("events", "funnel", "journey"),
    extra=True,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order conversion funnel view -> click -> purchase: earliest
    step-1 time per user, then each later step's earliest occurrence
    strictly after the previous step. Every stage is a user-keyed join or
    agg; the frontier shrinks per step (operators/funnel.py). Extra
    registry: locally oracle-verified."""
    from ssg_etl_spark.operators.funnel import funnel_steps

    return funnel_steps(
        load_table(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )


@register(
    "cohort_retention_daily",
    oracle="""
WITH m AS (
  SELECT user_id AS u,
    CAST(ts AS DATE) - DATE '1970-01-01' AS p FROM events),
fm AS (SELECT u, MIN(p) AS first_p FROM m GROUP BY 1),
act AS (SELECT DISTINCT m.u, fm.first_p, m.p FROM m JOIN fm ON m.u = fm.u),
cells AS (
  SELECT first_p AS cp, p - first_p AS periods_since, COUNT(*) AS n_users
  FROM act GROUP BY 1, 2),
base AS (SELECT cp, n_users AS cohort_size FROM cells WHERE periods_since = 0)
SELECT
  strftime(DATE '1970-01-01' + CAST(cells.cp AS INTEGER), '%Y-%m-%d')
    AS cohort_period,
  CAST(periods_since AS BIGINT) AS periods_since, n_users,
  round(CAST(n_users AS DOUBLE) / CAST(cohort_size AS DOUBLE) * 100.0, 4)
    AS retained_pct
FROM cells JOIN base ON cells.cp = base.cp
""",
    tags=("events", "cohort", "journey"),
    extra=True,
)
def cohort_retention_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort-retention matrix (cohort = date of first event; cells
    = distinct users active k days later, plus retained_pct — daily
    because the events fixture spans one month). Two user-keyed shuffles,
    both bounded by |users| (operators/funnel.py)."""
    from ssg_etl_spark.operators.funnel import cohort_retention

    return cohort_retention(load_table(spark, sf_dir, "events"), period="day")


def _hll_oracle() -> str:
    """SQL twin of operators/sketches.py — identical register index, rho
    string-inspection, exact-integer harmonic denominator, and the one
    shared double constant (inlined by repr so both engines fold the same
    literal)."""
    from ssg_etl_spark.operators.sketches import (
        ALPHA_M2_SCALED,
        HLL_M,
        HLL_RHO_HEX,
        HLL_RHO_MAX,
        LINEAR_COUNT_CUTOFF,
    )

    z = f"length(regexp_extract(substr(d, 3, {HLL_RHO_HEX}), '^(0*)', 1))"
    nib = (
        f"CASE substr(substr(d, 3, {HLL_RHO_HEX}) || 'f', {z} + 1, 1) "
        "WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2 "
        "WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1 "
        "ELSE 0 END"
    )
    alpha = repr(ALPHA_M2_SCALED)
    return f"""
WITH h AS (
  SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS d FROM events
  WHERE user_id IS NOT NULL),
rr AS (
  SELECT event_type,
    CAST(('0x' || substr(d, 1, 2)) AS INTEGER) AS reg,
    CASE WHEN {z} = {HLL_RHO_HEX} THEN {HLL_RHO_MAX}
         ELSE {z} * 4 + ({nib}) + 1 END AS rho
  FROM h),
regs AS (SELECT event_type, reg, MAX(rho) AS max_rho FROM rr GROUP BY 1, 2),
est AS (
  SELECT event_type,
    SUM(CAST(1 AS BIGINT) << ({HLL_RHO_MAX} - max_rho))
      + ({HLL_M} - COUNT(*)) * (CAST(1 AS BIGINT) << {HLL_RHO_MAX}) AS denom,
    CAST({HLL_M} - COUNT(*) AS DOUBLE) AS zeros
  FROM regs GROUP BY 1),
ap AS (
  SELECT event_type,
    round(CASE WHEN {alpha} / CAST(denom AS DOUBLE) <= {LINEAR_COUNT_CUTOFF!r}
                AND zeros > 0
          THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / zeros)
          ELSE {alpha} / CAST(denom AS DOUBLE) END, 4) AS approx_distinct
  FROM est),
ex AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY 1)
SELECT ap.event_type, ap.approx_distinct, ex.exact_distinct,
  round(abs(ap.approx_distinct - CAST(ex.exact_distinct AS DOUBLE))
        / CAST(ex.exact_distinct AS DOUBLE), 4) AS rel_err
FROM ap JOIN ex ON ap.event_type = ex.event_type
"""


@register(
    "hll_distinct_users",
    oracle=_hll_oracle(),
    tags=("events", "sketch", "approx"),
    extra=True,
)
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog distinct-user estimate per event type,
    compared against the exact count (rel_err column). The sketch is the
    scale path: 256 mergeable MAX registers per group instead of a
    distinct-pair shuffle — see operators/sketches.py. The exact count
    here is the demo yardstick, not part of the production plan."""
    from ssg_etl_spark.operators import sketches

    events = load_table(spark, sf_dir, "events")
    est = sketches.approx_distinct(events, ["event_type"], "user_id")
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "approx_distinct",
        "exact_distinct",
        F.round(
            F.abs(F.col("approx_distinct") - F.col("exact_distinct").cast("double"))
            / F.col("exact_distinct").cast("double"),
            4,
        ).alias("rel_err"),
    )


def _cms_oracle() -> str:
    """SQL twin of the count-min path: same row-seeded md5 cells, SUM
    counters, min-over-rows lookup — pure integer arithmetic, so the
    estimates replay exactly."""
    from ssg_etl_spark.operators.sketches import CMS_DEPTH, CMS_W_HEX

    return f"""
WITH cells AS (
  SELECT r.i AS row,
    CAST(('0x' || substr(
      md5(CAST(r.i AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)),
      1, {CMS_W_HEX})) AS INTEGER) AS reg,
    COUNT(*) AS cnt
  FROM events, range(0, {CMS_DEPTH}) r(i)
  WHERE user_id IS NOT NULL
  GROUP BY 1, 2),
keys AS (SELECT DISTINCT user_id FROM events),
probes AS (
  SELECT k.user_id, r.i AS row,
    CAST(('0x' || substr(
      md5(CAST(r.i AS VARCHAR) || ':' || CAST(k.user_id AS VARCHAR)),
      1, {CMS_W_HEX})) AS INTEGER) AS reg
  FROM keys k, range(0, {CMS_DEPTH}) r(i)),
est AS (
  SELECT p.user_id, MIN(COALESCE(c.cnt, 0)) AS est_count
  FROM probes p LEFT JOIN cells c ON p.row = c.row AND p.reg = c.reg
  GROUP BY 1),
ex AS (SELECT user_id, COUNT(*) AS exact_count FROM events GROUP BY 1)
SELECT est.user_id, est.est_count, ex.exact_count,
  CAST(est.est_count - ex.exact_count AS BIGINT) AS overcount
FROM est JOIN ex ON est.user_id = ex.user_id
"""


@register(
    "cms_user_frequencies",
    oracle=_cms_oracle(),
    tags=("events", "sketch", "approx"),
    extra=True,
)
def cms_user_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency estimate per user vs the exact count (the
    count-min guarantee surfaces as ``overcount >= 0``). The sketch is
    depth x width = 1024 SUM counters — mergeable bounded state instead
    of a per-key count at 100 TB; the lookup probes it broadcast. The
    exact count is the demo yardstick (operators/sketches.py)."""
    from ssg_etl_spark.operators import sketches

    events = load_table(spark, sf_dir, "events")
    sketch = sketches.cms_sketch(events, [], "user_id")
    keys = events.select("user_id").distinct()
    est = sketches.cms_lookup(sketch, keys, "user_id")
    exact = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    return est.join(exact, "user_id").select(
        "user_id",
        "est_count",
        "exact_count",
        (F.col("est_count") - F.col("exact_count"))
        .cast("bigint")
        .alias("overcount"),
    )


@register(
    "funnel_conversion_summary",
    oracle="""
WITH s1 AS (
  SELECT user_id AS u, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1),
s2 AS (
  SELECT e.user_id AS u, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.u
  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
s3 AS (
  SELECT e.user_id AS u, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.u
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1),
n AS (
  SELECT (SELECT COUNT(*) FROM s1) AS n1,
         (SELECT COUNT(*) FROM s2) AS n2,
         (SELECT COUNT(*) FROM s3) AS n3)
SELECT CAST(1 AS INT) AS step_no, 'view' AS step, n1 AS n_users,
  round(CAST(n1 AS DOUBLE) / CAST(n1 AS DOUBLE) * 100.0, 4) AS pct_of_prev,
  round(CAST(n1 AS DOUBLE) / CAST(n1 AS DOUBLE) * 100.0, 4) AS pct_of_first
FROM n
UNION ALL
SELECT CAST(2 AS INT), 'click', n2,
  round(CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE) * 100.0, 4),
  round(CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE) * 100.0, 4)
FROM n
UNION ALL
SELECT CAST(3 AS INT), 'purchase', n3,
  round(CAST(n3 AS DOUBLE) / CAST(n2 AS DOUBLE) * 100.0, 4),
  round(CAST(n3 AS DOUBLE) / CAST(n1 AS DOUBLE) * 100.0, 4)
FROM n
""",
    tags=("events", "funnel", "journey"),
    extra=True,
)
def funnel_conversion_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-step funnel conversion table (view -> click -> purchase):
    surviving users, conversion from the previous step, conversion from
    step 1 (operators/funnel.py:funnel_summary)."""
    from ssg_etl_spark.operators.funnel import funnel_summary

    return funnel_summary(
        load_table(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )


def _hll_rollup_oracle() -> str:
    from ssg_etl_spark.operators.sketches import (
        ALPHA_M2_SCALED,
        LINEAR_COUNT_CUTOFF,
    )

    return f"""
WITH h AS (
  SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS d FROM events
  WHERE user_id IS NOT NULL),
rr AS (
  SELECT event_type,
    CAST(('0x' || substr(d, 1, 2)) AS INTEGER) AS reg,
    CASE WHEN length(regexp_extract(substr(d, 3, 12), '^(0*)', 1)) = 12
         THEN 49
         ELSE length(regexp_extract(substr(d, 3, 12), '^(0*)', 1)) * 4 +
              (CASE substr(substr(d, 3, 12) || 'f',
                length(regexp_extract(substr(d, 3, 12), '^(0*)', 1)) + 1, 1)
                WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
                WHEN '7' THEN 1 ELSE 0 END) + 1 END AS rho
  FROM h),
regs AS (SELECT event_type, reg, MAX(rho) AS max_rho FROM rr GROUP BY 1, 2),
est AS (
  SELECT event_type,
    SUM(CAST(1 AS BIGINT) << (49 - max_rho))
      + (256 - COUNT(*)) * (CAST(1 AS BIGINT) << 49) AS denom,
    CAST(256 - COUNT(*) AS DOUBLE) AS zeros
  FROM regs GROUP BY 1)
SELECT event_type,
  round(CASE WHEN {ALPHA_M2_SCALED!r} / CAST(denom AS DOUBLE) <= {LINEAR_COUNT_CUTOFF!r}
              AND zeros > 0
        THEN 256.0 * ln(256.0 / zeros)
        ELSE {ALPHA_M2_SCALED!r} / CAST(denom AS DOUBLE) END, 4)
    AS approx_distinct
FROM est
"""


@register(
    "hll_daily_rollup",
    oracle=_hll_rollup_oracle(),
    tags=("events", "sketch", "rollup"),
    extra=True,
)
def hll_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-rollup algebra AS the correctness check: the query
    computes per-(event_type, DAY) register tables and MAX-merges them
    into overall estimates; the oracle computes the estimate DIRECTLY
    from the raw rows. They hash-match precisely because HLL registers
    form a semilattice under MAX — the property that lets a 100 TB
    warehouse keep tiny daily sketches and answer any date-range
    distinct count by folding them."""
    from ssg_etl_spark.operators import sketches

    events = load_table(spark, sf_dir, "events").withColumn(
        "_day", F.col("ts").cast("date")
    )
    daily = sketches.hll_registers(events, ["event_type", "_day"], "user_id")
    merged = daily.groupBy("event_type", "reg").agg(
        F.max("max_rho").alias("max_rho")
    )
    return sketches.hll_estimate(merged, ["event_type"])


@register(
    "retention_curve",
    oracle="""
WITH m AS (
  SELECT user_id AS u,
    CAST(ts AS DATE) - DATE '1970-01-01' AS p FROM events),
fm AS (SELECT u, MIN(p) AS first_p FROM m GROUP BY 1),
act AS (SELECT DISTINCT m.u, fm.first_p, m.p FROM m JOIN fm ON m.u = fm.u),
cells AS (
  SELECT first_p AS cp, p - first_p AS periods_since, COUNT(*) AS n_users
  FROM act GROUP BY 1, 2),
base AS (SELECT cp, n_users AS cohort_size FROM cells WHERE periods_since = 0)
SELECT CAST(periods_since AS BIGINT) AS periods_since,
  CAST(COUNT(*) AS BIGINT) AS n_cohorts,
  CAST(SUM(cells.n_users) AS BIGINT) AS n_users,
  round(CAST(SUM(cells.n_users) AS DOUBLE)
        / CAST(SUM(base.cohort_size) AS DOUBLE) * 100.0, 4)
    AS retained_pct
FROM cells JOIN base ON cells.cp = base.cp
GROUP BY 1
""",
    tags=("events", "cohort", "journey"),
    extra=True,
)
def retention_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retention CURVE: the cohort matrix collapsed over cohorts —
    pooled users retained at k periods over the pooled at-risk cohort
    sizes (cohort-size-weighted retention, the curve a dashboard plots).
    Integer sums only; one extra dimension-sized aggregation over the
    cohort cells."""
    from ssg_etl_spark.operators.funnel import cohort_retention

    cells = cohort_retention(
        load_table(spark, sf_dir, "events"), period="day", with_size=True
    )
    return cells.groupBy("periods_since").agg(
        F.count(F.lit(1)).alias("n_cohorts"),
        F.sum("n_users").alias("n_users"),
        F.round(
            F.sum("n_users").cast("double")
            / F.sum("cohort_size").cast("double")
            * 100.0,
            4,
        ).alias("retained_pct"),
    )


@register(
    "event_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS from_type,
    event_type AS to_type
  FROM events),
pairs AS (
  SELECT from_type, to_type, COUNT(*) AS n FROM seq
  WHERE from_type IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS rn FROM pairs GROUP BY 1)
SELECT p.from_type, p.to_type, p.n,
  round(CAST(p.n AS DOUBLE) / CAST(t.rn AS DOUBLE), 6) AS p
FROM pairs p JOIN tot t ON p.from_type = t.from_type
""",
    tags=("events", "journey", "markov"),
    extra=True,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix (counts + row-normalized
    probabilities) over per-user time-ordered sequences
    (operators/funnel.py:event_transitions)."""
    from ssg_etl_spark.operators.funnel import event_transitions

    return event_transitions(load_table(spark, sf_dir, "events"))


@register(
    "quality_gate_report",
    oracle="""
SELECT event_id,
  CASE WHEN fails = '' THEN 'pass' ELSE 'quarantine' END AS status,
  fails AS failed_rules
FROM (
  SELECT event_id,
    concat_ws(',',
      CASE WHEN NOT COALESCE(value > 0, FALSE) THEN 'value_positive' END,
      CASE WHEN NOT COALESCE(event_type IN ('click','view','purchase','signup'),
                             FALSE) THEN 'known_type' END
    ) AS fails
  FROM events) t
""",
    tags=("quality", "streaming", "gate"),
    extra=True,
)
def quality_gate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming dead-letter gate
    (streaming/pipeline.py:foreach_batch_quality_gate): the same
    row-rule semantics — NULL verdicts FAIL — as a per-row pass/
    quarantine report with the failing rule names, oracle-checked.
    The rule expressions are one projection; no shuffle at all."""
    events = load_table(spark, sf_dir, "events")
    rules = {
        "value_positive": F.col("value") > 0,
        "known_type": F.col("event_type").isin(
            "click", "view", "purchase", "signup"
        ),
    }
    flags = [
        F.when(~F.coalesce(rule, F.lit(False)), F.lit(name))
        for name, rule in rules.items()
    ]
    failed = F.array_compact(F.array(*flags))
    return events.select(
        "event_id",
        F.when(F.size(failed) == 0, F.lit("pass"))
        .otherwise(F.lit("quarantine"))
        .alias("status"),
        F.array_join(failed, ",").alias("failed_rules"),
    )


# Bloom twin of hll_daily_rollup: per-day filters OR-merge into the
# global filter. The oracle builds the global filter DIRECTLY from the
# distinct keys — matching the Spark side's per-day-then-merge result
# proves the OR-merge algebra (associativity over arbitrary day
# partitions) holds cross-engine, the property that lets a 100 TB
# deployment keep daily filters and fold them on demand.
_BLM_BITS, _BLM_K = 1024, 4


@register(
    "bloom_daily_rollup",
    oracle=f"""
WITH pos AS (
  SELECT DISTINCT
    CAST(('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' ||
          CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % {_BLM_BITS} AS p
  FROM events, range(0, {_BLM_K}) r(i)
  WHERE user_id IS NOT NULL)
SELECT CAST(p // 32 AS INT) AS word,
  bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER)) AS bits
FROM pos GROUP BY 1
""",
    tags=("sketch", "membership", "rollup"),
    extra=True,
)
def bloom_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-calendar-day Bloom filters over event users, OR-merged into
    the global membership filter (operators/bloom.py:bloom_merge). The
    oracle builds the global filter directly from the key set — equality
    proves the day-partitioned merge is exact, not approximate."""
    from ssg_etl_spark.operators.bloom import bloom_build, bloom_merge

    events = load_table(spark, sf_dir, "events")
    daily = bloom_build(
        events.withColumn("day", F.col("ts").cast("date")),
        "user_id",
        group_cols=["day"],
        n_bits=_BLM_BITS,
        k=_BLM_K,
    )
    return bloom_merge([daily.drop("day")], group_cols=[])


# --------------------------------------------------------- bottom-k / KMV

_KMV_K = 64
_KMV_D_CTE = (
    "d AS (SELECT DISTINCT user_id, md5(CAST(user_id AS VARCHAR)) AS h"
    " FROM events WHERE user_id IS NOT NULL)"
)


@register(
    "kmv_sample_users",
    oracle=f"""
WITH {_KMV_D_CTE},
r AS (SELECT h, user_id, ROW_NUMBER() OVER (ORDER BY h) AS rk FROM d)
SELECT h, user_id FROM r WHERE rk <= {_KMV_K}
""",
    tags=("events", "sketch", "sample", "mergeable"),
)
def kmv_sample_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k (KMV) sketch of distinct users: the k lowest-md5 distinct
    keys — a REPRODUCIBLE uniform sample of the distinct-key space that
    is stable across engines, partitionings, days and streams (growing
    the corpus only shrinks membership monotonically), mergeable by
    min-union, idempotent under refold. The global form never shuffles:
    candidates come from TakeOrderedAndProject with driver-side
    dedup-and-verify (exact-or-error) — operators/sketches.bottomk_sketch."""
    from ssg_etl_spark.operators import sketches

    events = load_table(spark, sf_dir, "events")
    return sketches.bottomk_sketch(events, "user_id", k=_KMV_K)


@register(
    "kmv_distinct_users",
    oracle=f"""
WITH {_KMV_D_CTE},
r AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rk,
             COUNT(*) OVER () AS nd FROM d)
SELECT CAST(LEAST(nd, {_KMV_K}) AS BIGINT) AS n_sample,
  CASE WHEN nd < {_KMV_K} THEN CAST(nd AS DOUBLE)
       ELSE ROUND(CAST({_KMV_K - 1} AS DOUBLE)
                  * CAST(281474976710656 AS DOUBLE)
                  / CAST(GREATEST(
                      CAST(('0x' || substr(h, 1, 12)) AS BIGINT),
                      1) AS DOUBLE), 4) END AS approx_distinct
FROM r WHERE rk = LEAST({_KMV_K}, nd)
""",
    tags=("events", "sketch", "approx", "mergeable"),
)
def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV cardinality estimate from the bottom-k sketch: (k-1)/U_(k)
    with U_(k) the k-th smallest 48-bit-normalized hash; EXACT when the
    sketch holds fewer than k keys. The second distinct-count estimator
    in the family — cross-checkable against hll_distinct_users from the
    same scan."""
    from ssg_etl_spark.operators import sketches

    events = load_table(spark, sf_dir, "events")
    sk = sketches.bottomk_sketch(events, "user_id", k=_KMV_K)
    return sketches.kmv_distinct_estimate(sk, k=_KMV_K)


@register(
    "kmv_user_overlap",
    oracle=f"""
WITH ea AS (SELECT DISTINCT user_id, md5(CAST(user_id AS VARCHAR)) AS h
            FROM events WHERE user_id IS NOT NULL AND event_id % 2 = 0),
eb AS (SELECT DISTINCT user_id, md5(CAST(user_id AS VARCHAR)) AS h
       FROM events WHERE user_id IS NOT NULL AND event_id % 2 = 1),
ra AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rk,
              COUNT(*) OVER () AS n FROM ea),
rb AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rk,
              COUNT(*) OVER () AS n FROM eb),
sa AS (SELECT h FROM ra WHERE rk <= {_KMV_K}),
sb AS (SELECT h FROM rb WHERE rk <= {_KMV_K}),
th AS (SELECT LEAST(
  (SELECT CASE WHEN MAX(n) >= {_KMV_K}
               THEN MAX(CASE WHEN rk = {_KMV_K} THEN h END)
               ELSE 'g' END FROM ra),
  (SELECT CASE WHEN MAX(n) >= {_KMV_K}
               THEN MAX(CASE WHEN rk = {_KMV_K} THEN h END)
               ELSE 'g' END FROM rb)) AS theta),
u AS (SELECT h FROM sa UNION SELECT h FROM sb),
w AS (SELECT u.h FROM u, th WHERE th.theta = 'g' OR u.h < th.theta),
bth AS (SELECT w.h FROM w
        WHERE w.h IN (SELECT h FROM sa) AND w.h IN (SELECT h FROM sb)),
aon AS (SELECT w.h FROM w
        WHERE w.h IN (SELECT h FROM sa) AND w.h NOT IN (SELECT h FROM sb)),
bon AS (SELECT w.h FROM w
        WHERE w.h IN (SELECT h FROM sb) AND w.h NOT IN (SELECT h FROM sa)),
m AS (SELECT (SELECT COUNT(*) FROM w) AS nw,
             (SELECT COUNT(*) FROM bth) AS nb,
             (SELECT COUNT(*) FROM aon) AS nao,
             (SELECT COUNT(*) FROM bon) AS nbo,
             (SELECT theta FROM th) AS theta)
SELECT CAST(nw AS BIGINT) AS n_window,
  CASE WHEN theta = 'g' THEN CAST(nw AS DOUBLE)
       ELSE ROUND(CAST(nw AS DOUBLE) * CAST(281474976710656 AS DOUBLE)
                  / CAST(GREATEST(
                      CAST(('0x' || substr(theta, 1, 12)) AS BIGINT),
                      1) AS DOUBLE), 4) END AS union_est,
  CASE WHEN theta = 'g' THEN CAST(nb AS DOUBLE)
       ELSE ROUND(CAST(nb AS DOUBLE) * CAST(281474976710656 AS DOUBLE)
                  / CAST(GREATEST(
                      CAST(('0x' || substr(theta, 1, 12)) AS BIGINT),
                      1) AS DOUBLE), 4) END AS intersection_est,
  CASE WHEN theta = 'g' THEN CAST(nao AS DOUBLE)
       ELSE ROUND(CAST(nao AS DOUBLE) * CAST(281474976710656 AS DOUBLE)
                  / CAST(GREATEST(
                      CAST(('0x' || substr(theta, 1, 12)) AS BIGINT),
                      1) AS DOUBLE), 4) END AS a_only_est,
  CASE WHEN theta = 'g' THEN CAST(nbo AS DOUBLE)
       ELSE ROUND(CAST(nbo AS DOUBLE) * CAST(281474976710656 AS DOUBLE)
                  / CAST(GREATEST(
                      CAST(('0x' || substr(theta, 1, 12)) AS BIGINT),
                      1) AS DOUBLE), 4) END AS b_only_est,
  CASE WHEN nw = 0 THEN 0.0
       ELSE ROUND(CAST(nb AS DOUBLE) / CAST(nw AS DOUBLE), 4)
       END AS jaccard_est,
  (SELECT COUNT(*) FROM
     (SELECT user_id FROM ea UNION SELECT user_id FROM eb)) AS exact_union,
  (SELECT COUNT(*) FROM
     (SELECT user_id FROM ea INTERSECT SELECT user_id FROM eb))
    AS exact_intersection
FROM m
""",
    tags=("events", "sketch", "approx", "setop", "mergeable"),
)
def kmv_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch-style audience overlap from two bottom-k sketches
    (operators/sketches.kmv_set_estimates): union / intersection /
    Jaccard of the even-event and odd-event user populations, estimated
    from SKETCHES ALONE — the shape that answers cross-source overlap
    questions from yesterday's per-source sketches without rescanning
    either corpus. Exact counts ride along as the demo yardstick."""
    from ssg_etl_spark.operators import sketches

    events = load_table(spark, sf_dir, "events")
    even = events.filter(F.col("event_id") % 2 == 0)
    odd = events.filter(F.col("event_id") % 2 == 1)
    est = sketches.kmv_set_estimates(
        sketches.bottomk_sketch(even, "user_id", k=_KMV_K),
        sketches.bottomk_sketch(odd, "user_id", k=_KMV_K),
        k=_KMV_K,
    )
    ua = even.filter(F.col("user_id").isNotNull()).select("user_id").distinct()
    ub = odd.filter(F.col("user_id").isNotNull()).select("user_id").distinct()
    ex_u = (
        ua.unionByName(ub)
        .distinct()
        .agg(F.count(F.lit(1)).alias("exact_union"))
    )
    ex_i = ua.join(ub, "user_id").agg(
        F.count(F.lit(1)).alias("exact_intersection")
    )
    return est.crossJoin(F.broadcast(ex_u)).crossJoin(F.broadcast(ex_i))


@register(
    "logbucket_daily_rollup",
    oracle=logbucket_quantiles_oracle_sql(
        "events", "value", (0.5, 0.9, 0.99), {"event_type": "event_type"}
    ),
    tags=("events", "sketch", "quantile", "rollup", "mergeable"),
)
def logbucket_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The log-bucket rollup algebra AS the correctness check (parity
    with hll_daily_rollup / bloom_daily_rollup): the query builds
    per-(event_type, DAY) bucket tables and SUM-merges them into
    per-type quantile estimates; the oracle computes the estimates
    DIRECTLY from raw rows. They hash-match precisely because bucket
    counts form a commutative monoid under addition with buckets aligned
    by construction — the property that lets a 100 TB warehouse keep
    tiny daily quantile sketches and answer any date-range percentile by
    folding them."""
    from ssg_etl_spark.operators import sketches

    events = load_table(spark, sf_dir, "events").withColumn(
        "_day", F.col("ts").cast("date")
    )
    daily = sketches.logbucket_sketch(events, "value", ["event_type", "_day"])
    merged = daily.groupBy("event_type", "blo", "bhi").agg(
        F.sum("cnt").alias("cnt")
    )
    return sketches.logbucket_quantiles(
        merged, (0.5, 0.9, 0.99), ["event_type"]
    )


@register(
    "kmv_sample_by_type",
    oracle="""
WITH d AS (SELECT DISTINCT event_type, user_id,
                  md5(CAST(user_id AS VARCHAR)) AS h
           FROM events WHERE user_id IS NOT NULL),
r AS (SELECT event_type, h, user_id,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk
      FROM d)
SELECT event_type, h, user_id FROM r WHERE rk <= 16
""",
    tags=("events", "sketch", "sample", "mergeable"),
)
def kmv_sample_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped bottom-k sketch: a stable 16-user distinct sample PER
    EVENT TYPE (operators/sketches.bottomk_sketch_grouped) — per-source
    reproducible samples, the per-group twin of kmv_sample_users. The
    build shuffles distinct (group, key) pairs once (map-side partial
    dedup; WindowGroupLimit caps each task at k rows per group before
    the final window); per-day grouped sketches fold via
    bottomk_merge_grouped without re-scanning."""
    from ssg_etl_spark.operators import sketches

    events = load_table(spark, sf_dir, "events")
    return sketches.bottomk_sketch_grouped(
        events, "user_id", ["event_type"], k=16
    )


_KMV_GK = 64  # grouped-overlap k: below the ~150 distinct users per
# (type, parity) at sf0.01, so the theta-estimator path actually runs


@register(
    "kmv_overlap_by_type",
    oracle=f"""
WITH ea AS (SELECT DISTINCT event_type, user_id,
                   md5(CAST(user_id AS VARCHAR)) AS h
            FROM events WHERE user_id IS NOT NULL AND event_id % 2 = 0),
eb AS (SELECT DISTINCT event_type, user_id,
              md5(CAST(user_id AS VARCHAR)) AS h
       FROM events WHERE user_id IS NOT NULL AND event_id % 2 = 1),
ra AS (SELECT event_type, h,
              ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk,
              COUNT(*) OVER (PARTITION BY event_type) AS n FROM ea),
rb AS (SELECT event_type, h,
              ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk,
              COUNT(*) OVER (PARTITION BY event_type) AS n FROM eb),
sa AS (SELECT event_type, h FROM ra WHERE rk <= {_KMV_GK}),
sb AS (SELECT event_type, h FROM rb WHERE rk <= {_KMV_GK}),
tha AS (SELECT event_type,
               CASE WHEN MAX(n) >= {_KMV_GK}
                    THEN MAX(CASE WHEN rk = {_KMV_GK} THEN h END)
                    ELSE 'g' END AS th
        FROM ra GROUP BY event_type),
thb AS (SELECT event_type,
               CASE WHEN MAX(n) >= {_KMV_GK}
                    THEN MAX(CASE WHEN rk = {_KMV_GK} THEN h END)
                    ELSE 'g' END AS th
        FROM rb GROUP BY event_type),
th AS (SELECT COALESCE(tha.event_type, thb.event_type) AS event_type,
              LEAST(COALESCE(tha.th, 'g'), COALESCE(thb.th, 'g')) AS theta
       FROM tha FULL OUTER JOIN thb ON tha.event_type = thb.event_type),
u AS (SELECT event_type, h, MAX(ina) AS ina, MAX(inb) AS inb FROM (
        SELECT event_type, h, 1 AS ina, 0 AS inb FROM sa
        UNION ALL SELECT event_type, h, 0 AS ina, 1 AS inb FROM sb)
      GROUP BY event_type, h),
w AS (SELECT u.*, th.theta FROM u JOIN th USING (event_type)
      WHERE th.theta = 'g' OR u.h < th.theta),
m AS (SELECT event_type, theta, COUNT(*) AS nw,
             CAST(SUM(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS nb,
             CAST(SUM(CASE WHEN ina = 1 AND inb = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS nao,
             CAST(SUM(CASE WHEN ina = 0 AND inb = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS nbo
      FROM w GROUP BY event_type, theta)
SELECT event_type, CAST(nw AS BIGINT) AS n_window,
  CASE WHEN theta = 'g' THEN CAST(nw AS DOUBLE)
       ELSE ROUND(CAST(nw AS DOUBLE) * CAST(281474976710656 AS DOUBLE)
                  / CAST(GREATEST(
                      CAST(('0x' || substr(theta, 1, 12)) AS BIGINT),
                      1) AS DOUBLE), 4) END AS union_est,
  CASE WHEN theta = 'g' THEN CAST(nb AS DOUBLE)
       ELSE ROUND(CAST(nb AS DOUBLE) * CAST(281474976710656 AS DOUBLE)
                  / CAST(GREATEST(
                      CAST(('0x' || substr(theta, 1, 12)) AS BIGINT),
                      1) AS DOUBLE), 4) END AS intersection_est,
  CASE WHEN theta = 'g' THEN CAST(nao AS DOUBLE)
       ELSE ROUND(CAST(nao AS DOUBLE) * CAST(281474976710656 AS DOUBLE)
                  / CAST(GREATEST(
                      CAST(('0x' || substr(theta, 1, 12)) AS BIGINT),
                      1) AS DOUBLE), 4) END AS a_only_est,
  CASE WHEN theta = 'g' THEN CAST(nbo AS DOUBLE)
       ELSE ROUND(CAST(nbo AS DOUBLE) * CAST(281474976710656 AS DOUBLE)
                  / CAST(GREATEST(
                      CAST(('0x' || substr(theta, 1, 12)) AS BIGINT),
                      1) AS DOUBLE), 4) END AS b_only_est,
  ROUND(CAST(nb AS DOUBLE) / CAST(nw AS DOUBLE), 4) AS jaccard_est
FROM m
""",
    tags=("events", "sketch", "approx", "setop", "grouped", "mergeable"),
)
def kmv_overlap_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP theta-sketch overlap as ONE plan-side query
    (operators/sketches.kmv_set_estimates_grouped — r10 verdict item:
    the binary form is driver-side, so an N-source overlap matrix cost
    N² round-trips): even-event vs odd-event audience union /
    intersection / Jaccard PER EVENT TYPE, estimated purely from two
    grouped bottom-k sketch tables — join on the group key, one window
    for the per-group θ, grouped aggregate over the θ-window; no
    corpus rescan, no driver math."""
    from ssg_etl_spark.operators import sketches

    events = load_table(spark, sf_dir, "events")
    even = events.filter(F.col("event_id") % 2 == 0)
    odd = events.filter(F.col("event_id") % 2 == 1)
    sk_a = sketches.bottomk_sketch_grouped(
        even, "user_id", ["event_type"], k=_KMV_GK
    )
    sk_b = sketches.bottomk_sketch_grouped(
        odd, "user_id", ["event_type"], k=_KMV_GK
    )
    return sketches.kmv_set_estimates_grouped(
        sk_a, sk_b, ["event_type"], k=_KMV_GK
    )


@register(
    "kmv_overlap_matrix_types",
    oracle=f"""
WITH d AS (SELECT DISTINCT event_type, user_id,
                  md5(CAST(user_id AS VARCHAR)) AS h
           FROM events WHERE user_id IS NOT NULL),
r AS (SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS n FROM d),
s AS (SELECT event_type, h FROM r WHERE rk <= {_KMV_GK}),
t AS (SELECT event_type,
             CASE WHEN MAX(n) >= {_KMV_GK}
                  THEN MAX(CASE WHEN rk = {_KMV_GK} THEN h END)
                  ELSE 'g' END AS th
      FROM r GROUP BY event_type),
p AS (SELECT ta.event_type AS src_a, tb.event_type AS src_b,
             LEAST(ta.th, tb.th) AS theta
      FROM t ta, t tb WHERE ta.event_type < tb.event_type),
u AS (SELECT p.src_a, p.src_b, s.h,
             MAX(CASE WHEN s.event_type = p.src_a THEN 1 ELSE 0 END) AS ina,
             MAX(CASE WHEN s.event_type = p.src_b THEN 1 ELSE 0 END) AS inb
      FROM p JOIN s ON s.event_type IN (p.src_a, p.src_b)
      GROUP BY p.src_a, p.src_b, s.h),
w AS (SELECT u.*, p.theta FROM u
      JOIN p ON u.src_a = p.src_a AND u.src_b = p.src_b
      WHERE p.theta = 'g' OR u.h < p.theta),
m AS (SELECT src_a, src_b, theta, COUNT(*) AS nw,
             CAST(SUM(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS nb,
             CAST(SUM(CASE WHEN ina = 1 AND inb = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS nao,
             CAST(SUM(CASE WHEN ina = 0 AND inb = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS nbo
      FROM w GROUP BY src_a, src_b, theta)
SELECT src_a, src_b, CAST(nw AS BIGINT) AS n_window,
  CASE WHEN theta = 'g' THEN CAST(nw AS DOUBLE)
       ELSE ROUND(CAST(nw AS DOUBLE) * CAST(281474976710656 AS DOUBLE)
                  / CAST(GREATEST(
                      CAST(('0x' || substr(theta, 1, 12)) AS BIGINT),
                      1) AS DOUBLE), 4) END AS union_est,
  CASE WHEN theta = 'g' THEN CAST(nb AS DOUBLE)
       ELSE ROUND(CAST(nb AS DOUBLE) * CAST(281474976710656 AS DOUBLE)
                  / CAST(GREATEST(
                      CAST(('0x' || substr(theta, 1, 12)) AS BIGINT),
                      1) AS DOUBLE), 4) END AS intersection_est,
  CASE WHEN theta = 'g' THEN CAST(nao AS DOUBLE)
       ELSE ROUND(CAST(nao AS DOUBLE) * CAST(281474976710656 AS DOUBLE)
                  / CAST(GREATEST(
                      CAST(('0x' || substr(theta, 1, 12)) AS BIGINT),
                      1) AS DOUBLE), 4) END AS a_only_est,
  CASE WHEN theta = 'g' THEN CAST(nbo AS DOUBLE)
       ELSE ROUND(CAST(nbo AS DOUBLE) * CAST(281474976710656 AS DOUBLE)
                  / CAST(GREATEST(
                      CAST(('0x' || substr(theta, 1, 12)) AS BIGINT),
                      1) AS DOUBLE), 4) END AS b_only_est,
  ROUND(CAST(nb AS DOUBLE) / CAST(nw AS DOUBLE), 4) AS jaccard_est
FROM m
""",
    tags=("events", "sketch", "approx", "setop", "matrix", "mergeable"),
    extra=True,
)
def kmv_overlap_matrix_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL overlap matrix in one plan
    (operators/sketches.kmv_overlap_matrix): every event-type PAIR's
    audience union / intersection / Jaccard estimated from ONE grouped
    bottom-k sketch table — the "overlap matrix across N sources" shape
    the r10 verdict motivated the grouped algebra with. 5 types → all
    10 pairs in one job; the driver-side binary form would cost 10
    collect round-trips, and at N sources N²/2. The sketch table folds
    from dailies (bottomk_merge_grouped), so yesterday's sketches
    answer today's matrix without rescanning."""
    from ssg_etl_spark.operators import sketches

    events = load_table(spark, sf_dir, "events")
    sk = sketches.bottomk_sketch_grouped(
        events, "user_id", ["event_type"], k=_KMV_GK
    )
    return sketches.kmv_overlap_matrix(sk, "event_type", k=_KMV_GK)


@register(
    "kmv_daily_rollup",
    oracle=f"""
WITH {_KMV_D_CTE},
r AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rk,
             COUNT(*) OVER () AS nd FROM d)
SELECT CAST(LEAST(nd, {_KMV_K}) AS BIGINT) AS n_sample,
  CASE WHEN nd < {_KMV_K} THEN CAST(nd AS DOUBLE)
       ELSE ROUND(CAST({_KMV_K - 1} AS DOUBLE)
                  * CAST(281474976710656 AS DOUBLE)
                  / CAST(GREATEST(
                      CAST(('0x' || substr(h, 1, 12)) AS BIGINT),
                      1) AS DOUBLE), 4) END AS approx_distinct
FROM r WHERE rk = LEAST({_KMV_K}, nd)
""",
    tags=("events", "sketch", "approx", "rollup", "mergeable"),
)
def kmv_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KMV rollup algebra AS the correctness check (completing the
    rollup-proof family: hll MAX, bloom OR, logbucket SUM, kmv
    MIN-UNION): per-DAY bottom-k sketches merge into the stream-lifetime
    estimate; the oracle computes the estimate DIRECTLY from raw rows.
    They hash-match because min-union over aligned hash order is exactly
    set union followed by bottom-k — and, unlike the SUM rollups, the
    fold is idempotent, so daily re-delivery cannot double-count."""
    from ssg_etl_spark.operators import sketches

    events = load_table(spark, sf_dir, "events").withColumn(
        "_day", F.col("ts").cast("date")
    )
    daily = sketches.bottomk_sketch_grouped(
        events, "user_id", ["_day"], k=_KMV_K
    )
    merged = sketches.bottomk_merge([daily.select("h", "user_id")], k=_KMV_K)
    return sketches.kmv_distinct_estimate(merged, k=_KMV_K)
