"""Feature-engineering pack: per-entity sequence features, smoothed
target encoding, and robust (median/MAD) outlier flags — the
feature-store primitives of a training pipeline (BASELINE.json
north-star extensions; no reference counterpart).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssg_etl_spark.operators import features
from ssg_etl_spark.plans.registry import register
from ssg_etl_spark.sources.tables import load_table


@register(
    "order_sequence_features",
    oracle="""
WITH f AS (
  SELECT o_orderkey, o_custkey,
    row_number() OVER w AS event_seq,
    date_diff('day',
      lag(CAST(o_orderdate AS DATE)) OVER w,
      CAST(o_orderdate AS DATE)) AS days_since_prev,
    round(
      CAST(SUM(CAST(o_totalprice AS DECIMAL(28,12)))
             OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
      / CAST(COUNT(*)
             OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE),
      6) AS rolling_avg,
    round(
      CAST(SUM(CAST(o_totalprice AS DECIMAL(28,12)))
             OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS DOUBLE),
      6) AS cum_value
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
SELECT * FROM f
""",
    tags=("features", "window", "llm"),
    extra=True,
)
def order_sequence_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order-history features: sequence position, days since
    the previous order, trailing-3 rolling average spend, and cumulative
    spend — one partitioned window (one shuffle+sort on the customer
    key; no global window)."""
    return features.sequence_features(
        load_table(spark, sf_dir, "orders"),
        key_col="o_custkey",
        time_col="o_orderdate",
        id_col="o_orderkey",
        value_col="o_totalprice",
        rolling_n=3,
    )


@register(
    "segment_target_encoding",
    oracle="""
WITH facts AS (
  SELECT c.c_mktsegment, o.o_totalprice
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
per_cat AS (
  SELECT c_mktsegment, COUNT(*) AS n_rows,
    SUM(CAST(o_totalprice AS DECIMAL(28,12))) AS _sum
  FROM facts GROUP BY 1),
g AS (
  SELECT CAST(SUM(_sum) AS DOUBLE) / CAST(SUM(n_rows) AS DOUBLE) AS _gmean
  FROM per_cat)
SELECT c_mktsegment, n_rows,
  round((CAST(_sum AS DOUBLE) + 10.0 * _gmean)
        / (CAST(n_rows AS DOUBLE) + 10.0), 6) AS enc
FROM per_cat, g
""",
    tags=("features", "encoding", "llm"),
    extra=True,
)
def segment_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed mean target encoding of market segment against order
    totals (empirical-Bayes shrinkage toward the global mean, m=10
    pseudo-observations). One join + one category aggregation; the
    global mean reuses the per-category sums, so the fact table is
    scanned once."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    facts = orders.join(
        customer.select("c_custkey", "c_mktsegment"),
        orders.o_custkey == customer.c_custkey,
    )
    return features.target_encoding_table(
        facts, "c_mktsegment", "o_totalprice", smoothing=10.0
    )


@register(
    "robust_outlier_flags",
    oracle="""
WITH med AS (
  SELECT c_mktsegment,
    quantile_cont(CAST(c_acctbal AS DOUBLE), 0.5) AS _med
  FROM customer GROUP BY 1),
wm AS (
  SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal, m._med
  FROM customer c JOIN med m USING (c_mktsegment)),
mad AS (
  SELECT c_mktsegment,
    quantile_cont(abs(CAST(c_acctbal AS DOUBLE) - _med), 0.5) AS _mad
  FROM wm GROUP BY 1),
z AS (
  SELECT wm.c_custkey, wm.c_mktsegment, wm.c_acctbal,
    CASE WHEN _mad > 0 THEN
      round(0.6745 * (CAST(c_acctbal AS DOUBLE) - _med) / _mad, 6)
    END AS robust_z
  FROM wm JOIN mad USING (c_mktsegment))
SELECT c_custkey, c_mktsegment, c_acctbal, robust_z,
  COALESCE(abs(robust_z) > 3.5, FALSE) AS is_outlier
FROM z
""",
    tags=("features", "quality", "cleaning"),
    extra=True,
)
def robust_outlier_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD modified z-score outlier flags on account balances per
    market segment (Iglewicz-Hoaglin 0.6745 scaling, |z| > 3.5). Robust:
    one huge balance cannot mask itself by inflating a stddev. Two
    aggregation+broadcast rounds on the segment key; swap
    ``exact=False`` for t-digest percentiles at corpus scale. Extra
    registry: locally oracle-verified."""
    flags = features.robust_outliers(
        load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment", "c_acctbal"
        ),
        group_col="c_mktsegment",
        value_col="c_acctbal",
        z_threshold=3.5,
    )
    return flags.select(
        "c_custkey", "c_mktsegment", "c_acctbal", "robust_z", "is_outlier"
    )
