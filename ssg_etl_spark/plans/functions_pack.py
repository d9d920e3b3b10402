"""Scalar-function parity pack (SURVEY §2.8 F1-F12): string, date, math,
conditional, null-handling functions exercised end-to-end with oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssg_etl_spark.plans.registry import register
from ssg_etl_spark.sources.tables import load_table


@register(
    "scalar_string_date_math",
    oracle="""
SELECT o_orderkey AS order_key,
  lower(o_orderpriority) AS priority_lower,
  upper(o_orderstatus) AS status_upper,
  substr(o_orderpriority, 1, 1) AS priority_code,
  concat_ws('|', o_orderstatus, o_orderpriority) AS status_tag,
  length(o_orderpriority) AS priority_len,
  year(o_orderdate) AS order_year,
  month(o_orderdate) AS order_month,
  day(o_orderdate) AS order_day,
  strftime(o_orderdate, '%Y-%m') AS order_month_str,
  CAST(o_orderdate AS DATE) + 30 AS due_date,
  CAST(o_orderdate AS DATE) - 1 AS prior_date,
  round(abs(o_totalprice - 100000.0), 2) AS abs_diff,
  CAST(floor(o_totalprice) AS BIGINT) AS price_int,
  coalesce(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_or_default
FROM orders
""",
    tags=("F2", "F3", "F4", "F5", "F6", "F7", "F8"),
    extra=True,
)
def scalar_string_date_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One projection exercising the reference's scalar-function surface:
    LEFT/substr (ssg_gl_etl.py:298), lower/concat (F3), casts (F4), date
    parts + strftime (F5), date arithmetic (F6: DATEADD/date_sub), abs/round
    (F7: ssg_erp_op.py:298), COALESCE/NULLIF (F8).

    All built-in Column functions — stays inside whole-stage codegen, no
    Python in the row path.
    """
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        F.col("o_orderkey").alias("order_key"),
        F.lower("o_orderpriority").alias("priority_lower"),
        F.upper("o_orderstatus").alias("status_upper"),
        F.substring("o_orderpriority", 1, 1).alias("priority_code"),
        F.concat_ws("|", "o_orderstatus", "o_orderpriority").alias("status_tag"),
        F.length("o_orderpriority").cast("long").alias("priority_len"),
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        F.date_format(d, "yyyy-MM").alias("order_month_str"),
        F.date_add(d, 30).alias("due_date"),
        F.date_sub(d, 1).alias("prior_date"),
        F.round(F.abs(F.col("o_totalprice") - F.lit(100000.0)), 2).alias("abs_diff"),
        # floor, not cast: double→int truncation direction differs across
        # engines (DuckDB rounds); floor is unambiguous.
        F.floor("o_totalprice").alias("price_int"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_or_default"
        ),
    )


@register(
    "conditional_recode_pack",
    oracle="""
SELECT l_orderkey AS order_key, l_linenumber AS line_number,
  CASE WHEN l_returnflag = 'R' THEN 'Returned'
       WHEN l_returnflag = 'A' THEN 'Accepted'
       ELSE 'None' END AS return_desc,
  CASE WHEN l_quantity >= 40 THEN 'bulk'
       WHEN l_quantity >= 10 THEN 'standard'
       ELSE 'small' END AS qty_band,
  CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END AS returned_qty,
  CASE WHEN l_returnflag <> 'R' THEN l_quantity ELSE 0 END AS kept_qty
FROM lineitem
""",
    tags=("F1", "P10"),
    extra=True,
)
def conditional_recode_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-chain recodes + conditional quantities — the hanger-lane
    Loading_Qty/UnLoading_Qty pattern (dags/hanger_lane.py:316-320) and the
    13-way account_type map (ssg_gl_etl.py:306-320).
    """
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_number"),
        F.when(F.col("l_returnflag") == "R", "Returned")
        .when(F.col("l_returnflag") == "A", "Accepted")
        .otherwise("None")
        .alias("return_desc"),
        F.when(F.col("l_quantity") >= 40, "bulk")
        .when(F.col("l_quantity") >= 10, "standard")
        .otherwise("small")
        .alias("qty_band"),
        F.when(F.col("l_returnflag") == "R", F.col("l_quantity"))
        .otherwise(F.lit(0.0))
        .alias("returned_qty"),
        F.when(F.col("l_returnflag") != "R", F.col("l_quantity"))
        .otherwise(F.lit(0.0))
        .alias("kept_qty"),
    )


@register(
    "defensive_coercion",
    oracle="""
SELECT c_custkey AS cust_key,
  COALESCE(c_name, 'NA') AS name_filled,
  COALESCE(c_acctbal, 0.0) AS acctbal_filled,
  CAST(floor(COALESCE(c_acctbal, 0.0)) AS BIGINT) AS acctbal_int,
  CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END AS acctbal_clamped,
  (c_acctbal IS NOT DISTINCT FROM 0.0) AS is_exactly_zero
FROM customer
""",
    tags=("F8", "F12"),
    extra=True,
)
def defensive_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Defensive per-field coercion, vectorized: the reference's 40+
    int()/float() guards (dags/hanger_lane.py:380-433) and fillna battery
    (automate_etl_with_airflow.py:81-93) become cast/coalesce/null-safe
    comparisons — no row-at-a-time Python.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("cust_key"),
        F.coalesce(F.col("c_name"), F.lit("NA")).alias("name_filled"),
        F.coalesce(F.col("c_acctbal"), F.lit(0.0)).alias("acctbal_filled"),
        F.floor(F.coalesce(F.col("c_acctbal"), F.lit(0.0))).alias("acctbal_int"),
        F.when(F.col("c_acctbal") < 0, F.lit(0.0))
        .otherwise(F.col("c_acctbal"))
        .alias("acctbal_clamped"),
        F.col("c_acctbal").eqNullSafe(F.lit(0.0)).alias("is_exactly_zero"),
    )
