"""Merge/upsert/SCD2/change-detection query pack (SURVEY §2.9) plus the
stateful valuation recompute (§2.5 W6).

Source/target pairs are derived deterministically from the testdata so the
DuckDB oracle can reconstruct the exact same inputs:

* target  = customers with c_custkey <= 1000 (the "previously loaded" dim)
* source  = customers with c_custkey > 500, account balance bumped +10
            (overlap 501-1000 = updates; 1001+ = inserts)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssg_etl_spark.operators import merge as M
from ssg_etl_spark.operators.valuation import VALUATION_ORACLE, valuation_recompute
from ssg_etl_spark.plans.registry import register
from ssg_etl_spark.sources.tables import load_table

TARGET_SQL = "SELECT c_custkey AS cust_key, c_name AS cust_name, c_acctbal AS acct_bal FROM customer WHERE c_custkey <= 1000"
SOURCE_SQL = "SELECT c_custkey AS cust_key, c_name AS cust_name, c_acctbal + 10.0 AS acct_bal FROM customer WHERE c_custkey > 500"


def _target(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") <= 1000).select(
        F.col("c_custkey").alias("cust_key"),
        F.col("c_name").alias("cust_name"),
        F.col("c_acctbal").alias("acct_bal"),
    )


def _source(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") > 500).select(
        F.col("c_custkey").alias("cust_key"),
        F.col("c_name").alias("cust_name"),
        (F.col("c_acctbal") + F.lit(10.0)).alias("acct_bal"),
    )


@register(
    "merge_upsert",
    oracle=f"""
WITH target AS ({TARGET_SQL}), source AS ({SOURCE_SQL})
SELECT COALESCE(s.cust_key, t.cust_key) AS cust_key,
  CASE WHEN s.cust_key IS NOT NULL THEN s.cust_name ELSE t.cust_name END AS cust_name,
  CASE WHEN s.cust_key IS NOT NULL THEN s.acct_bal ELSE t.acct_bal END AS acct_bal
FROM target t FULL OUTER JOIN source s ON t.cust_key = s.cust_key
""",
    tags=("M5", "M6", "M10", "J10"),
    extra=True,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-rewrite merge: ON CONFLICT DO UPDATE semantics
    (dags/upsert_utils.py:27-99)."""
    return M.merge_upsert(
        _target(spark, sf_dir), _source(spark, sf_dir), keys=["cust_key"]
    )


@register(
    "change_detection",
    oracle=f"""
WITH target AS ({TARGET_SQL}), source AS ({SOURCE_SQL}),
changes AS (SELECT * FROM source EXCEPT ALL SELECT * FROM target),
tkeys AS (SELECT DISTINCT cust_key FROM target)
SELECT c.cust_key, c.cust_name, c.acct_bal,
  CASE WHEN k.cust_key IS NOT NULL THEN 'update' ELSE 'insert' END AS change_type
FROM changes c LEFT JOIN tkeys k ON c.cust_key = k.cust_key
""",
    tags=("M7", "J7", "J8", "J9", "U2"),
    extra=True,
)
def change_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Destination change comparison: EXCEPT ALL diff + semi/anti split
    (Incremental Load notebook)."""
    return M.detect_changes(
        _target(spark, sf_dir), _source(spark, sf_dir), keys=["cust_key"]
    )


@register(
    "source_change_detection",
    oracle="""
SELECT o_orderkey AS order_key,
  CAST(o_orderdate AS DATE) AS created_at,
  CAST(o_orderdate AS DATE) + CAST(o_orderkey % 30 AS INTEGER) AS modified_at,
  o_totalprice AS total_price
FROM orders
WHERE CAST(o_orderdate AS DATE) >= DATE '2001-06-01'
   OR CAST(o_orderdate AS DATE) + CAST(o_orderkey % 30 AS INTEGER) >= DATE '2001-06-01'
""",
    tags=("M8", "P5"),
    extra=True,
)
def source_change_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """created >= wm OR modified >= wm watermark scan
    (Source-Change-Detection notebook). Synthetic modified_at =
    created_at + (key mod 30) days."""
    o = load_table(spark, sf_dir, "orders")
    prepared = o.select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_orderdate").cast("date").alias("created_at"),
        F.date_add(
            F.col("o_orderdate").cast("date"), (F.col("o_orderkey") % 30).cast("int")
        ).alias("modified_at"),
        F.col("o_totalprice").alias("total_price"),
    )
    return M.source_changed_rows(prepared, "created_at", "modified_at", "2001-06-01")


SCD2_CURRENT_SQL = """
SELECT c_custkey AS cust_key, c_name AS cust_name, c_acctbal AS acct_bal,
  DATE '2020-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to, TRUE AS is_current
FROM customer
"""
SCD2_UPDATES_SQL = """
SELECT c_custkey AS cust_key, c_name AS cust_name,
  CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 50.0 ELSE c_acctbal END AS acct_bal
FROM customer WHERE c_custkey % 7 = 0 OR c_custkey % 5 = 0
"""


@register(
    "scd2_apply",
    oracle=f"""
WITH current_v AS ({SCD2_CURRENT_SQL}), updates AS ({SCD2_UPDATES_SQL}),
changed AS (
  SELECT u.cust_key, u.cust_name, u.acct_bal
  FROM updates u JOIN current_v c ON u.cust_key = c.cust_key AND c.is_current
  WHERE (u.acct_bal IS DISTINCT FROM c.acct_bal)
     OR (u.cust_name IS DISTINCT FROM c.cust_name))
SELECT c.cust_key, c.cust_name, c.acct_bal, c.valid_from,
  DATE '2024-01-01' AS valid_to, FALSE AS is_current
FROM current_v c WHERE c.is_current AND c.cust_key IN (SELECT cust_key FROM changed)
UNION ALL
SELECT c.cust_key, c.cust_name, c.acct_bal, c.valid_from, c.valid_to, c.is_current
FROM current_v c WHERE c.is_current AND c.cust_key NOT IN (SELECT cust_key FROM changed)
UNION ALL
SELECT cust_key, cust_name, acct_bal, DATE '2024-01-01', CAST(NULL AS DATE), TRUE
FROM changed
""",
    tags=("M11",),
    extra=True,
)
def scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 expire-and-insert (dltproject/sql_product_scd.py:11-33).

    Updates to keys divisible by 7 change the balance (→ new version +
    expired old version); keys divisible by 5 only are identical copies
    (→ no-op). The operator must distinguish the two.
    """
    c = load_table(spark, sf_dir, "customer")
    current = c.select(
        F.col("c_custkey").alias("cust_key"),
        F.col("c_name").alias("cust_name"),
        F.col("c_acctbal").alias("acct_bal"),
        F.lit("2020-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = (
        c.filter((F.col("c_custkey") % 7 == 0) | (F.col("c_custkey") % 5 == 0))
        .select(
            F.col("c_custkey").alias("cust_key"),
            F.col("c_name").alias("cust_name"),
            F.when(F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 50.0)
            .otherwise(F.col("c_acctbal"))
            .alias("acct_bal"),
        )
    )
    return M.scd2_apply(
        current,
        updates,
        keys=["cust_key"],
        attrs=["cust_name", "acct_bal"],
        effective_date="2024-01-01",
    )


@register(
    "full_refresh_replicate",
    oracle="""
SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str, user_id, event_type, value
FROM events
""",
    tags=("M14", "S14", "F5"),
    extra=True,
)
def full_refresh_replicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-store replication with datetime reformatting
    (scripts/test/replicate_table.py:49-74): full scan → reformat →
    overwrite. The overwrite sink is `mode("overwrite")`; here we return the
    reformatted projection."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        "user_id",
        "event_type",
        "value",
    )


# --- CDC envelope parse + batch apply (M12/M13), driver-verified ----------
#
# Deterministic change stream derived from the customer table so the oracle
# can replay it: keys 501-1500 each emit ONE envelope, op chosen by key % 3
# (0 → DELETE old image, 1 → UPDATE with acct_bal+25, 2 → INSERT new image),
# against the target snapshot of keys <= 1000. A decoy topic verifies the
# routing filter drops foreign messages.
_CDC_SRC_SQL = (
    "SELECT c_custkey AS cust_key, c_name AS cust_name, c_acctbal AS acct_bal "
    "FROM customer WHERE c_custkey BETWEEN 501 AND 1500"
)


@register(
    "cdc_batch_apply",
    oracle=f"""
WITH target AS ({TARGET_SQL}), src AS ({_CDC_SRC_SQL})
SELECT t.cust_key, t.cust_name, t.acct_bal
FROM target t WHERE t.cust_key NOT IN (SELECT cust_key FROM src)
UNION ALL
SELECT cust_key, cust_name, acct_bal + 25.0 AS acct_bal
FROM src WHERE cust_key % 3 = 1
UNION ALL
SELECT cust_key, cust_name, acct_bal FROM src WHERE cust_key % 3 = 2
""",
    tags=("M12", "M13", "S10"),
    extra=True,
)
def cdc_batch_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigger-CDC envelopes end-to-end: JSON old/new-image messages on a
    topic-per-table wire → topic routing filter → ``parse_change_envelopes``
    (M12) → ``apply_cdc_batch`` against the snapshot (M13).

    Reference: scripts/test/scripts.sql:25-49 (trigger envelope) and
    scripts/test/transform.py:46-83 (topic-routed consumer). The wire shape
    is exactly Kafka's (topic, value, offset); a decoy topic exercises the
    routing, and the per-key sequence is the offset.
    """
    from pyspark.sql import types as T

    from ssg_etl_spark.streaming import cdc

    c = load_table(spark, sf_dir, "customer")
    src = c.filter(F.col("c_custkey").between(501, 1500)).select(
        F.col("c_custkey").alias("cust_key"),
        F.col("c_name").alias("cust_name"),
        F.col("c_acctbal").alias("acct_bal"),
    )
    image = F.struct("cust_key", "cust_name", "acct_bal")
    new_image = F.struct(
        F.col("cust_key"),
        F.col("cust_name"),
        (F.col("acct_bal") + F.lit(25.0)).alias("acct_bal"),
    )
    op = (
        F.when(F.col("cust_key") % 3 == 0, F.lit("DELETE"))
        .when(F.col("cust_key") % 3 == 1, F.lit("UPDATE"))
        .otherwise(F.lit("INSERT"))
    )
    envelope = F.to_json(
        F.struct(
            op.alias("operation"),
            F.when(op != "INSERT", image).alias("old"),
            F.when(op == "UPDATE", new_image).when(op == "INSERT", image).alias("new"),
        )
    )
    messages = src.select(
        F.lit("cdc.customer").alias("topic"),
        envelope.alias("value"),
        F.col("cust_key").alias("offset"),
    ).unionByName(
        # Decoy topic the routing must drop (would corrupt keys if applied).
        src.limit(50).select(
            F.lit("cdc.orders").alias("topic"),
            envelope.alias("value"),
            (F.col("cust_key") + 1_000_000).alias("offset"),
        )
    )

    row_schema = T.StructType(
        [
            T.StructField("cust_key", T.LongType()),
            T.StructField("cust_name", T.StringType()),
            T.StructField("acct_bal", T.DoubleType()),
        ]
    )
    routed = messages.filter(F.col("topic") == "cdc.customer").select("value", "offset")
    changes = cdc.parse_change_envelopes(routed, row_schema)
    return cdc.apply_cdc_batch(
        _target(spark, sf_dir), changes, keys=["cust_key"], seq_col="offset"
    )


@register("valuation_recompute", oracle=VALUATION_ORACLE, tags=("W6",), extra=True)
def valuation_recompute_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful running weighted-average valuation via applyInPandas
    (item_valuation_update.py:160-243). Oracle: recursive CTE walking the
    same recurrence."""
    return valuation_recompute(load_table(spark, sf_dir, "lineitem"))
