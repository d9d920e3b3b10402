"""GL enrichment — the engine's flagship multi-way join + recode transform.

Re-expresses the reference's general-ledger extract query
(dags/ssg_gl_etl.py:287-335): a fact table LEFT-joined through a chain of
dimension tables (Coa3 → UL_COA aliases, including one composite-key join
``ULID1=ID1 AND ULID2=ID2``), CASE-based recodes (root_type on
``LEFT(id,2)``, 13-way account_type), a derived ``net = debit - credit``
column, ordered by the watermark column.

Testdata mapping (FIXTURES.md §3): ``orders`` is the GL fact;
``customer → nation → region`` stand in for the 3-level account hierarchy;
the composite-key join is ``lineitem ON (l_orderkey, l_linenumber=1)``.

Scale notes: the dimension chain is broadcast (region/nation/customer are
tiny next to a 100 TB fact); the composite join against lineitem is a
shuffle hash/SMJ on l_orderkey which AQE will size. No global sort — the
reference's ORDER BY exists only to stabilize batch progression, which
Spark does not need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ssg_etl_spark.functions.scalar import case_map

# Reference: dags/ssg_gl_etl.py:297-304 — root_type from LEFT(coa3.id, 2).
PRIORITY_CLASS = {
    "1": "Critical",
    "2": "High",
    "3": "Normal",
    "4": "Unspecified",
    "5": "Low",
}

# Reference: dags/ssg_gl_etl.py:306-320 — 13-way account_type CASE.
STATUS_DESC = {
    "O": "Open",
    "F": "Fulfilled",
    "P": "Pending",
}


def enrich_gl(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """Fact → dim-chain enrichment with CASE recodes and a net column.

    Pure function of its input DataFrames; Catalyst prunes the scans down to
    the referenced columns and broadcasts the dim chain.
    """
    first_line = lineitem.select("l_orderkey", "l_linenumber", "l_extendedprice")

    enriched = (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "left")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
        # Composite-key join (reference: ULID1=ID1 AND ULID2=ID2).
        .join(
            first_line,
            (orders.o_orderkey == first_line.l_orderkey)
            & (first_line.l_linenumber == F.lit(1)),
            "left",
        )
    )

    debit = F.when(orders.o_orderstatus == "F", orders.o_totalprice).otherwise(F.lit(0.0))
    credit = F.when(orders.o_orderstatus != "F", orders.o_totalprice).otherwise(F.lit(0.0))

    return enriched.select(
        orders.o_orderkey.alias("order_key"),
        orders.o_orderdate.cast("date").alias("order_date"),
        orders.o_orderstatus.alias("status_code"),
        case_map(orders.o_orderstatus, STATUS_DESC, "N/A").alias("status_desc"),
        # F2: LEFT(id, 2) → substring of the priority code.
        F.substring(orders.o_orderpriority, 1, 1).alias("priority_code"),
        case_map(F.substring(orders.o_orderpriority, 1, 1), PRIORITY_CLASS, "N/A").alias(
            "priority_class"
        ),
        customer.c_name.alias("account_title"),
        nation.n_name.alias("upper_level_1_title"),
        region.r_name.alias("upper_level_2_title"),
        debit.alias("debit"),
        credit.alias("credit"),
        (debit - credit).alias("net"),
        first_line.l_extendedprice.alias("first_line_price"),
    )


def validate_gl(enriched: DataFrame) -> DataFrame:
    """F11: vectorized twin of the reference's row-validation UDF
    (dags/ssg_gl_etl.py:228-257 — coerce debit/credit, derive net, drop
    rows whose key is missing or whose net is absurd, |net| ≥ 1e12).

    Row-at-a-time Python becomes three JVM-side expressions: ``coalesce``
    coercion, arithmetic, one ``filter`` — whole-stage-codegen'd, no UDF.
    """
    debit = F.coalesce(F.col("debit").cast("double"), F.lit(0.0))
    credit = F.coalesce(F.col("credit").cast("double"), F.lit(0.0))
    return (
        enriched.withColumn("debit", debit)
        .withColumn("credit", credit)
        .withColumn("net", debit - credit)
        .filter(F.col("order_key").isNotNull() & (F.abs(F.col("net")) < F.lit(1e12)))
    )


ENRICH_GL_ORACLE = """
SELECT
  o.o_orderkey                      AS order_key,
  CAST(o.o_orderdate AS DATE)       AS order_date,
  o.o_orderstatus                   AS status_code,
  CASE o.o_orderstatus
    WHEN 'O' THEN 'Open' WHEN 'F' THEN 'Fulfilled' WHEN 'P' THEN 'Pending'
    ELSE 'N/A' END                  AS status_desc,
  substr(o.o_orderpriority, 1, 1)   AS priority_code,
  CASE substr(o.o_orderpriority, 1, 1)
    WHEN '1' THEN 'Critical' WHEN '2' THEN 'High' WHEN '3' THEN 'Normal'
    WHEN '4' THEN 'Unspecified' WHEN '5' THEN 'Low'
    ELSE 'N/A' END                  AS priority_class,
  c.c_name                          AS account_title,
  n.n_name                          AS upper_level_1_title,
  r.r_name                          AS upper_level_2_title,
  CASE WHEN o.o_orderstatus = 'F' THEN o.o_totalprice ELSE 0.0 END AS debit,
  CASE WHEN o.o_orderstatus <> 'F' THEN o.o_totalprice ELSE 0.0 END AS credit,
  CASE WHEN o.o_orderstatus = 'F' THEN o.o_totalprice ELSE 0.0 END
    - CASE WHEN o.o_orderstatus <> 'F' THEN o.o_totalprice ELSE 0.0 END AS net,
  l.l_extendedprice                 AS first_line_price
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN nation n   ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r   ON n.n_regionkey = r.r_regionkey
LEFT JOIN (SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem) l
  ON o.o_orderkey = l.l_orderkey AND l.l_linenumber = 1
"""
