"""Relational core: multi-way joins, semi/anti/set ops, distinct (SURVEY §2.2-2.3, §2.7).

Each query pairs a DataFrame builder with a DuckDB oracle. Testdata mapping
per FIXTURES.md: ``orders`` = GL fact, ``customer/nation/region`` = account
hierarchy, ``lineitem ⋈ dims`` = the hanger-lane 7-way telemetry join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ssg_etl_spark.functions.scalar import utc_ts_lit

from ssg_etl_spark.operators.gl import ENRICH_GL_ORACLE, enrich_gl
from ssg_etl_spark.plans.registry import register
from ssg_etl_spark.sources.tables import load_table, load_tables


@register("gl_enrichment", oracle=ENRICH_GL_ORACLE, tags=("J1", "F1", "F2", "P4"))
def gl_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: 5-way LEFT join + composite-key join + CASE recodes + net.

    Reference: dags/ssg_gl_etl.py:287-335 (GL extract enrichment).
    """
    orders, customer, nation, region, lineitem = load_tables(
        spark, sf_dir, "orders", "customer", "nation", "region", "lineitem"
    )
    return enrich_gl(orders, customer, nation, region, lineitem)


@register(
    "seven_way_join",
    oracle="""
SELECT
  l.l_orderkey        AS order_key,
  l.l_linenumber      AS line_number,
  CAST(o.o_orderdate AS DATE) AS order_date,
  c.c_name            AS customer_name,
  n.n_name            AS nation_name,
  r.r_name            AS region_name,
  p.p_name            AS part_name,
  s.s_name            AS supplier_name,
  l.l_quantity        AS quantity,
  l.l_extendedprice   AS extended_price
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
""",
    tags=("J2",),
    extra=True,
)
def seven_way_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-way INNER equi-join: fact through six dimensions.

    Reference: dags/hanger_lane.py:341-348 (ODP_Detail joined through
    Master/Employee/OperationCodes/Size/Colour/Style). All dims broadcast;
    the only shuffle is fact⋈orders, and AQE may convert even that.
    """
    l, o, c, n, r, p, s = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "region", "part", "supplier"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .select(
            l.l_orderkey.alias("order_key"),
            l.l_linenumber.alias("line_number"),
            o.o_orderdate.cast("date").alias("order_date"),
            c.c_name.alias("customer_name"),
            n.n_name.alias("nation_name"),
            r.r_name.alias("region_name"),
            p.p_name.alias("part_name"),
            s.s_name.alias("supplier_name"),
            l.l_quantity.alias("quantity"),
            l.l_extendedprice.alias("extended_price"),
        )
    )


@register(
    "semi_join_modified",
    oracle="""
SELECT o.o_orderkey AS order_key, o.o_custkey AS cust_key, o.o_totalprice AS total_price
FROM orders o
WHERE o.o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
""",
    tags=("J7",),
)
def semi_join_modified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — 'rows whose key exists in the change set'.

    Reference: ETL Incremental Load notebook, modified-rows split
    (changes[changes.CustomerKey.isin(target.CustomerKey)]).
    """
    orders = load_table(spark, sf_dir, "orders")
    neg = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
    return (
        orders.join(neg, orders.o_custkey == neg.c_custkey, "left_semi")
        .select(
            F.col("o_orderkey").alias("order_key"),
            F.col("o_custkey").alias("cust_key"),
            F.col("o_totalprice").alias("total_price"),
        )
    )


@register(
    "anti_join_new",
    oracle="""
SELECT c.c_custkey AS cust_key, c.c_name AS cust_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
""",
    tags=("J8",),
)
def anti_join_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join — 'rows with no match in the target' (new records).

    Reference: ETL Incremental Load notebook, new-records split
    (~changes.CustomerKey.isin(target.CustomerKey)).
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select(F.col("c_custkey").alias("cust_key"), F.col("c_name").alias("cust_name"))
    )


@register(
    "tuple_in_semi",
    oracle="""
SELECT l.l_orderkey AS order_key, l.l_linenumber AS line_number,
       l.l_partkey AS part_key, l.l_suppkey AS supp_key,
       l.l_quantity AS quantity
FROM lineitem l
WHERE EXISTS (
  SELECT 1 FROM lineitem r
  WHERE r.l_shipdate >= TIMESTAMP '2001-06-01'
    AND r.l_partkey = l.l_partkey AND r.l_suppkey = l.l_suppkey
)
""",
    tags=("P9",),
    extra=True,
)
def tuple_in_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tuple-IN subquery as a composite-key LEFT SEMI join.

    Reference: scripts/test/item_valuation_update.py:73 —
    ``(item_code, warehouse) IN (SELECT ... FROM stock_050124)``.
    """
    l = load_table(spark, sf_dir, "lineitem")
    recent_pairs = (
        l.filter(F.col("l_shipdate") >= utc_ts_lit("2001-06-01"))
        .select("l_partkey", "l_suppkey")
    )
    return (
        l.join(
            recent_pairs,
            ["l_partkey", "l_suppkey"],
            "left_semi",
        )
        .select(
            F.col("l_orderkey").alias("order_key"),
            F.col("l_linenumber").alias("line_number"),
            F.col("l_partkey").alias("part_key"),
            F.col("l_suppkey").alias("supp_key"),
            F.col("l_quantity").alias("quantity"),
        )
    )


@register(
    "distinct_rows",
    oracle="""
SELECT DISTINCT l_partkey AS part_key, l_returnflag AS return_flag, l_linestatus AS line_status
FROM lineitem
""",
    tags=("P11",),
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (dedup before association analysis).

    Reference: scripts/SQL/Product_Association.sql:4-12.
    """
    return (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("part_key"),
            F.col("l_returnflag").alias("return_flag"),
            F.col("l_linestatus").alias("line_status"),
        )
        .distinct()
    )


@register(
    "union_all_sources",
    oracle="""
SELECT c_name AS entity_name, c_acctbal AS acct_bal, 'customer' AS source_connection
FROM customer
UNION ALL
SELECT s_name AS entity_name, s_acctbal AS acct_bal, 'supplier' AS source_connection
FROM supplier
""",
    tags=("U1",),
    extra=True,
)
def union_all_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-all consolidation of per-source extracts with a lineage tag.

    Reference: dags/hanger_lanes_to_pg_etl.py:268-278 (per-lane record lists
    flattened into one load, tagged source_connection).
    """
    customer, supplier = load_tables(spark, sf_dir, "customer", "supplier")
    c = customer.select(
        F.col("c_name").alias("entity_name"),
        F.col("c_acctbal").alias("acct_bal"),
        F.lit("customer").alias("source_connection"),
    )
    s = supplier.select(
        F.col("s_name").alias("entity_name"),
        F.col("s_acctbal").alias("acct_bal"),
        F.lit("supplier").alias("source_connection"),
    )
    return c.unionByName(s)


@register(
    "except_diff",
    oracle="""
SELECT o_orderkey AS order_key, o_custkey AS cust_key, o_orderstatus AS status
FROM orders
EXCEPT ALL
SELECT o_orderkey AS order_key, o_custkey AS cust_key, o_orderstatus AS status
FROM orders WHERE o_totalprice > 100000
""",
    tags=("U2", "J9"),
)
def except_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-row anti-diff (EXCEPT ALL) — change detection between snapshots.

    Reference: ETL Incremental Load notebook 'detech changes' cell
    (source[~source.apply(tuple,1).isin(target.apply(tuple,1))]).
    """
    orders = load_table(spark, sf_dir, "orders")
    proj = orders.select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("cust_key"),
        F.col("o_orderstatus").alias("status"),
    )
    target = orders.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("cust_key"),
        F.col("o_orderstatus").alias("status"),
    )
    return proj.exceptAll(target)
