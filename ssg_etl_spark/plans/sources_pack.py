"""Source/sink-surface queries (SURVEY §2.1): synthetic generator, REST
JSON flattening, catalog scan, row validation — each oracle-matched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ssg_etl_spark.operators.gl import ENRICH_GL_ORACLE, enrich_gl, validate_gl
from ssg_etl_spark.plans.registry import register
from ssg_etl_spark.sources import tables
from ssg_etl_spark.sources.files import flatten_json_records
from ssg_etl_spark.sources.generator import (
    synthetic_transactions,
    synthetic_transactions_oracle,
)
from ssg_etl_spark.sources.tables import load_table, load_tables


@register(
    "synthetic_transactions",
    oracle=synthetic_transactions_oracle(1000),
    tags=("sources", "S9", "F10"),
    extra=True,
)
def synthetic_transactions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9: deterministic faker-transaction generator (1000 rows)."""
    return synthetic_transactions(spark, 1000)


# The reference's REST payload shape (dags/get_data_api.py:17-40: id, name,
# nested address/company flattened with string concat).
_REST_PAYLOAD = (
    '[{"id": 1, "name": "Leanne", "address": {"city": "Gwenborough",'
    ' "street": "Kulas Light"}, "company": {"name": "Romaguera"}},'
    ' {"id": 2, "name": "Ervin", "address": {"city": "Wisokyburgh",'
    ' "street": "Victor Plains"}, "company": {"name": "Deckow"}},'
    ' {"id": 3, "name": "Clementine", "address": {"city": "McKenziehaven",'
    ' "street": "Douglas Extension"}, "company": {"name": "Keebler"}}]'
)

_REST_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField(
            "address",
            T.StructType(
                [
                    T.StructField("city", T.StringType()),
                    T.StructField("street", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "company",
            T.StructType([T.StructField("name", T.StringType())]),
        ),
    ]
)


@register(
    "rest_json_flatten",
    oracle="""
SELECT * FROM (VALUES
  (1, 'Leanne',     'Gwenborough',   'Kulas Light, Gwenborough',       'Romaguera'),
  (2, 'Ervin',      'Wisokyburgh',   'Victor Plains, Wisokyburgh',     'Deckow'),
  (3, 'Clementine', 'McKenziehaven', 'Douglas Extension, McKenziehaven', 'Keebler')
) t(id, name, city, full_address, company_name)
""",
    tags=("sources", "S8", "F9", "F3"),
    extra=True,
)
def rest_json_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: REST payload → from_json + explode → flat typed rows, with the
    reference's address concat (dags/get_data_api.py:31-32)."""
    recs = flatten_json_records(spark, _REST_PAYLOAD, _REST_SCHEMA)
    return recs.select(
        "id",
        "name",
        F.col("address.city").alias("city"),
        F.concat_ws(", ", F.col("address.street"), F.col("address.city")).alias(
            "full_address"
        ),
        F.col("company.name").alias("company_name"),
    )


@register(
    "catalog_tables",
    oracle="SELECT * FROM (VALUES "
    + ", ".join(f"('{n}')" for n in sorted(tables.TABLE_NAMES))
    + ") t(table_name)",
    tags=("sources", "S11"),
    extra=True,
)
def catalog_tables_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11: catalog scan of the registered engine tables."""
    return tables.catalog_tables(spark, sf_dir)


@register(
    "write_roundtrip",
    oracle="""
SELECT c_custkey AS cust_key, c_name AS cust_name, c_mktsegment AS segment,
  c_acctbal AS acct_bal, TIMESTAMP '2024-01-01 00:00:00' AS modified_at
FROM customer WHERE c_custkey <= 1000
""",
    tags=("sinks", "S2", "S4", "S6", "J11"),
    extra=True,
)
def write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/S4/S6/J11 driver-verified end-to-end: project a dim slice, stamp
    the write-path ModifiedDate (pinned batch_ts → deterministic), land it
    via the atomic partitioned writer, and read the files back.

    Reference write paths: sparkFiles/sparkProcess.py:333-341 (JDBC
    overwrite), dags/ssg_gl_etl.py:441-463 (batched inserts),
    build_etl_pipeline_python.py:42 (pandas to_sql). The parquet target is
    the sandbox stand-in; jdbc_write_options (sinks.py) is the JDBC form.
    """
    import hashlib
    import os
    import tempfile

    from ssg_etl_spark.sources import sinks

    slice_df = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 1000)
        .select(
            F.col("c_custkey").alias("cust_key"),
            F.col("c_name").alias("cust_name"),
            F.col("c_mktsegment").alias("segment"),
            F.col("c_acctbal").alias("acct_bal"),
        )
    )
    stamped = sinks.stamp_modified(slice_df, batch_ts="2024-01-01 00:00:00")
    # Stable scratch path per (user, sf_dir), overwritten each run — a fresh
    # mkdtemp per build would leak one parquet dataset per invocation.
    target = os.path.join(
        tempfile.gettempdir(),
        f"ssg_etl_write_roundtrip_{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}",
    )
    sinks.write_partitioned(
        stamped, target, partition_by=["segment"], max_files_per_partition=4
    )
    back = spark.read.parquet(target)
    # Partition-column values round-trip through directory names as strings;
    # reselect in declared order (partitionBy moves the column last).
    return back.select(
        "cust_key",
        "cust_name",
        F.col("segment").cast("string").alias("segment"),
        "acct_bal",
        "modified_at",
    )


@register(
    "gl_validated",
    oracle=f"""
SELECT * FROM ({ENRICH_GL_ORACLE}) e
WHERE e.order_key IS NOT NULL AND abs(e.net) < 1e12
""",
    tags=("functions", "F11"),
    extra=True,
)
def gl_validated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: flagship enrichment through the vectorized validation gate."""
    orders, customer, nation, region, lineitem = load_tables(
        spark, sf_dir, "orders", "customer", "nation", "region", "lineitem"
    )
    return validate_gl(enrich_gl(orders, customer, nation, region, lineitem))


@register(
    "xlsx_reference_roundtrip",
    oracle="""
SELECT CAST(n_nationkey AS BIGINT) AS nation_key,
  n_name AS nation_name,
  CAST(n_regionkey AS BIGINT) AS region_key,
  CAST(n_nationkey AS DOUBLE) + CAST(n_regionkey AS DOUBLE) / 10.0 AS ref_rate
FROM nation
""",
    tags=("sources", "S7"),
)
def xlsx_reference_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 end-to-end: Excel reference data through the real reader
    (etl_load_reference_data.py:22-34 reads *.xlsx reference workbooks).

    The corpus ships no xlsx (parquet testdata), so the query materializes
    one at query time from the nation dim — write a workbook with
    write_xlsx (strings through sharedStrings, numerics as raw cells),
    read it back typed through read_excel, and oracle the typed rows
    against the dim itself. Driver-side collect is 25 dimension rows
    (control-plane sized, same contract as the REST source). Extra
    registry: locally oracle-verified."""
    import hashlib
    import os
    import tempfile

    from ssg_etl_spark.sources.files import read_excel, write_xlsx

    dim = sorted(
        (int(r.n_nationkey), str(r.n_name), int(r.n_regionkey))
        for r in load_table(spark, sf_dir, "nation").collect()
    )
    data = [[k, n, g, k + g / 10.0] for k, n, g in dim]
    path = os.path.join(
        tempfile.gettempdir(),
        f"ssg_etl_refdata_{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}.xlsx",
    )
    write_xlsx(
        path, ["nation_key", "nation_name", "region_key", "ref_rate"], data
    )
    schema = T.StructType(
        [
            T.StructField("nation_key", T.LongType()),
            T.StructField("nation_name", T.StringType()),
            T.StructField("region_key", T.LongType()),
            T.StructField("ref_rate", T.DoubleType()),
        ]
    )
    return read_excel(spark, path, schema)


@register(
    "xlsx_folder_load",
    oracle="""
SELECT CAST(n_nationkey AS BIGINT) AS nation_key,
  n_name AS nation_name,
  CAST(n_regionkey AS BIGINT) AS region_key,
  'nations_' || CAST(n_nationkey % 3 AS VARCHAR) || '.xlsx' AS source_file
FROM nation
""",
    tags=("sources", "S7"),
    extra=True,
)
def xlsx_folder_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 folder iteration: the reference loops a DIRECTORY of reference
    workbooks into one table (etl_load_reference_data.py:22-34). The query
    materializes three workbooks (nation dim split by key mod 3) into a
    temp dir, reads the whole directory through one read_excel call with a
    lineage column, and oracles typed rows + originating basename against
    the dim."""
    import hashlib
    import os
    import tempfile

    from ssg_etl_spark.sources.files import read_excel, write_xlsx

    dim = sorted(
        (int(r.n_nationkey), str(r.n_name), int(r.n_regionkey))
        for r in load_table(spark, sf_dir, "nation").collect()
    )
    folder = os.path.join(
        tempfile.gettempdir(),
        f"ssg_etl_refdir_{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}",
    )
    os.makedirs(folder, exist_ok=True)
    for i in range(3):
        write_xlsx(
            os.path.join(folder, f"nations_{i}.xlsx"),
            ["nation_key", "nation_name", "region_key"],
            [[k, n, g] for k, n, g in dim if k % 3 == i],
        )
    schema = T.StructType(
        [
            T.StructField("nation_key", T.LongType()),
            T.StructField("nation_name", T.StringType()),
            T.StructField("region_key", T.LongType()),
        ]
    )
    return read_excel(spark, folder, schema, source_col="source_file")


@register(
    "dpp_partitioned_rollup",
    oracle="""
WITH dated AS (
  SELECT CAST(ts AS DATE) AS event_date, event_type, value FROM events),
dim AS (SELECT DISTINCT event_date FROM dated WHERE day(event_date) <= 7)
SELECT event_date, event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value
FROM dated JOIN dim USING (event_date)
GROUP BY 1, 2
""",
    tags=("storage", "dpp"),
)
def dpp_partitioned_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning end-to-end (SURVEY §4 date partitioning):
    land events as a date-partitioned parquet dataset (write_partitioned),
    then roll it up joined to a filtered date dim — the dim filter reaches
    the fact scan as a runtime PartitionFilter (dynamicpruningexpression),
    so only the dim's dates are read. tools/plan_audit.py reports the
    dpp_scans count and tests/test_plan_audit.py gates on it. At 100 TB
    this is THE mechanism that turns a 3-year event store + one-week dim
    filter into a one-week scan.
    """
    import hashlib
    import os
    import tempfile

    from ssg_etl_spark.sources import sinks

    events = load_table(spark, sf_dir, "events")
    dated = events.select(
        F.col("ts").cast("date").alias("event_date"), "event_type", "value"
    )
    # Stable scratch path per sf_dir, overwritten each run (same contract
    # as write_roundtrip).
    target = os.path.join(
        tempfile.gettempdir(),
        f"ssg_etl_dpp_{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}",
    )
    sinks.write_partitioned(
        dated, target, partition_by=["event_date"], max_files_per_partition=2
    )
    # Partition-type inference reads event_date back as DATE (ISO dir names).
    fact = spark.read.parquet(target)
    dim = (
        events.select(F.col("ts").cast("date").alias("event_date"))
        .distinct()
        .filter(F.dayofmonth("event_date") <= 7)
    )
    joined = fact.join(F.broadcast(dim), "event_date")
    return joined.groupBy("event_date", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias(
            "total_value"
        ),
    )


from ssg_etl_spark.operators.zorder import zorder_key, zorder_oracle_sql  # noqa: E402


@register(
    "zorder_orders",
    oracle=zorder_oracle_sql(
        "orders", "o_orderkey", ["o_totalprice", "o_custkey"], bits=8
    ),
    tags=("scale", "export"),
    extra=True,
)
def zorder_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering key over (o_totalprice, o_custkey) —
    the multi-dimensional data-skipping layout: range-sorting files by
    this key keeps per-file min-max stats tight on BOTH columns at once.
    One 1-row min/max aggregate broadcast back + pure bit-interleave
    column math; the oracle replays the identical IEEE quantization."""
    return zorder_key(
        load_table(spark, sf_dir, "orders"),
        ["o_totalprice", "o_custkey"],
        bits=8,
    ).select("o_orderkey", "zorder")


from ssg_etl_spark.sources import versioning  # noqa: E402


@register(
    "snapshot_time_travel",
    oracle="""
SELECT o_orderstatus,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS DOUBLE) AS total_price
FROM orders WHERE year(o_orderdate) < 1998
GROUP BY o_orderstatus
""",
    tags=("sources", "versioning"),
    extra=True,
)
def snapshot_time_travel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot versioning end-to-end: commit pre-1998 orders as v1,
    append the rest as v2, then time-travel-read v1 — the pinned version
    must replay the original filter exactly even though the table has
    since grown (manifest-listed files only; later commits never touch
    them)."""
    import atexit
    import shutil
    import tempfile

    orders = load_table(spark, sf_dir, "orders")
    snap_dir = tempfile.mkdtemp(prefix="snapshots_")
    atexit.register(shutil.rmtree, snap_dir, True)
    v1 = versioning.commit_snapshot(
        orders.filter(F.year(F.col("o_orderdate")) < 1998), snap_dir
    )
    versioning.commit_snapshot(
        orders.filter(F.year(F.col("o_orderdate")) >= 1998), snap_dir
    )
    return (
        versioning.read_snapshot(spark, snap_dir, version=v1)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(28,10)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@register(
    "snapshot_compaction",
    # total_price is rounded to cents in BOTH engines: the exact decimal
    # sums agree, but DuckDB's int128-decimal->double cast double-rounds
    # (int128->double, then /10^10) and can sit 1 ulp off Spark's
    # correctly-rounded BigDecimal conversion at year-group magnitudes.
    oracle="""
SELECT year(o_orderdate) AS order_year,
  COUNT(*) AS n_orders,
  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS DOUBLE), 2)
    AS total_price
FROM orders
GROUP BY 1
""",
    tags=("sources", "versioning", "compaction"),
)
def snapshot_compaction_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bin-packing OPTIMIZE end-to-end (r9): commit orders as SIX
    per-year appends (the minutes-cadence committer shape — one small
    file each), compact to target-size files as a new version, and
    aggregate the COMPACTED read — the oracle checks the rewrite changed
    zero rows. File-count reduction and history survival are asserted
    in-query (a no-op compaction fails the query, not just a pytest);
    crash-safety and vacuum reclaim are pinned in tests/
    test_versioning.py."""
    import atexit
    import shutil
    import tempfile

    orders = load_table(spark, sf_dir, "orders")
    snap_dir = tempfile.mkdtemp(prefix="compact_")
    atexit.register(shutil.rmtree, snap_dir, True)
    years = [
        r["y"]
        for r in orders.select(F.year("o_orderdate").alias("y")).distinct().collect()
    ]
    for y in sorted(years):
        versioning.commit_snapshot(
            orders.filter(F.year(F.col("o_orderdate")) == y).coalesce(1),
            snap_dir,
        )
    stats = versioning.compact_snapshots(
        spark, snap_dir, target_file_bytes=512 * 1024 * 1024
    )
    # Explicit raises, not assert: these invariants must hold under
    # ``python -O`` too (assert statements are stripped there).
    if not (stats["compacted"] and stats["files_after"] < stats["files_before"]):
        raise RuntimeError(f"compaction was a no-op: {stats}")
    # Every pre-compaction version must stay readable until vacuumed.
    if len(versioning.snapshot_versions(snap_dir)) != len(years) + 1:
        raise RuntimeError(
            f"pre-compaction history lost: {versioning.snapshot_versions(snap_dir)}"
        )
    return (
        versioning.read_snapshot(spark, snap_dir, version=stats["version"])
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(28,10)")).cast(
                    "double"
                ),
                2,
            ).alias("total_price"),
        )
    )
