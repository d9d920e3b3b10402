"""Parquet table sources for the driver testdata (S1/S5 equivalents).

The reference scans whole JDBC tables (sparkFiles/sparkProcess.py:181-188)
and pandas-reads SQL (build_etl_pipeline_python.py:29); here every scan is a
declarative ``spark.read.parquet`` so Catalyst gets predicate pushdown and
column pruning for free (SURVEY §4). At 100 TB the same call reads a
partitioned parquet/table layout; nothing in the operator code changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table. Plain parquet scan — no collect, no cache.

    ``events.parquet`` stores TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; we read it as int64 nanos (legacy conf) and truncate to
    microseconds with integer division — byte-identical to DuckDB's
    nanos→micros truncation, so oracles still hash-match.

    Side effect (deliberate): both confs below are session-level and stay
    set — they must hold at task-execution time, not just plan time, so a
    save/restore around the read would break deferred execution. UTC is the
    engine's contract; nanosAsLong only affects TIMESTAMP(NANOS) parquet,
    which vanilla Spark cannot read at all.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Defensive: timestamps in the testdata are naive and the oracles are
    # timezone-less — pin the session to UTC even under a caller-built
    # SparkSession (runtime-settable conf).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def jdbc_read_options(
    url: str,
    table: str | None = None,
    query: str | None = None,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
) -> dict[str, str]:
    """S1/S3: option map for a (possibly parallel) JDBC extract.

    Mirrors the reference's full-table JDBC scan
    (sparkFiles/sparkProcess.py:181-188) and its hand-rolled cursor batching
    (build_etl_pipeline_python.py:29): ``partition_column`` +
    bounds/num_partitions turns the single-cursor loop into N concurrent
    range-bounded cursors — Spark's native parallel extract. Exactly one of
    ``table``/``query`` must be given; ``fetchsize`` bounds driver-side row
    buffering per round trip.
    """
    if (table is None) == (query is None):
        raise ValueError("exactly one of table/query is required")
    opts: dict[str, str] = {"url": url, "fetchsize": str(fetch_size)}
    if table is not None:
        opts["dbtable"] = table
    if query is not None:
        opts["query"] = query
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if driver is not None:
        opts["driver"] = driver
    if partition_column is not None:
        if query is not None:
            raise ValueError("partitioned reads require table, not query")
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column needs lower_bound/upper_bound/num_partitions"
            )
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def jdbc_read(spark: SparkSession, **kwargs) -> DataFrame:
    """S1/S3: JDBC table/query scan (``kwargs`` as in ``jdbc_read_options``).

    The production twin of ``load_table`` — same downstream plan; Catalyst
    pushes filters into the generated WHERE clause. Untestable in this
    sandbox (no database/driver jar), so the option plumbing is unit-tested
    and this stays a thin ``.load()``.
    """
    return spark.read.format("jdbc").options(**jdbc_read_options(**kwargs)).load()


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    if not names:
        names = TABLE_NAMES
    return tuple(load_table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql queries."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def catalog_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11: catalog scan driving a per-table loop — the reference's
    ``select t.name from sys.tables where t.name in (…)``
    (dags/automate_etl_with_airflow.py:42-47). Spark-native:
    ``spark.catalog.listTables()`` filtered to the known set."""
    register_views(spark, sf_dir)
    known = set(TABLE_NAMES)
    names = sorted(t.name for t in spark.catalog.listTables() if t.name in known)
    return spark.createDataFrame([(n,) for n in names], "table_name string")
