"""File-format and API-payload sources (SURVEY §2.1 S7, S8).

The reference reads Excel reference data (scripts/ETL Pipeline/
etl_load_reference_data.py:22-34, directory iteration over *.xlsx) and
REST-API JSON that it flattens into rows (dags/get_data_api.py:17-40,
dltproject/fxrate_pipeline.py:14-26). Spark-native form:

* CSV/JSON files: ``spark.read`` with an **explicit schema** (never
  inference — SURVEY §1.3 engine decision), so the scan is a single pass
  and malformed rows are isolated via PERMISSIVE + ``_corrupt_record``.
* Excel: not a Spark-core format and the xlsx libs are not in this
  container — ``read_excel`` documents the production path (convert to
  CSV/parquet at the edge, or a spark-excel datasource) and raises.
* REST payloads: fetched driver-side (they are tiny control-plane data),
  then ``from_json`` + ``explode`` turns the nested document into typed
  rows — the engine-side twin of pandas ``json_normalize``.

At 100 TB none of these are the bulk path (that is partitioned parquet,
sources/tables.py); files/APIs feed small dimension/reference tables that
downstream joins broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
    corrupt_col: str | None = "_corrupt_record",
) -> DataFrame:
    """S7: CSV scan with declared schema (no inference pass).

    Malformed rows land whole in ``corrupt_col`` (their typed columns NULL)
    so bad input is distinguishable from legitimate NULLs; pass
    ``corrupt_col=None`` to drop the capture column.
    """
    if corrupt_col is not None:
        schema = T.StructType(
            [*schema.fields, T.StructField(corrupt_col, T.StringType())]
        )
    reader = (
        spark.read.schema(schema)
        .option("header", header)
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
    )
    if corrupt_col is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.csv(path)


def read_json_lines(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S7: JSON-lines scan with declared schema."""
    return spark.read.schema(schema).json(path)


def read_excel(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S7: Excel reference-data scan (etl_load_reference_data.py:22-34).

    STUB — xlsx decode libraries are not available in this container.
    Production options: (a) land xlsx → CSV/parquet at the ingest edge and
    use read_csv, or (b) the spark-excel datasource
    (``format("com.crealytics.spark.excel")``) on a cluster that ships it.
    """
    raise NotImplementedError(
        "xlsx decode not available here; convert to CSV/parquet at the edge "
        "or add the spark-excel datasource on the cluster"
    )


def flatten_json_records(
    spark: SparkSession, payload: str, record_schema: T.StructType
) -> DataFrame:
    """S8: REST JSON payload → typed rows.

    ``payload`` is the body of one API response (a JSON array of records,
    fetched driver-side — dags/get_data_api.py:17-40). The nested document
    is parsed with an explicit schema and exploded to one row per record;
    callers then ``select(col("a.b"))`` nested fields flat (F9).
    """
    arr = T.ArrayType(record_schema)
    return (
        spark.createDataFrame([(payload,)], "payload string")
        .select(F.explode(F.from_json(F.col("payload"), arr)).alias("rec"))
        .select("rec.*")
    )
