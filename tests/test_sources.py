"""File sources, synthetic generator, sinks, catalog scan (SURVEY §2.1)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ssg_etl_spark.sources.files import read_csv, read_excel, read_json_lines
from ssg_etl_spark.sources.generator import synthetic_transactions
from ssg_etl_spark.sources.sinks import replicate_table, stamp_modified, write_partitioned

SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("amt", T.DoubleType()),
    ]
)


def test_csv_roundtrip_explicit_schema(spark, tmp_path):
    p = str(tmp_path / "c.csv")
    with open(p, "w") as f:
        f.write("k,name,amt\n1,a,1.5\n2,b,2.5\n")
    out = read_csv(spark, p, SCHEMA).collect()
    assert sorted((r.k, r.name, r.amt) for r in out) == [(1, "a", 1.5), (2, "b", 2.5)]


def test_json_lines_roundtrip(spark, tmp_path):
    p = str(tmp_path / "j.jsonl")
    with open(p, "w") as f:
        f.write('{"k": 1, "name": "a", "amt": 1.5}\n{"k": 2, "name": "b", "amt": 2.5}\n')
    out = read_json_lines(spark, p, SCHEMA).collect()
    assert sorted((r.k, r.name, r.amt) for r in out) == [(1, "a", 1.5), (2, "b", 2.5)]


def test_excel_is_explicit_stub(spark):
    with pytest.raises(NotImplementedError):
        read_excel(spark, "/nope.xlsx", SCHEMA)


def test_generator_deterministic_across_partitionings(spark):
    a = synthetic_transactions(spark, 200, num_partitions=1).collect()
    b = synthetic_transactions(spark, 200, num_partitions=7).collect()
    key = lambda r: r.txn_seq  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)
    first = min(a, key=key)
    assert first.txn_id == "cfcd208495d565ef66e7dff9f98764da"  # md5("0")
    assert first.amount == 0.0 and first.currency == "USD"


def test_write_partitioned_prunes(spark, tmp_path):
    df = synthetic_transactions(spark, 100).withColumn(
        "day", F.to_date("created_at")
    )
    out = str(tmp_path / "t")
    write_partitioned(df, out, partition_by=["currency"], max_files_per_partition=2)
    # Hive-style layout exists → partition pruning can skip directories.
    assert os.path.isdir(os.path.join(out, "currency=USD"))
    back = spark.read.parquet(out)
    plan = back.filter(F.col("currency") == "USD")._jdf.queryExecution().executedPlan().toString()
    assert back.count() == 100
    assert "PartitionFilters: [isnotnull(currency" in plan


def test_stamp_modified_and_replicate(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = stamp_modified(synthetic_transactions(spark, 10))
    assert "modified_at" in df.columns
    df.write.parquet(src)
    replicate_table(spark, src, dst)
    assert spark.read.parquet(dst).count() == 10
