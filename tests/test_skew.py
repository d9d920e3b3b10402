"""Salted aggregation/join equal their unsalted twins on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from ssg_etl_spark.operators import skew
from ssg_etl_spark.sources.tables import load_table


def _skewed(spark):
    # 90% of rows share one hot key.
    return spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, F.lit("HOT")).otherwise(F.lit("cold")).alias("k"),
        F.col("id").alias("line_id"),
        (F.col("id") % 97).cast("double").alias("v"),
    )


def test_salted_sum_count_exact(spark):
    df = _skewed(spark)
    got = {
        r.k: (r.total_value, r.n_rows)
        for r in skew.salted_sum_count(df, ["k"], "v", spread="line_id").collect()
    }
    want = {
        r.k: (float(r.s), r.c)
        for r in df.groupBy("k")
        .agg(F.sum(F.col("v").cast("decimal(28,6)")).alias("s"), F.count("*").alias("c"))
        .collect()
    }
    assert got == want


def test_salted_join_exact(spark):
    df = _skewed(spark)
    dim = spark.createDataFrame([("HOT", "hot-dim"), ("cold", "cold-dim")], ["k", "label"])
    got = skew.salted_join(df, dim, "k", spread="line_id").orderBy("line_id").collect()
    want = df.join(dim, "k").orderBy("line_id").collect()
    assert [(r.k, r.line_id, r.label) for r in got] == [
        (r.k, r.line_id, r.label) for r in want
    ]


def test_salt_deterministic(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").limit(100)
    a = ev.select(skew.salt_col("event_id", 8).alias("s")).collect()
    b = ev.select(skew.salt_col("event_id", 8).alias("s")).collect()
    assert [r.s for r in a] == [r.s for r in b]
    assert all(0 <= r.s < 8 for r in a)
