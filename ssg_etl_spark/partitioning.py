"""Scan-parallelism guard for CPU-heavy per-row expansion.

Parquet splits are bounded by row-group layout: a small single-file table
(the sf0.001-0.1 fixtures — one file, one row group) scans as ONE
partition, so any expensive narrow stage downstream (shingle explode,
chunk hashing, per-row × per-anchor dot products) runs on one core no
matter how many the session has. Measured at sf0.1: the 3-word shingle
explode over `documents` took 6.8 s single-partition vs 1.5 s after a
32-way repartition — that serialization, not hash math, dominated the
committed dedup_minhash_lsh bench line.

``fan_out`` repartitions ONLY when the source parallelism is below the
session default. At production scale inputs arrive in many splits, the
condition is false, and the operator plan is unchanged — crucially this
never adds a full-corpus shuffle of raw text/vector bytes to a 100 TB
plan. The bytes bound holds structurally: the file scan packs splits to
``spark.sql.files.maxPartitionBytes`` (default 128 MB), so "fewer
partitions than cores" implies the scan reads at most
cores × 128 MB — the triggered shuffle is executor-memory-sized by
construction (the one exception, a single unsplittable multi-GB row
group, is a broken writer's layout that needs rescuing anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's default parallelism when
    the plan's current partitioning is narrower — a no-op otherwise.

    Plans that already contain an Exchange are returned unchanged (r13):
    their output parallelism is governed by ``spark.sql.shuffle
    .partitions`` / AQE coalescing, not by input splits — and, more
    importantly, probing their partition count via ``df.rdd`` under AQE
    MATERIALIZES every query stage below the final segment (AQE must run
    the shuffles to fix the plan). That silently executed whole upstream
    pipelines once, uncached, before the real query ran them again —
    stage metrics showed hashed-TF feature builds and similar shuffled
    inputs duplicated wherever an operator wrapped them in fan_out. A
    bare scan/projection has no query stages, so the probe is free
    exactly where the rescue is needed.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if "Exchange" in df._jdf.queryExecution().executedPlan().toString():
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
