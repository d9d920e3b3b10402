"""Deterministic sampling/splitting for training-data pipelines
(BASELINE.json north-star extensions; no reference twin — the reference
never samples, but every corpus pipeline needs reproducible splits).

Spark's ``randomSplit``/``sample`` are seed-dependent AND partitioning-
dependent (a repartition changes the rows a seed selects), which makes
results unreproducible across cluster sizes and impossible to oracle.
Everything here derives from content hashes instead: the same row lands in
the same split on 1 executor or 1000, and DuckDB can replay the exact
assignment.

Scale: both operators are pure column expressions plus (for the stratified
form) one window over the stratum key — one shuffle, no RNG, no driver
state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 2^32 — the hash bucket space. First 8 md5 hex chars = uniform uint32.
_BUCKETS = 1 << 32


def hash_bucket(id_col: Column | str) -> Column:
    """Deterministic uniform bucket in [0, 2^32): first 8 hex chars of
    md5(id) — engine-portable (DuckDB: ``('0x' || substr(md5(x),1,8))::BIGINT``)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.conv(F.substring(F.md5(c.cast("string").cast("binary")), 1, 8), 16, 10).cast(
        "long"
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """Reproducible train/val/test assignment by id hash.

    A row's split is a pure function of its id — stable under repartition,
    re-run, cluster resize, and incremental appends (new rows don't move
    old rows between splits, unlike any fraction-of-count scheme).
    """
    if not (0 < train < 1 and 0 <= val < 1 and train + val <= 1):
        raise ValueError("need 0<train<1, 0<=val<1, train+val<=1")
    b = hash_bucket(id_col)
    split = (
        F.when(b < int(train * _BUCKETS), "train")
        .when(b < int((train + val) * _BUCKETS), "val")
        .otherwise("test")
    )
    return df.select(F.col(id_col), b.alias("bucket"), split.alias("split"))


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic k-per-stratum sample: rank rows within each stratum by
    id hash (ties broken by id) and keep the first k.

    Hash order is a reproducible shuffle — unbiased w.r.t. any natural
    ordering of the data, identical across engines and cluster layouts.
    The window shuffles once on the stratum key; rank-limit pushdown
    (WindowGroupLimit) keeps only k rows per stratum before the final
    exchange.
    """
    w = Window.partitionBy(*strata_cols).orderBy(
        F.md5(F.col(id_col).cast("string").cast("binary")), F.col(id_col)
    )
    return (
        df.select(*strata_cols, id_col)
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )
