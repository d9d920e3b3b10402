"""Skew mitigation for hot keys (SURVEY §7.9 scale design; no reference
twin — the reference never shuffles, but at 100 TB skewed keys are the
dominant aggregation/join failure mode).

Two complementary tools:

* **AQE skew-join** is already on (session.py: adaptive.skewJoin.enabled)
  — it splits oversized *join* partitions at runtime. It does NOT help
  aggregation skew, and only triggers post-shuffle.
* **Salting** (here) spreads one logical hot key over ``n_salts`` physical
  reducers *before* the shuffle. Deterministic: the salt is a hash of a
  caller-named spread column (not RNG), so retries and oracles reproduce.

Algebra: two-stage aggregation is exact for decomposable aggregates
(sum/count/min/max — partial per (key, salt), then final per key). The
salted broadcast-replica join is exact for any join whose small side fits
replicated ``n_salts`` times.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(spread: Column | str, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts): hash of a high-cardinality
    spread column (e.g. the fact's line number / doc id)."""
    c = F.col(spread) if isinstance(spread, str) else spread
    return F.pmod(F.hash(c), F.lit(n_salts)).cast("int")


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    spread: str,
    n_salts: int = 16,
    dec: str = "decimal(28,6)",
) -> DataFrame:
    """Skew-safe ``groupBy(keys).agg(sum(value), count(*))``.

    Stage 1 aggregates per (keys, salt) — the hot key's rows split across
    ``n_salts`` reducers; stage 2 combines the ≤ n_salts partials per key.
    The second shuffle moves only ``|distinct keys| × n_salts`` rows.
    Decimal intermediates keep the sum order-independent (engine-portable).

    MEASURED HONESTY (r10 skew sweep, tools/skew_sweep_r10.json, 30%-hot
    -key fixture): for DECOMPOSABLE aggregates the naive single-shuffle
    plan is already skew-protected — Spark's map-side partial aggregation
    collapses the hot key to one partial row per task before the shuffle,
    and the sweep measures naive ≈ salted wall with balanced tasks for
    both. The salted form earns its keep where map-side combine is
    ineffective: pair/EXPAND shapes between the rows and the aggregate
    (``product_association_salted``, pinned by the megarow tests here) and
    huge per-task group cardinality. Join skew has no such structural
    absorption — see ``salted_join`` and the sweep's join_noaqe 10× task
    imbalance.
    """
    stage1 = (
        df.withColumn("_salt", salt_col(spread, n_salts))
        .groupBy(*keys, "_salt")
        .agg(
            F.sum(F.col(value_col).cast(dec)).alias("_psum"),
            F.count(F.lit(1)).alias("_pcnt"),
        )
    )
    return stage1.groupBy(*keys).agg(
        F.sum("_psum").cast("double").alias("total_value"),
        F.sum("_pcnt").alias("n_rows"),
    )


def salted_count(
    df: DataFrame,
    keys: list[str],
    spread: str,
    n_salts: int = 16,
    alias: str = "n_rows",
) -> DataFrame:
    """Skew-safe ``groupBy(keys).count()`` (two-stage; exact — counts are
    decomposable). Use when one key's row count dwarfs the rest and the
    map-side partial still leaves a hot reducer (many partitions all
    feeding the same final key)."""
    stage1 = (
        df.withColumn("_salt", salt_col(spread, n_salts))
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_pcnt"))
    )
    return stage1.groupBy(*keys).agg(F.sum("_pcnt").alias(alias))


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    spread: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the large side, replicate the small side
    ``n_salts``× (explode), join on (key, salt). Exact only for joins whose
    unmatched side is the large one — right/full would emit ``n_salts``
    null-padded rows per unmatched small-side key, so they are rejected."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salted_large = large.withColumn("_salt", salt_col(spread, n_salts))
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    return salted_large.join(replicated, [key, "_salt"], how).drop("_salt")
